"""Pytree registration helper: NamedTuples with static (non-traced) fields.

jax treats every NamedTuple field as a child leaf, which turns static shape
metadata (triangle counts, image sizes) into tracers under jit/shard_map.
`register_static` re-registers a NamedTuple class so the named fields ride in
aux_data (hashable, static) instead.
"""

from __future__ import annotations

import jax


def register_static(cls, static_fields: tuple[str, ...]):
    fields = cls._fields
    dyn_idx = [i for i, f in enumerate(fields) if f not in static_fields]
    sta_idx = [i for i, f in enumerate(fields) if f in static_fields]

    def flatten(x):
        children = tuple(x[i] for i in dyn_idx)
        aux = tuple(x[i] for i in sta_idx)
        return children, aux

    def unflatten(aux, children):
        vals = [None] * len(fields)
        for i, v in zip(dyn_idx, children):
            vals[i] = v
        for i, v in zip(sta_idx, aux):
            vals[i] = v
        return cls(*vals)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls
