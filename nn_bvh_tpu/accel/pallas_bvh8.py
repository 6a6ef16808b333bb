"""Pallas TPU packet traversal over BVH8 wide nodes.

One while-loop iteration pops ONE wide node and slab-tests its 8 children
against the whole (8,128)-ray tile, then pushes hit children in true
packet front-to-back order (children sorted by packet-min entry t — finer
than the binary kernel's majority-sign heuristic). For incoherent packets,
whose visit set saturates toward the whole tree, iteration count drops by
the interior-node collapse factor (~7x fewer nodes than the binary tree;
see bvh8.collapse_bvh8). Triangles reuse pallas_traverse's lane-major
(9,128) blocks and Moller-Trumbore tile test. This is the TPU counterpart
of the reference's HW/wide GPU traversal (gpu/aggregate.cpp OptiX BVH) vs
its binary CPU walk (cpu/aggregates.cpp:529).

Stack entries use the bvh8 child-meta encoding:
  >= 0 -> wide-node index;  < 0 -> leaf -(1 + offset*8 + (count-1)).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bvh8
from .traverse import Hit
from .pallas_traverse import (
    TILE_ROWS, LANES, pack_tris, _tri_isect_tile, _BIG,
)

Array = jax.Array

WIDTH = bvh8.WIDTH
NODES_PER_TILE = bvh8.NODES_PER_TILE
STACK_DEPTH = 192  # bvh8 pushes up to 7 siblings per level
VMEM_BUDGET = 10 * 1024 * 1024

# debug knob, read once at import: compile-time only (baked into jit cache)
import os as _os

_NOSORT = bool(_os.environ.get("BVH8_NOSORT"))


class PackedSceneW:
    """Host-packed BVH8 tables, uploaded once."""

    def __init__(self, dbvh, tri_p):
        wl, wh, wm = bvh8.collapse_bvh8(
            np.asarray(dbvh.node_lo)[:dbvh.n_nodes],
            np.asarray(dbvh.node_hi)[:dbvh.n_nodes],
            np.asarray(dbvh.node_meta)[:dbvh.n_nodes])
        bt, mt = bvh8.pack_wide(wl, wh, wm)
        self.bounds_tab = jnp.asarray(bt)
        self.meta_tab = jnp.asarray(mt)
        self.tri_tab = jnp.asarray(pack_tris(tri_p))
        self.n_wide = len(wl)
        self.vmem_bytes = (bt.size + mt.size + self.tri_tab.size) * 4

    def usable(self) -> bool:
        return self.vmem_bytes < VMEM_BUDGET


def _make_kernel(any_hit: bool):
    def kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               bounds_ref, meta_ref, tri_ref,
               t_ref, prim_ref, b1_ref, b2_ref,
               stack_ref):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        t0 = tmax_ref[...]

        tiny = 1e-20
        safe = lambda c: jnp.where(jnp.abs(c) < tiny,
                                   jnp.where(c < 0, -tiny, tiny), c)
        inv_dx = 1.0 / safe(dx)
        inv_dy = 1.0 / safe(dy)
        inv_dz = 1.0 / safe(dz)

        t_ref[...] = t0
        if any_hit:
            prim_ref[...] = jnp.where(t0 < 0.0, 0, -1).astype(jnp.int32)
        else:
            prim_ref[...] = jnp.full_like(t0, -1.0).astype(jnp.int32)
        b1_ref[...] = jnp.zeros_like(t0)
        b2_ref[...] = jnp.zeros_like(t0)

        lane8 = jax.lax.broadcasted_iota(jnp.int32, (WIDTH, LANES), 1)
        lane9 = jax.lax.broadcasted_iota(jnp.int32, (9, LANES), 1)
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (WIDTH, 1), 0)

        stack_ref[0] = 0  # root wide node
        live = jnp.any(t0 >= 0.0) if any_hit else jnp.any(t0 > 0.0)

        def cond(carry):
            sp, done = carry
            return (sp >= 0) & jnp.logical_not(done)

        def body(carry):
            sp, done = carry
            code = stack_ref[sp]
            sp = sp - 1
            is_leaf = code < 0

            # ---- leaf: Moller-Trumbore over its triangles ----------------
            @pl.when(is_leaf)
            def _():
                lc = -code - 1
                offset = lc // 8
                count = jax.lax.rem(lc, 8) + 1

                def tri_body(j, _):
                    @pl.when(j < count)
                    def _():
                        tj = offset + j
                        tri_tile = tri_ref[pl.ds((tj // LANES) * 9, 9), :]
                        v = jnp.max(jnp.where(lane9 == tj % LANES,
                                              tri_tile, -_BIG), axis=1)
                        tb = t_ref[...]
                        h, t, b1, b2 = _tri_isect_tile(
                            ox, oy, oz, dx, dy, dz, tb, v)
                        t_ref[...] = jnp.where(h, t, tb)
                        prim_ref[...] = jnp.where(h, tj, prim_ref[...])
                        b1_ref[...] = jnp.where(h, b1, b1_ref[...])
                        b2_ref[...] = jnp.where(h, b2, b2_ref[...])
                    return 0

                jax.lax.fori_loop(0, 8, tri_body, 0)

            # ---- wide node: 8-child slab test + ordered push --------------
            # computed unconditionally (clamped loads when is_leaf) because
            # the data-dependent stack-pointer advance must reach the outer
            # while carry; pushes are masked off for leaf pops.
            node = jnp.maximum(code, 0)
            btile = bounds_ref[pl.ds((node // NODES_PER_TILE) * WIDTH,
                                     WIDTH), :]            # (8, 128) f32
            mtile = meta_ref[pl.ds((node // NODES_PER_TILE) * WIDTH,
                                   WIDTH), :]              # (8, 128) i32
            base = (node % NODES_PER_TILE) * 8
            fv = [jnp.max(jnp.where(lane8 == base + f, btile, -_BIG),
                          axis=1, keepdims=True) for f in range(6)]
            cmeta = jnp.max(
                jnp.where(lane8 == (node % NODES_PER_TILE), mtile,
                          jnp.int32(-2147483647)),
                axis=1, keepdims=True)                      # (8,1) i32

            t_best = t_ref[...]
            keys, vals = [], []
            for c in range(WIDTH):
                sel = sub8 == c
                lox = jnp.max(jnp.where(sel, fv[0], -_BIG))
                loy = jnp.max(jnp.where(sel, fv[1], -_BIG))
                loz = jnp.max(jnp.where(sel, fv[2], -_BIG))
                hix = jnp.max(jnp.where(sel, fv[3], -_BIG))
                hiy = jnp.max(jnp.where(sel, fv[4], -_BIG))
                hiz = jnp.max(jnp.where(sel, fv[5], -_BIG))
                t0x = (lox - ox) * inv_dx
                t1x = (hix - ox) * inv_dx
                t0y = (loy - oy) * inv_dy
                t1y = (hiy - oy) * inv_dy
                t0z = (loz - oz) * inv_dz
                t1z = (hiz - oz) * inv_dz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z))
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z)) * 1.0000004
                h = (tn <= tf) & (tf > 0.0) & (tn < t_best)
                keys.append(jnp.where(jnp.any(h),
                                      jnp.min(jnp.where(h, tn, _BIG)), _BIG))
                vals.append(jnp.max(jnp.where(sel, cmeta,
                                              jnp.int32(-2147483647))))

            # ascending sort by packet-min tn (batcher network for 8).
            # _NOSORT is read ONCE at import (module top): these knobs are
            # compile-time only — they are baked into the jit cache, so
            # changing the env var mid-process has no effect by design.
            pairs = [] if _NOSORT else [
                     (0, 1), (2, 3), (4, 5), (6, 7),
                     (0, 2), (1, 3), (4, 6), (5, 7),
                     (1, 2), (5, 6),
                     (0, 4), (1, 5), (2, 6), (3, 7),
                     (2, 4), (3, 5),
                     (1, 2), (3, 4), (5, 6)]
            for i, j in pairs:
                swap = keys[j] < keys[i]
                ki, kj = keys[i], keys[j]
                keys[i] = jnp.where(swap, kj, ki)
                keys[j] = jnp.where(swap, ki, kj)
                vi, vj = vals[i], vals[j]
                vals[i] = jnp.where(swap, vj, vi)
                vals[j] = jnp.where(swap, vi, vj)

            # push far-to-near (keys[0] nearest -> pushed last, popped first)
            push_ok = jnp.logical_not(is_leaf)
            sp_new = sp
            for c in range(WIDTH - 1, -1, -1):
                do = push_ok & (keys[c] < _BIG)
                # masked push: inactive writes land in the trash slot
                stack_ref[jnp.where(do, sp_new + 1,
                                    STACK_DEPTH - 1)] = jnp.where(
                    do, vals[c], stack_ref[STACK_DEPTH - 1])
                sp_new = jnp.where(do, sp_new + 1, sp_new)

            if any_hit:
                done = jnp.all(prim_ref[...] >= 0)
            return (sp_new, done)

        jax.lax.while_loop(cond, body,
                           (jnp.where(live, 0, -1), jnp.asarray(False)))

    return kernel


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _traverse_bvh8(bounds_tab, meta_tab, tri_tab, o, d, t_max,
                   any_hit: bool = False, interpret: bool = False):
    R = o.shape[0]
    pad = (-R) % (TILE_ROWS * LANES)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    Rp = R + pad
    rows = Rp // LANES

    comp = lambda x: x.reshape(rows, LANES)
    args = (
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
        comp(t_max),
    )

    grid = (rows // TILE_ROWS,)
    ray_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)

    kernel = _make_kernel(any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    t, prim, b1, b2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 7 + [full(bounds_tab), full(meta_tab),
                                   full(tri_tab)],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(*args, bounds_tab, meta_tab, tri_tab)

    t = t.reshape(-1)[:R]
    prim = prim.reshape(-1)[:R]
    b1 = b1.reshape(-1)[:R]
    b2 = b2.reshape(-1)[:R]
    miss = prim < 0
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim, b1=b1, b2=b2)
