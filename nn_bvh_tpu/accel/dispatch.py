"""Traversal-backend dispatch: one place that picks how rays meet the BVH.

The reference selects its aggregate once at startup (`cpu/render.cpp:47`
CreateAggregate; `wavefront/integrator.cpp:162` OptiX vs CPUAggregate). This
module is the TPU analog: given a compiled scene + flat BVH it returns an
`Intersectors` bundle backed by

- the VMEM-resident Pallas packet kernel (fastest; scenes ~<=100k tris),
- the HBM-resident Pallas kernel with a VMEM block cache (any scene size,
  ~3% slower on cache-friendly scenes), or
- the XLA while-loop walk (CPU/test anchor — unusable on TPU, ~0.001 Mray/s).

On TPU both Pallas paths are wrapped in the (dead-ray, octant, Morton)
coherence re-sort, since packets share one traversal stack.

JIT-boundary rule (learned the hard way): the packed tables can be hundreds
of MB at crown scale. A jitted function that CLOSES OVER them embeds them as
jaxpr constants, which the (remote) compiler then has to swallow — compile
time explodes. So `Intersectors` exposes the device tables as a `.tables`
pytree to be threaded through jit as an ARGUMENT, and `.bind(tables)`
rebuilds the (closest, any_hit) callables from the traced values inside the
jit. Calling `.closest/.any_hit` directly (eager, or on CPU tests) also
works — it binds the concrete tables.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from . import traverse, pallas_traverse, hbm_traverse, pallas_bvh8, pallas_bvh4


class BoundIntersectors(NamedTuple):
    closest: Callable   # (o, d, t_max) -> Hit
    any_hit: Callable   # (o, d, t_max) -> bool mask
    backend: str


class Intersectors:
    """Backend choice + device tables. See module docstring for .bind().

    Analytic quadrics (geometry/quadrics.py) ride as a third table group:
    they are intersected brute-force as an (R, Q) broadcast AFTER the
    triangle traversal and merged by min-t — the analog of the reference
    GPU backend's separate quadric BVH (gpu/aggregate.h:107). Quadric prim
    ids = quad_base + q (above the padded triangle range)."""

    def __init__(self, backend: str, tables, bounds, sort: bool,
                 quad_base: int = 0):
        self.backend = backend
        self.tables = tables      # pytree of device arrays (jit-arg friendly)
        self.bounds = bounds
        self.sort = sort
        self.quad_base = quad_base
        # object motion blur: shutter-end variants of the POSITION-bearing
        # tables (None entries = static/shared). The BVH node table is built
        # over keyframe-union bounds and shared; only triangle data lerps.
        self.tables_end = None

    @staticmethod
    def lerp_tables(tables, tables_end, t):
        """Per-wave shutter-time interpolation of the traversal tables
        (inside jit). a + t*(b-a) is exact when b == a, so static entries
        pass through bit-identically."""
        if tables_end is None:
            return tables
        core, quads = tables
        core_e, _ = tables_end
        new_core = tuple(
            a if b is None else a + t * (b - a)
            for a, b in zip(core, core_e))
        return (new_core, quads)

    def bind(self, tables=None) -> BoundIntersectors:
        # tables is ALWAYS the 2-tuple (core_backend_tables, quad_tables)
        # with quad_tables = (quad_type, quad_params) or None
        t, quads = self.tables if tables is None else tables
        if self.backend == "xla":
            dbvh, tri_p = t
            _closest = lambda *a: traverse.intersect_closest(dbvh, tri_p, *a)
            _any = lambda *a: traverse.intersect_any(dbvh, tri_p, *a)
        elif self.backend == "pallas_bvh8":
            bounds_tab, meta_tab, tri_tab = t
            _closest = lambda *a: pallas_bvh8._traverse_bvh8(
                bounds_tab, meta_tab, tri_tab, *a, any_hit=False)
            _any = lambda *a: pallas_bvh8._traverse_bvh8(
                bounds_tab, meta_tab, tri_tab, *a, any_hit=True).prim >= 0
        elif self.backend in ("bvh4", "bvh4_hbm"):
            node_tab, tri_tab = t
            res = self.backend == "bvh4"
            _closest = lambda *a: pallas_bvh4._traverse_bvh4(
                node_tab, tri_tab, *a, any_hit=False, tri_resident=res)
            _any = lambda *a: pallas_bvh4._traverse_bvh4(
                node_tab, tri_tab, *a, any_hit=True, tri_resident=res).prim >= 0
        elif self.backend == "pallas_vmem":
            node_tab, tri_tab = t
            _closest = lambda *a: pallas_traverse._traverse_packed(
                node_tab, tri_tab, *a, any_hit=False)
            _any = lambda *a: pallas_traverse._traverse_packed(
                node_tab, tri_tab, *a, any_hit=True).prim >= 0
        else:  # pallas_hbm
            node_tab, tri_tab = t
            _closest = lambda *a: hbm_traverse._traverse_hbm(
                node_tab, tri_tab, *a, any_hit=False)
            _any = lambda *a: hbm_traverse._traverse_hbm(
                node_tab, tri_tab, *a, any_hit=True).prim >= 0
        if self.sort and self.backend != "xla":
            _closest = pallas_traverse.make_sorted_isect(_closest, self.bounds)
            if self.sort != "closest_only":
                _any = pallas_traverse.make_sorted_isect(_any, self.bounds)
        if quads is not None:
            from ..geometry import quadrics as quadrics_mod

            qtype, qparams = quads
            base = self.quad_base
            tri_closest, tri_any = _closest, _any

            def _closest(o, d, t_max):
                hit = tri_closest(o, d, t_max)
                eff = jnp.where(jnp.isfinite(hit.t), hit.t, t_max)
                tq, qi, u, v = quadrics_mod.intersect(qtype, qparams,
                                                      o, d, eff)
                take = qi >= 0  # already tested tq < eff
                return traverse.Hit(
                    t=jnp.where(take, tq, hit.t),
                    prim=jnp.where(take, base + qi, hit.prim),
                    b1=jnp.where(take, u, hit.b1),
                    b2=jnp.where(take, v, hit.b2))

            def _any(o, d, t_max):
                return tri_any(o, d, t_max) | quadrics_mod.intersect_any(
                    qtype, qparams, o, d, t_max)

        return BoundIntersectors(closest=_closest, any_hit=_any,
                                 backend=self.backend)

    # convenience: direct (eager / closure) use — fine for CPU tests and
    # small scenes, avoid inside an outer jit for big ones
    @property
    def closest(self):
        return self.bind().closest

    @property
    def any_hit(self):
        return self.bind().any_hit


def make_intersectors(scene, dbvh, use_pallas: bool | None = None,
                      sort: bool = True) -> Intersectors:
    """Pick the fastest traversal backend for this scene on this platform.

    `use_pallas=None` auto-selects: Pallas on non-CPU backends (VMEM kernel
    when the scene fits residency, HBM+cache kernel otherwise), XLA on CPU.
    Host-side packing + the single device upload happen here. `scene`/`dbvh`
    should be host (numpy) arrays — packing from device arrays would read
    back over the (slow) transport.
    """
    n_tris = int(scene.tri_p.shape[0])
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"

    # analytic quadric tables (prim ids offset by the PADDED tri count so
    # they index tri_shade's appended rows)
    quads = None
    if getattr(scene, "n_quadrics", 0):
        quads = (jnp.asarray(scene.quad_type), jnp.asarray(scene.quad_params))

    tri_p_end = getattr(scene, "tri_p_end", None)

    def with_motion(isect, *end_core):
        if tri_p_end is not None:
            isect.tables_end = (tuple(end_core), None)
        return isect

    if not use_pallas:
        tables = ((jax.tree.map(jnp.asarray, dbvh), jnp.asarray(scene.tri_p)),
                  quads)
        return with_motion(
            Intersectors("xla", tables, scene.bounds, sort=False,
                         quad_base=n_tris),
            None, jnp.asarray(tri_p_end) if tri_p_end is not None else None)

    # Default backend (r5): BVH4 wide nodes with bf16-packed bounds
    # (pallas_bvh4.py) — half the iterations of the binary kernel, and the
    # compressed node table stays VMEM-resident up to multi-M-tri scenes
    # (crown ~9 MB), which measured 13-20x faster than the old HBM
    # block-cache kernel at 1.6-5.6M tris and ~par on the 65k bench scene.
    # BVH_BACKEND=binary|bvh8|hbm selects the older kernels for comparison.
    import os as _os

    forced = _os.environ.get("BVH_BACKEND")
    if forced == "bvh8":
        psw = pallas_bvh8.PackedSceneW(dbvh, scene.tri_p)
        if psw.usable():
            return Intersectors(
                "pallas_bvh8",
                ((psw.bounds_tab, psw.meta_tab, psw.tri_tab), quads),
                scene.bounds, sort=sort, quad_base=n_tris)
    if forced not in ("binary", "hbm"):
        ps4 = pallas_bvh4.PackedSceneW4(dbvh, scene.tri_p)
        if tri_p_end is not None:
            te2d = pallas_traverse.pack_tris(tri_p_end)
            te3d = jnp.asarray(te2d.reshape(-1, 9, pallas_traverse.LANES))
            te2d = jnp.asarray(te2d)
        if ps4.tri_resident():
            return with_motion(
                Intersectors("bvh4", ((ps4.node_tab, ps4.tri_tab_2d), quads),
                             scene.bounds, sort=sort, quad_base=n_tris),
                None, te2d if tri_p_end is not None else None)
        if ps4.usable():
            return with_motion(
                Intersectors("bvh4_hbm",
                             ((ps4.node_tab, ps4.tri_tab_3d), quads),
                             scene.bounds, sort=sort, quad_base=n_tris),
                None, te3d if tri_p_end is not None else None)
    if forced != "hbm" and pallas_traverse.usable(dbvh, n_tris):
        ps = pallas_traverse.PackedScene(dbvh, scene.tri_p)
        return Intersectors("pallas_vmem", ((ps.node_tab, ps.tri_tab), quads),
                            scene.bounds, sort=sort, quad_base=n_tris)
    psh = hbm_traverse.PackedSceneHBM(dbvh, scene.tri_p)
    return Intersectors("pallas_hbm", ((psh.node_tab, psh.tri_tab), quads),
                        scene.bounds, sort=sort, quad_base=n_tris)
