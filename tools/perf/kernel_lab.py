#!/usr/bin/env python
"""Traversal kernel lab: measure WHERE the packet-traversal time goes on the
real chip, then A/B kernel variants.

Measurements (65k-tri bench scene, 65536 rays of three classes):
  1. status-quo VMEM kernel wall time per ray class
  2. iteration + leaf-visit counts per packet (counter kernel)
  3. node-only variant (leaf tri tests compiled out) -> leaf share
  4. K-pop ILP variant (pop K nodes per while iteration)
  5. rows sweep {8, 16, 32}

Run: JAX_PLATFORMS=axon python tools/perf/kernel_lab.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nn_bvh_tpu.utils.cache import enable_jax_cache

enable_jax_cache()

from nn_bvh_tpu.accel.pallas_traverse import (
    LANES, MAX_LEAF, _BIG, _extract_lane, _slab_tile, _tri_isect_tile,
    pack_nodes, pack_tris, ray_sort_key,
)

STACK_DEPTH = 64


# ---------------------------------------------------------------------------
# parameterized kernel: rows x K-pop x leaf mode x counters
# ---------------------------------------------------------------------------

def make_lab_kernel(rows: int, k_pop: int, leaf_mode: str, count: bool,
                    vec: bool = False):
    """leaf_mode: 'extract8' | 'none'. vec=True keeps node/tri fields in
    vector registers ((F,1) lane-reduced tiles) instead of extracting scalars
    — only offset/count/hit_any cross to the scalar unit."""

    def kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        node_ref, tri_ref,
        t_ref, prim_ref, b1_ref, b2_ref, cnt_ref, cnt2_ref,
        stack_ref,
    ):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        t0 = tmax_ref[...]

        tiny = 1e-20
        safe = lambda c: jnp.where(jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c)
        inv_dx = 1.0 / safe(dx)
        inv_dy = 1.0 / safe(dy)
        inv_dz = 1.0 / safe(dz)

        t_ref[...] = t0
        prim_ref[...] = jnp.full_like(t0, -1.0).astype(jnp.int32)
        b1_ref[...] = jnp.zeros_like(t0)
        b2_ref[...] = jnp.zeros_like(t0)
        cnt_ref[...] = jnp.zeros_like(t0).astype(jnp.int32)
        cnt2_ref[...] = jnp.zeros_like(t0).astype(jnp.int32)

        neg_x = (jnp.sum(dx) < 0.0).astype(jnp.int32)
        neg_y = (jnp.sum(dy) < 0.0).astype(jnp.int32)
        neg_z = (jnp.sum(dz) < 0.0).astype(jnp.int32)

        stack_ref[0] = 0
        live = jnp.any(t0 > 0.0)

        def visit(node, iters, leafs):
            """Process one node index (>=0). Returns new sp delta via pushes."""
            tile = node_ref[pl.ds((node // LANES) * 8, 8), :]
            lane = node % LANES
            if vec:
                sel = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == lane
                fv = jnp.max(jnp.where(sel, tile, -_BIG), axis=1, keepdims=True)
                # scalar unit needs only the meta row
                meta = jnp.max(jnp.where(sel, tile[6:8], -_BIG), axis=1)
                offset = meta[0].astype(jnp.int32)
                cnt_axis = meta[1].astype(jnp.int32)
                box = tuple(
                    jnp.broadcast_to(fv[i:i + 1], (1, LANES))
                    for i in range(6))
            else:
                f = _extract_lane(tile, lane)
                offset = f[6].astype(jnp.int32)
                cnt_axis = f[7].astype(jnp.int32)
                box = tuple(f[i] for i in range(6))
            cnt_leaf = jax.lax.rem(cnt_axis, 32)
            axis = cnt_axis // 32

            t_best = t_ref[...]
            hit_any = jnp.any(
                _slab_tile(ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
                           box[0:3], box[3:6])
            )
            is_leaf = cnt_leaf > 0

            if leaf_mode == "extract8":
                @pl.when(hit_any & is_leaf)
                def _():
                    for j in range(MAX_LEAF):
                        tj = jnp.minimum(offset + j, offset + cnt_leaf - 1)
                        tri_tile = tri_ref[pl.ds((tj // LANES) * 9, 9), :]
                        if vec:
                            tsel = (jax.lax.broadcasted_iota(
                                jnp.int32, (1, LANES), 1) == tj % LANES)
                            vv = jnp.max(jnp.where(tsel, tri_tile, -_BIG),
                                         axis=1, keepdims=True)
                            v = tuple(
                                jnp.broadcast_to(vv[i:i + 1], (1, LANES))
                                for i in range(9))
                        else:
                            v = _extract_lane(tri_tile, tj % LANES)
                        tb = t_ref[...]
                        h, t, b1, b2 = _tri_isect_tile(ox, oy, oz, dx, dy, dz, tb, v)
                        h = h & (j < cnt_leaf)
                        t_ref[...] = jnp.where(h, t, tb)
                        prim_ref[...] = jnp.where(h, tj, prim_ref[...])
                        b1_ref[...] = jnp.where(h, b1, b1_ref[...])
                        b2_ref[...] = jnp.where(h, b2, b2_ref[...])

            descend = hit_any & jnp.logical_not(is_leaf)
            neg = jnp.where(axis == 0, neg_x, jnp.where(axis == 1, neg_y, neg_z))
            near = jnp.where(neg == 1, offset, node + 1)
            far = jnp.where(neg == 1, node + 1, offset)
            iters = iters + 1
            leafs = leafs + jnp.where(hit_any & is_leaf, 1, 0)
            return descend, near, far, iters, leafs

        def body(carry):
            sp, iters, leafs = carry
            if k_pop == 1:
                node = stack_ref[sp]
                sp = sp - 1
                descend, near, far, iters, leafs = visit(node, iters, leafs)

                @pl.when(descend)
                def _():
                    stack_ref[sp + 1] = far
                    stack_ref[sp + 2] = near

                sp = jnp.where(descend, sp + 2, sp)
            else:
                # pop up to K nodes, visit all (ILP across the K chains),
                # then push all children
                nodes = []
                for k in range(k_pop):
                    idx = sp - k
                    nodes.append(jnp.where(idx >= 0, stack_ref[jnp.maximum(idx, 0)], -1))
                sp = sp - jnp.minimum(k_pop, sp + 1)
                results = []
                for k in range(k_pop):
                    n = nodes[k]
                    descend, near, far, iters, leafs = visit(
                        jnp.maximum(n, 0), iters, leafs)
                    descend = descend & (n >= 0)
                    results.append((descend, near, far))
                for k in range(k_pop):
                    descend, near, far = results[k]

                    @pl.when(descend)
                    def _(sp=sp, far=far, near=near):
                        stack_ref[sp + 1] = far
                        stack_ref[sp + 2] = near

                    sp = jnp.where(descend, sp + 2, sp)
            return sp, iters, leafs

        def cond(carry):
            sp, _, _ = carry
            return sp >= 0

        sp, iters, leafs = jax.lax.while_loop(
            cond, body, (jnp.where(live, 0, -1), jnp.int32(0), jnp.int32(0))
        )
        if count:
            cnt_ref[...] = jnp.full((rows, LANES), 0, jnp.int32) + iters
            cnt2_ref[...] = jnp.full((rows, LANES), 0, jnp.int32) + leafs

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "k_pop", "leaf_mode", "count", "vec"))
def lab_traverse(node_tab, tri_tab, o, d, t_max, rows=32, k_pop=1,
                 leaf_mode="extract8", count=False, vec=False):
    R = o.shape[0]
    pad = (-R) % (rows * LANES)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    Rp = R + pad
    nrows = Rp // LANES
    comp = lambda x: x.reshape(nrows, LANES)
    args = (comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
            comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]), comp(t_max))
    grid = (nrows // rows,)
    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    kernel = make_lab_kernel(rows, k_pop, leaf_mode, count, vec)
    out_shape = [
        jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
    ]
    t, prim, b1, b2, cnt, cnt2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 7 + [full(node_tab), full(tri_tab)],
        out_specs=[ray_spec] * 6,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )(*args, node_tab, tri_tab)
    return t, prim, cnt, cnt2


# ---------------------------------------------------------------------------
# branchless variant: vector while-carry, no pl.when, unconditional pushes
# ---------------------------------------------------------------------------

def make_brless_kernel(rows: int, leaf_when: bool):
    def kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        node_ref, tri_ref,
        t_ref, prim_ref, b1_ref, b2_ref, cnt_ref, cnt2_ref,
        stack_ref,
    ):
        ox = ox_ref[...]
        oy = oy_ref[...]
        oz = oz_ref[...]
        dx = dx_ref[...]
        dy = dy_ref[...]
        dz = dz_ref[...]
        t0 = tmax_ref[...]

        tiny = 1e-20
        safe = lambda c: jnp.where(jnp.abs(c) < tiny, jnp.where(c < 0, -tiny, tiny), c)
        inv_dx = 1.0 / safe(dx)
        inv_dy = 1.0 / safe(dy)
        inv_dz = 1.0 / safe(dz)

        cnt_ref[...] = jnp.zeros((rows, LANES), jnp.int32)
        cnt2_ref[...] = jnp.zeros((rows, LANES), jnp.int32)

        neg_x = (jnp.sum(dx) < 0.0).astype(jnp.int32)
        neg_y = (jnp.sum(dy) < 0.0).astype(jnp.int32)
        neg_z = (jnp.sum(dz) < 0.0).astype(jnp.int32)

        stack_ref[0] = 0
        live = jnp.any(t0 > 0.0)

        prim0 = jnp.full((rows, LANES), -1, jnp.int32)
        zero = jnp.zeros((rows, LANES), jnp.float32)

        def cond(c):
            return c[0] >= 0

        def body(c):
            sp, t_best, prim, b1a, b2a = c
            node = stack_ref[sp]

            tile = node_ref[pl.ds((node // LANES) * 8, 8), :]
            lane = node % LANES
            sel = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == lane
            fv = jnp.max(jnp.where(sel, tile, -_BIG), axis=1, keepdims=True)
            meta = jnp.max(jnp.where(sel, tile[6:8], -_BIG), axis=1)
            offset = meta[0].astype(jnp.int32)
            cnt_axis = meta[1].astype(jnp.int32)
            box = tuple(jnp.broadcast_to(fv[i:i + 1], (1, LANES))
                        for i in range(6))
            cnt_leaf = jax.lax.rem(cnt_axis, 32)
            axis = cnt_axis // 32

            hit_any = jnp.any(
                _slab_tile(ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
                           box[0:3], box[3:6]))
            is_leaf = cnt_leaf > 0

            def leaf_work(t_best, prim, b1a, b2a):
                gate = hit_any & is_leaf if not leaf_when else True
                for j in range(MAX_LEAF):
                    tj = jnp.minimum(offset + j, offset + cnt_leaf - 1)
                    tri_tile = tri_ref[pl.ds((tj // LANES) * 9, 9), :]
                    tsel = (jax.lax.broadcasted_iota(
                        jnp.int32, (1, LANES), 1) == tj % LANES)
                    vv = jnp.max(jnp.where(tsel, tri_tile, -_BIG),
                                 axis=1, keepdims=True)
                    v = tuple(jnp.broadcast_to(vv[i:i + 1], (1, LANES))
                              for i in range(9))
                    h, t, b1, b2 = _tri_isect_tile(ox, oy, oz, dx, dy, dz,
                                                   t_best, v)
                    h = h & (j < cnt_leaf)
                    if not leaf_when:
                        h = h & gate
                    t_best = jnp.where(h, t, t_best)
                    prim = jnp.where(h, tj, prim)
                    b1a = jnp.where(h, b1, b1a)
                    b2a = jnp.where(h, b2, b2a)
                return t_best, prim, b1a, b2a

            if leaf_when:
                # refs for conditional mutation under pl.when is awkward with
                # carry; emulate with select on scalar gate
                do = hit_any & is_leaf
                t2, p2, b12, b22 = leaf_work(t_best, prim, b1a, b2a)
                g = do.astype(jnp.float32)
                gi = do.astype(jnp.int32)
                t_best = jnp.where(do, t2, t_best)
                prim = jnp.where(do, p2, prim)
                b1a = jnp.where(do, b12, b1a)
                b2a = jnp.where(do, b22, b2a)
            else:
                t_best, prim, b1a, b2a = leaf_work(t_best, prim, b1a, b2a)

            descend = hit_any & jnp.logical_not(is_leaf)
            neg = jnp.where(axis == 0, neg_x, jnp.where(axis == 1, neg_y, neg_z))
            near = jnp.where(neg == 1, offset, node + 1)
            far = jnp.where(neg == 1, node + 1, offset)
            # unconditional push above top-of-stack: harmless when not taken
            stack_ref[sp] = far
            stack_ref[sp + 1] = near
            sp = jnp.where(descend, sp + 1, sp - 1)
            return sp, t_best, prim, b1a, b2a

        sp, t_best, prim, b1a, b2a = jax.lax.while_loop(
            cond, body,
            (jnp.where(live, 0, -1), t0, prim0, zero, zero))
        t_ref[...] = t_best
        prim_ref[...] = prim
        b1_ref[...] = b1a
        b2_ref[...] = b2a

    return kernel


@functools.partial(jax.jit, static_argnames=("rows", "leaf_when"))
def brless_traverse(node_tab, tri_tab, o, d, t_max, rows=32, leaf_when=False):
    R = o.shape[0]
    pad = (-R) % (rows * LANES)
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    Rp = R + pad
    nrows = Rp // LANES
    comp = lambda x: x.reshape(nrows, LANES)
    args = (comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
            comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]), comp(t_max))
    grid = (nrows // rows,)
    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    kernel = make_brless_kernel(rows, leaf_when)
    out_shape = [
        jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((nrows, LANES), jnp.int32),
    ]
    t, prim, b1, b2, cnt, cnt2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 7 + [full(node_tab), full(tri_tab)],
        out_specs=[ray_spec] * 6,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )(*args, node_tab, tri_tab)
    t = t
    miss = prim < 0
    return t, prim, cnt, cnt2


# scalar floor: while loop doing only stack pop/push + one node load+extract
def make_floor_kernel(n_iter: int, with_load: bool, with_slab: bool, rows: int):
    def kernel(ox_ref, node_ref, out_ref, stack_ref):
        ox = ox_ref[...]
        acc0 = jnp.zeros((rows, LANES), jnp.float32)

        def cond(c):
            return c[0] < n_iter

        def body(c):
            i, acc = c
            stack_ref[jax.lax.rem(i, 32)] = i
            node = stack_ref[jax.lax.rem(i * 7 + 3, 32)]
            if with_load:
                tile = node_ref[pl.ds((jax.lax.rem(node, 17000) // LANES) * 8, 8), :]
                sel = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == node % LANES
                fv = jnp.max(jnp.where(sel, tile, -_BIG), axis=1, keepdims=True)
                if with_slab:
                    box = tuple(jnp.broadcast_to(fv[k:k + 1], (1, LANES))
                                for k in range(6))
                    t0 = (box[0] - ox)
                    t1 = (box[3] - ox)
                    hit = jnp.any(jnp.minimum(t0, t1) < jnp.maximum(t0, t1) * 0.9)
                    i = i + hit.astype(jnp.int32) * 0
                else:
                    acc = acc + jnp.broadcast_to(fv[0:1], (1, LANES))
            return i + 1, acc

        i, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))
        out_ref[...] = acc + jnp.float32(i)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_iter", "with_load", "with_slab", "rows"))
def floor_bench(node_tab, o, n_iter=5000, with_load=False, with_slab=False, rows=32):
    nrows = rows
    kernel = make_floor_kernel(n_iter, with_load, with_slab, rows)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec(node_tab.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )(o[:rows * LANES].reshape(rows, LANES), node_tab)
    return out


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def bench_scene():
    import bench as bench_mod

    sc, dbvh, bvh, cam = bench_mod.build_bench_scene()
    return sc, dbvh, cam


def ray_classes(sc, dbvh, cam, R=65536):
    """camera / sorted-bounce / sorted-shadow ray batches as numpy."""
    from nn_bvh_tpu.wavefront import camera as camera_mod
    from nn_bvh_tpu.accel import traverse

    rs = np.random.RandomState(7)
    pixel_idx = jnp.arange(R, dtype=jnp.int32) % (cam.width * cam.height)
    u = jnp.asarray(rs.rand(R, 2), jnp.float32)
    o, d = camera_mod.generate_rays(cam, pixel_idx, u, u)
    o, d = np.asarray(o), np.asarray(d)

    # hit points via XLA traversal on CPU scene copy (cheap enough at 65k)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        hit = traverse.intersect_closest(
            jax.tree.map(jnp.asarray, dbvh), jnp.asarray(sc.tri_p),
            jnp.asarray(o), jnp.asarray(d), jnp.full((R,), 1e30, jnp.float32))
        t = np.asarray(hit.t)
        found = np.asarray(hit.prim) >= 0
    p = o + np.where(np.isfinite(t), t, 0.0)[:, None] * d
    # diffuse bounce: random hemisphere directions from hit points
    dirs = rs.randn(R, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ob = p + 1e-3 * dirs
    tb = np.where(found, 1e30, -1.0).astype(np.float32)
    # shadow rays: toward the area light at (0,6,0)
    lp = np.array([0.0, 6.0, 0.0], np.float32) + 0.5 * rs.randn(R, 3).astype(np.float32)
    sd = lp - p
    dist = np.linalg.norm(sd, axis=1, keepdims=True)
    sd = sd / np.maximum(dist, 1e-9)
    os_ = p + 1e-3 * sd
    ts = np.where(found, dist[:, 0] * 0.999, -1.0).astype(np.float32)

    def sorted_batch(o_, d_, t_):
        k = ray_sort_key(jnp.asarray(o_), jnp.asarray(d_),
                         jnp.asarray(sc.bounds[0], jnp.float32),
                         jnp.asarray(np.maximum(np.asarray(sc.bounds[1]) - np.asarray(sc.bounds[0]), 1e-9), jnp.float32),
                         jnp.asarray(t_))
        order = np.asarray(jnp.argsort(k))
        return o_[order], d_[order], t_[order]

    cam_rays = (o, d, np.full((R,), 1e30, np.float32))
    bounce = sorted_batch(ob, dirs, tb)
    shadow = sorted_batch(os_, sd, ts)
    return {"camera": cam_rays, "bounce": bounce, "shadow": shadow}


def timeit(fn, *args, n=6, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--rows", type=int, nargs="*", default=[8, 16, 32])
    ap.add_argument("--kpop", type=int, nargs="*", default=[1, 2, 4])
    args = ap.parse_args()

    sc, dbvh, cam = bench_scene()
    print(f"scene: {sc.tri_p.shape[0]} tris, {dbvh.n_nodes} nodes")
    rays = ray_classes(sc, dbvh, cam)

    node_tab = jnp.asarray(pack_nodes(dbvh.node_lo, dbvh.node_hi, dbvh.node_meta))
    tri_tab = jnp.asarray(pack_tris(sc.tri_p))

    R = 65536
    results = {}

    def run(tag, cls, **kw):
        o, d, tm = rays[cls]
        o, d, tm = jnp.asarray(o), jnp.asarray(d), jnp.asarray(tm)
        dt, (t, prim, cnt, cnt2) = timeit(lab_traverse, node_tab, tri_tab, o, d, tm, **kw)
        mrays = R / dt / 1e6
        hits = int(jnp.sum(prim >= 0))
        line = f"{tag:42s} {cls:7s} {dt*1e3:8.2f} ms  {mrays:7.2f} Mray/s  hits={hits}"
        if kw.get("count"):
            rws = kw.get("rows", 32)
            iters = int(np.asarray(cnt)[::rws, 0].sum())
            leafs = int(np.asarray(cnt2)[::rws, 0].sum())
            line += f"  iters={iters}  leafs={leafs}"
        print(line, flush=True)
        results[(tag, cls)] = dt
        return dt

    classes = ["bounce"] if args.quick else ["camera", "bounce", "shadow"]

    # 1. status quo + counters
    for cls in classes:
        run("sq rows=32 k=1", cls, rows=32, k_pop=1)
    for cls in classes:
        run("sq+count rows=32 k=1", cls, rows=32, k_pop=1, count=True)

    # 2. scalar floor microbench
    o_f = jnp.asarray(rays["bounce"][0])
    ox_flat = jnp.tile(o_f[:, 0], 2)
    for n_it, wl, ws, tag in [
        (20000, False, False, "floor: stack only"),
        (20000, True, False, "floor: +load+extract"),
        (20000, True, True, "floor: +slab+any"),
    ]:
        dt, _ = timeit(floor_bench, node_tab, ox_flat, n_iter=n_it,
                       with_load=wl, with_slab=ws)
        print(f"{tag:42s} {dt/n_it*1e9:8.1f} ns/iter", flush=True)

    # 3. branchless variants
    for cls in classes:
        o, d, tm = (jnp.asarray(x) for x in rays[cls])
        dt, (t, prim, _, _) = timeit(brless_traverse, node_tab, tri_tab, o, d, tm,
                                     rows=32, leaf_when=False)
        hits = int(jnp.sum(prim.reshape(-1)[:65536] >= 0))
        print(f"{'brless leaf=always rows=32':42s} {cls:7s} {dt*1e3:8.2f} ms  {65536/dt/1e6:7.2f} Mray/s  hits={hits}", flush=True)
        dt, (t, prim, _, _) = timeit(brless_traverse, node_tab, tri_tab, o, d, tm,
                                     rows=32, leaf_when=True)
        hits = int(jnp.sum(prim.reshape(-1)[:65536] >= 0))
        print(f"{'brless leaf=select rows=32':42s} {cls:7s} {dt*1e3:8.2f} ms  {65536/dt/1e6:7.2f} Mray/s  hits={hits}", flush=True)


if __name__ == "__main__":
    main()
