"""HBM-resident Pallas packet BVH traversal with a VMEM block cache.

Removes the VMEM-residency cap of `pallas_traverse.py` (~100k tris): node and
triangle tables live in HBM, packed in 128-entry blocks (nodes: (NB, 8, 128)
f32 tiles, triangles: (NTB, 9, 128)), and traversal streams blocks through a
direct-mapped VMEM cache on demand via `pltpu.make_async_copy`. Cache tags sit
in SMEM and persist across the (sequential) ray-tile grid, so the hot top of
the tree is fetched once per kernel launch and hit thereafter; cold subtree
blocks amortize over the whole ray batch because consecutive packets are
Morton/octant sorted (see pallas_traverse.make_sorted_isect).

This is the TPU analog of the reference's arbitrary-size aggregates: the CPU
BVH walks nodes from main memory through the cache hierarchy
(`cpu/aggregates.cpp:529`), and OptiX builds multi-GB GAS in device global
memory (`gpu/aggregate.cpp:79`). On a TPU the "cache hierarchy" must be built
by hand: HBM -> (DMA) -> VMEM -> VPU.

Packet semantics are identical to pallas_traverse: one shared SMEM stack per
(8,128) ray tile, a node is visited if ANY lane hits its slab, front-to-back
descent by the packet's majority direction sign on the split axis.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import DeviceBVH, Hit
from .pallas_traverse import (
    TILE_ROWS, LANES, MAX_LEAF, _BIG,
    pack_nodes, pack_tris, _extract_lane, _slab_tile, _tri_isect_tile,
)

Array = jax.Array

STACK_DEPTH = 128      # crown-class trees are deeper than small-scene ones
NODE_SLOTS = 1024      # 1024 blocks x 4 KB   = 4.0 MB node cache
TRI_SLOTS = 1024       # 1024 blocks x 4.5 KB = 4.5 MB triangle cache


class PackedSceneHBM:
    """Host-packed HBM traversal tables (3D block layout), uploaded once."""

    def __init__(self, dbvh: DeviceBVH, tri_p):
        from .pallas_traverse import tree_depth
        depth = tree_depth(dbvh.node_meta)
        if depth >= STACK_DEPTH - 1:
            raise ValueError(
                f"BVH depth {depth} overflows the HBM kernel's per-packet "
                f"SMEM stack (STACK_DEPTH={STACK_DEPTH})")
        nodes2d = pack_nodes(dbvh.node_lo, dbvh.node_hi, dbvh.node_meta)
        tris2d = pack_tris(tri_p)
        self.node_tab = jnp.asarray(nodes2d.reshape(-1, 8, LANES))
        self.tri_tab = jnp.asarray(tris2d.reshape(-1, 9, LANES))
        self.n_nodes = dbvh.n_nodes
        self.hbm_bytes = (self.node_tab.size + self.tri_tab.size) * 4


from .pallas_traverse import N_PACKETS


def _make_kernel(any_hit: bool):
    """Lockstep-M-packet HBM traversal: same structure as
    pallas_traverse._make_kernel (M independent per-packet stacks in one
    while loop, vector-register box fields, unconditional pushes) with the
    direct-mapped VMEM block cache of this module in front of the node and
    triangle tables. Cache fills are pl.when-gated (branch taken only on
    miss; tags persist across the sequential ray-tile grid)."""
    M = N_PACKETS
    rpp = TILE_ROWS // M

    def kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        node_hbm, tri_hbm,
        t_ref, prim_ref, b1_ref, b2_ref,
        stack_ref, ntag_ref, ttag_ref, ncache_ref, tcache_ref, sem_ref,
    ):
        # cold-start: invalidate the cache once per launch; tags persist
        # across the sequential ray-tile grid after that
        @pl.when(pl.program_id(0) == 0)
        def _():
            def init(i, _):
                @pl.when(i < NODE_SLOTS)
                def _():
                    ntag_ref[i] = -1

                @pl.when(i < TRI_SLOTS)
                def _():
                    ttag_ref[i] = -1

                return 0

            jax.lax.fori_loop(0, max(NODE_SLOTS, TRI_SLOTS), init, 0)

        def fill_node(blk):
            """Direct-mapped fetch of node block `blk`; returns its slot."""
            slot = jax.lax.rem(blk, NODE_SLOTS)

            @pl.when(ntag_ref[slot] != blk)
            def _():
                cp = pltpu.make_async_copy(
                    node_hbm.at[blk], ncache_ref.at[slot], sem_ref.at[0]
                )
                cp.start()
                cp.wait()
                ntag_ref[slot] = blk

            return slot

        def fill_tri(blk):
            slot = jax.lax.rem(blk, TRI_SLOTS)

            @pl.when(ttag_ref[slot] != blk)
            def _():
                cp = pltpu.make_async_copy(
                    tri_hbm.at[blk], tcache_ref.at[slot], sem_ref.at[1]
                )
                cp.start()
                cp.wait()
                ttag_ref[slot] = blk

            return slot

        iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        t_ref[...] = tmax_ref[...]
        if any_hit:
            prim_ref[...] = jnp.where(tmax_ref[...] < 0.0, 0, -1).astype(jnp.int32)
        else:
            prim_ref[...] = jnp.full((TILE_ROWS, LANES), -1, jnp.int32)
        b1_ref[...] = jnp.zeros((TILE_ROWS, LANES), jnp.float32)
        b2_ref[...] = jnp.zeros((TILE_ROWS, LANES), jnp.float32)

        tiny = 1e-20
        packs = []
        sp0 = []
        for p in range(M):
            sl = pl.ds(p * rpp, rpp)
            ox, oy, oz = ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :]
            dx, dy, dz = dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :]
            t0 = tmax_ref[sl, :]
            safe = lambda c: jnp.where(jnp.abs(c) < tiny,
                                       jnp.where(c < 0, -tiny, tiny), c)
            inv = (1.0 / safe(dx), 1.0 / safe(dy), 1.0 / safe(dz))
            neg = ((jnp.sum(dx) < 0.0).astype(jnp.int32),
                   (jnp.sum(dy) < 0.0).astype(jnp.int32),
                   (jnp.sum(dz) < 0.0).astype(jnp.int32))
            live = jnp.any(t0 >= 0.0) if any_hit else jnp.any(t0 > 0.0)
            packs.append((ox, oy, oz, dx, dy, dz, inv, neg))
            stack_ref[p * STACK_DEPTH] = 0
            sp0.append(jnp.where(live, 0, -1))

        def cond(sps):
            alive = sps[0] >= 0
            for p in range(1, M):
                alive = alive | (sps[p] >= 0)
            return alive

        def body(sps):
            sps = list(sps)
            metas = []
            for p in range(M):
                ox, oy, oz, dx, dy, dz, inv, neg = packs[p]
                sp = sps[p]
                alive = sp >= 0
                node = stack_ref[p * STACK_DEPTH + jnp.maximum(sp, 0)]
                nslot = fill_node(node // LANES)
                tile = ncache_ref[nslot]                       # (8, 128)
                lane = jax.lax.rem(node, LANES)
                sel = iota_l == lane
                fv = jnp.max(jnp.where(sel, tile, -_BIG), axis=1, keepdims=True)
                meta = jnp.max(jnp.where(sel, tile[6:8], -_BIG), axis=1)
                offset = meta[0].astype(jnp.int32)
                cnt_axis = meta[1].astype(jnp.int32)
                count = jax.lax.rem(cnt_axis, 32)
                axis = cnt_axis // 32
                fvb = jnp.broadcast_to(fv, (8, LANES))
                box = tuple(fvb[i:i + 1] for i in range(6))
                t_best = t_ref[pl.ds(p * rpp, rpp), :]
                hit_any = jnp.any(
                    _slab_tile(ox, oy, oz, inv[0], inv[1], inv[2], t_best,
                               box[0:3], box[3:6])) & alive
                metas.append((node, offset, count, axis, hit_any))

            for p in range(M):
                ox, oy, oz, dx, dy, dz, inv, neg = packs[p]
                node, offset, count, axis, hit_any = metas[p]
                is_leaf = count > 0
                descend = hit_any & jnp.logical_not(is_leaf)
                ng = jnp.where(axis == 0, neg[0],
                               jnp.where(axis == 1, neg[1], neg[2]))
                near = jnp.where(ng == 1, offset, node + 1)
                far = jnp.where(ng == 1, node + 1, offset)
                sp = sps[p]
                # clamped so spc+1 stays inside this packet's stack region
                spc = p * STACK_DEPTH + jnp.clip(sp, 0, STACK_DEPTH - 2)
                stack_ref[spc] = jnp.where(descend, far, node)
                stack_ref[spc + 1] = near
                if any_hit:
                    done = jnp.all(prim_ref[pl.ds(p * rpp, rpp), :] >= 0)
                    sps[p] = jnp.where(done, -1,
                                       jnp.where(descend, sp + 1, sp - 1))
                else:
                    sps[p] = jnp.where(descend, sp + 1, sp - 1)

                @pl.when(hit_any & is_leaf)
                def _(p=p, offset=offset, count=count, ox=ox, oy=oy, oz=oz,
                      dx=dx, dy=dy, dz=dz):
                    sl = pl.ds(p * rpp, rpp)
                    # leaf tris are a contiguous range spanning <= 2 blocks
                    blk0 = offset // LANES
                    blk1 = (offset + count - 1) // LANES
                    slot0 = fill_tri(blk0)
                    slot1 = fill_tri(blk1)
                    t_best = t_ref[sl, :]
                    prim = prim_ref[sl, :]
                    b1a = b1_ref[sl, :]
                    b2a = b2_ref[sl, :]
                    for j in range(MAX_LEAF):
                        tj = jnp.minimum(offset + j, offset + count - 1)
                        tslot = jnp.where(tj // LANES == blk0, slot0, slot1)
                        tri_tile = tcache_ref[tslot]
                        v = _extract_lane(tri_tile, jax.lax.rem(tj, LANES))
                        h, t, b1, b2 = _tri_isect_tile(ox, oy, oz, dx, dy, dz,
                                                       t_best, v)
                        h = h & (j < count)
                        if any_hit:
                            # kill hit lanes outright: t_best = -BIG removes
                            # them from every later slab test, so occluded
                            # packets stop driving descent and the all-done
                            # exit fires sooner
                            t_best = jnp.where(h, -_BIG, t_best)
                        else:
                            t_best = jnp.where(h, t, t_best)
                        prim = jnp.where(h, tj, prim)
                        b1a = jnp.where(h, b1, b1a)
                        b2a = jnp.where(h, b2, b2a)
                    t_ref[sl, :] = t_best
                    prim_ref[sl, :] = prim
                    b1_ref[sl, :] = b1a
                    b2_ref[sl, :] = b2a

            return tuple(sps)

        jax.lax.while_loop(cond, body, tuple(sp0))

    return kernel


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _traverse_hbm(node_tab, tri_tab, o, d, t_max,
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
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)

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
        in_specs=[ray_spec] * 7 + [hbm_spec, hbm_spec],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH * N_PACKETS,), jnp.int32),
            pltpu.SMEM((NODE_SLOTS,), jnp.int32),
            pltpu.SMEM((TRI_SLOTS,), jnp.int32),
            pltpu.VMEM((NODE_SLOTS, 8, LANES), jnp.float32),
            pltpu.VMEM((TRI_SLOTS, 9, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(*args, node_tab, tri_tab)

    t = t.reshape(-1)[:R]
    prim = prim.reshape(-1)[:R]
    b1 = b1.reshape(-1)[:R]
    b2 = b2.reshape(-1)[:R]
    miss = prim < 0
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim, b1=b1, b2=b2)


def intersect_closest(dbvh: DeviceBVH, tri_p: Array, o: Array, d: Array,
                      t_max: Array, interpret: bool = False) -> Hit:
    ps = PackedSceneHBM(dbvh, tri_p)
    return _traverse_hbm(ps.node_tab, ps.tri_tab, o, d, t_max,
                         any_hit=False, interpret=interpret)


def intersect_any(dbvh: DeviceBVH, tri_p: Array, o: Array, d: Array,
                  t_max: Array, interpret: bool = False) -> Array:
    ps = PackedSceneHBM(dbvh, tri_p)
    h = _traverse_hbm(ps.node_tab, ps.tri_tab, o, d, t_max,
                      any_hit=True, interpret=interpret)
    return h.prim >= 0
