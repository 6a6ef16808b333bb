"""Pallas TPU packet traversal over bf16-compressed BVH4 wide nodes.

Lockstep-M structure of pallas_traverse._make_kernel (M independent per-
packet SMEM stacks in ONE while loop so the per-visit dependent chains
overlap), but each visit pops a WIDE node and slab-tests its 4 children as
vector work:

  pop entry -> (interior) dynamic (8,128) node-block load -> pltpu.roll to
  columns 0..1 -> two lane-broadcasts -> bf16-pair decode (2 bit ops per
  column) -> 4 slab tests on the (rpp,128) ray sub-tile -> per-child
  packet-min entry-t (4 vector reduces) -> scalar 4-key sort network ->
  branchless compacted pushes (far-to-near, misses overwritten).

Iterations drop ~2x vs the binary kernel (half the interior nodes, and
true front-to-back child ordering instead of the majority-sign heuristic);
the node table shrinks ~3.4x vs the binary f32 layout, which makes crown-
class trees (~150k wide nodes ~ 9 MB) VMEM-RESIDENT — the HBM block-cache
kernel then only fronts the triangle table (tri_resident=False variant).

Leaves ride the stack as negative entries (bvh4.py encoding) and are
processed under pl.when on pop, reusing the lane-major (9,128) triangle
blocks + Moller-Trumbore tile test of pallas_traverse.

Reference analogs: cpu/aggregates.cpp:529 stack walk semantics (same hits,
different order), gpu/aggregate.cpp OptiX wide HW traversal.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bvh4
from .traverse import DeviceBVH, Hit
from .pallas_traverse import (
    TILE_ROWS, LANES, N_PACKETS, MAX_LEAF, _BIG,
    pack_tris, _extract_lane, _tri_isect_tile,
)

Array = jax.Array

STACK_DEPTH = 192          # 3 entries/level x deep crown-class trees
# v5e has 128 MB VMEM/core; pallas_call raises the scoped limit to 100 MB
# (the default 16 MB limit is a compiler knob, not the hardware). Budgets
# leave headroom for ray tiles, outputs and compiler temporaries.
VMEM_BUDGET = 24 * 1024 * 1024     # resident-tri variant: node + tri tables
#   (beyond this the HBM-tri + cache variant measured just as fast, with far
#    more headroom for the rest of the wave program's VMEM needs)
NODE_VMEM_CAP = 72 * 1024 * 1024   # HBM-tri variant: resident node table cap
TRI_SLOTS = 1024           # HBM-tri variant: 1024 x 4.5 KB = 4.5 MB cache
_NPB = bvh4.NODES_PER_BLOCK


class PackedSceneW4:
    """Host-collapsed + packed BVH4 tables, uploaded once."""

    def __init__(self, dbvh: DeviceBVH, tri_p):
        wl, wh, wm = bvh4.collapse_bvh4(
            np.asarray(dbvh.node_lo)[:dbvh.n_nodes],
            np.asarray(dbvh.node_hi)[:dbvh.n_nodes],
            np.asarray(dbvh.node_meta)[:dbvh.n_nodes])
        depth = bvh4.wide_depth(wm)
        if 3 * depth + 4 >= STACK_DEPTH:
            raise ValueError(
                f"BVH4 depth {depth} overflows STACK_DEPTH={STACK_DEPTH}")
        self.node_tab = jnp.asarray(bvh4.pack_bvh4(wl, wh, wm))
        tris2d = pack_tris(tri_p)
        self.tri_tab_2d = jnp.asarray(tris2d)                    # VMEM variant
        self.tri_tab_3d = jnp.asarray(tris2d.reshape(-1, 9, LANES))  # HBM variant
        self.n_wide = len(wl)
        self.node_bytes = self.node_tab.size * 4
        self.tri_bytes = self.tri_tab_2d.size * 4

    def tri_resident(self) -> bool:
        return (self.node_bytes + self.tri_bytes
                + TILE_ROWS * LANES * 4 * 16 < VMEM_BUDGET)

    def usable(self) -> bool:
        if self.tri_resident():
            return True
        return self.node_bytes < NODE_VMEM_CAP


def _decode_pair(col):
    """(8,128) f32 column of packed bf16 pairs -> (lo, hi) f32 tiles."""
    u = jax.lax.bitcast_convert_type(col, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return lo, hi


def _make_kernel(any_hit: bool, tri_resident: bool):
    M = N_PACKETS
    rpp = TILE_ROWS // M

    def kernel(*refs):
        if tri_resident:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
             node_ref, tri_ref,
             t_ref, prim_ref, b1_ref, b2_ref,
             stack_ref) = refs
        else:
            (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
             node_ref, tri_hbm,
             t_ref, prim_ref, b1_ref, b2_ref,
             stack_ref, ttag_ref, tcache_ref, sem_ref) = refs

            # cold-start: invalidate the tri cache once per launch; tags
            # persist across the sequential ray-tile grid afterwards
            @pl.when(pl.program_id(0) == 0)
            def _():
                def init(i, _):
                    ttag_ref[i] = -1
                    return 0
                jax.lax.fori_loop(0, TRI_SLOTS, init, 0)

            def fill_tri(blk):
                slot = jax.lax.rem(blk, TRI_SLOTS)

                @pl.when(ttag_ref[slot] != blk)
                def _():
                    cp = pltpu.make_async_copy(
                        tri_hbm.at[blk], tcache_ref.at[slot], sem_ref.at[0])
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
            live = jnp.any(t0 >= 0.0) if any_hit else jnp.any(t0 > 0.0)
            packs.append((ox, oy, oz, dx, dy, dz, inv))
            stack_ref[p * STACK_DEPTH] = 0   # wide root
            sp0.append(jnp.where(live, 0, -1))

        def cond(sps):
            alive = sps[0] >= 0
            for p in range(1, M):
                alive = alive | (sps[p] >= 0)
            return alive

        def body(sps):
            sps = list(sps)
            metas = []
            # phase 1: M independent pop + node-load + 4-child slab chains
            for p in range(M):
                ox, oy, oz, dx, dy, dz, inv = packs[p]
                sp = sps[p]
                alive = sp >= 0
                entry = stack_ref[p * STACK_DEPTH + jnp.maximum(sp, 0)]
                is_interior = alive & (entry >= 0)
                node = jnp.maximum(entry, 0)
                blk = node // _NPB
                lane0 = jax.lax.rem(node, _NPB) * 2
                tile = node_ref[pl.ds(blk * 8, 8), :]
                tile_r = pltpu.roll(tile, -lane0, 1)
                colA = jnp.broadcast_to(tile_r[:, 0:1], (8, LANES))
                colB = jnp.broadcast_to(tile_r[:, 1:2], (8, LANES))
                loA, hiA = _decode_pair(colA)
                loB, hiB = _decode_pair(colB)
                mA = jax.lax.bitcast_convert_type(colA, jnp.int32)
                mB = jax.lax.bitcast_convert_type(colB, jnp.int32)
                child_meta = (mA[3, 0], mB[3, 0], mA[7, 0], mB[7, 0])

                t_best = t_ref[pl.ds(p * rpp, rpp), :]
                keys = []
                for c in range(4):
                    lo = (loA, loB)[c % 2]
                    hi = (hiA, hiB)[c % 2]
                    r = 4 * (c // 2)
                    t0x = (lo[r + 0:r + 1] - ox) * inv[0]
                    t1x = (hi[r + 0:r + 1] - ox) * inv[0]
                    t0y = (lo[r + 1:r + 2] - oy) * inv[1]
                    t1y = (hi[r + 1:r + 2] - oy) * inv[1]
                    t0z = (lo[r + 2:r + 3] - oz) * inv[2]
                    t1z = (hi[r + 2:r + 3] - oz) * inv[2]
                    tn = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                        jnp.minimum(t0z, t1z))
                    tf = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                        jnp.maximum(t0z, t1z)) * 1.0000004
                    ok = (tn <= tf) & (tf > 0.0) & (tn < t_best)
                    # packet entry-t: the sort key; BIG == miss
                    keys.append(jnp.min(jnp.where(ok, jnp.maximum(tn, 0.0), _BIG)))
                metas.append((entry, is_interior, child_meta, keys))

            # phase 2: scalar sort + branchless compacted pushes + leaf tests
            for p in range(M):
                ox, oy, oz, dx, dy, dz, inv = packs[p]
                entry, is_interior, child_meta, keys = metas[p]
                sp = sps[p]
                kv = [(jnp.where(is_interior, keys[c], _BIG), child_meta[c])
                      for c in range(4)]

                def cswap(a, b):
                    swap = kv[a][0] > kv[b][0]
                    ka = jnp.where(swap, kv[b][0], kv[a][0])
                    kb = jnp.where(swap, kv[a][0], kv[b][0])
                    ma = jnp.where(swap, kv[b][1], kv[a][1])
                    mb = jnp.where(swap, kv[a][1], kv[b][1])
                    kv[a] = (ka, ma)
                    kv[b] = (kb, mb)

                cswap(0, 1); cswap(2, 3); cswap(0, 2); cswap(1, 3); cswap(1, 2)
                # kv ascending by key; push far -> near so nearest ends on top.
                # Misses (key == BIG) write at the same slot as the next push
                # and are overwritten; trailing misses land above the new top.
                base = p * STACK_DEPTH
                cnt = jnp.int32(0)
                for c in (3, 2, 1, 0):
                    k, m = kv[c]
                    h = (k < _BIG).astype(jnp.int32)
                    pos = base + jnp.clip(jnp.maximum(sp, 0) + cnt, 0,
                                          STACK_DEPTH - 1)
                    stack_ref[pos] = m
                    cnt = cnt + h
                if any_hit:
                    done = jnp.all(prim_ref[pl.ds(p * rpp, rpp), :] >= 0)
                    sps[p] = jnp.where(done, -1, sp - 1 + cnt)
                else:
                    sps[p] = sp - 1 + cnt

                is_leaf = (sp >= 0) & (entry < 0)

                @pl.when(is_leaf)
                def _(p=p, entry=entry, ox=ox, oy=oy, oz=oz,
                      dx=dx, dy=dy, dz=dz):
                    u = -entry - 1
                    offset = u // 16
                    count = jax.lax.rem(u, 16) + 1
                    sl = pl.ds(p * rpp, rpp)
                    if not tri_resident:
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
                        if tri_resident:
                            tri_tile = tri_ref[pl.ds((tj // LANES) * 9, 9), :]
                        else:
                            tslot = jnp.where(tj // LANES == blk0, slot0, slot1)
                            tri_tile = tcache_ref[tslot]
                        v = _extract_lane(tri_tile, jax.lax.rem(tj, LANES))
                        h, t, b1, b2 = _tri_isect_tile(ox, oy, oz, dx, dy, dz,
                                                       t_best, v)
                        h = h & (j < count)
                        if any_hit:
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


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "tri_resident", "interpret"))
def _traverse_bvh4(node_tab, tri_tab, o, d, t_max, any_hit: bool = False,
                   tri_resident: bool = True, interpret: bool = False):
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
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)

    kernel = _make_kernel(any_hit, tri_resident)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    scratch = [pltpu.SMEM((STACK_DEPTH * N_PACKETS,), jnp.int32)]
    if tri_resident:
        tri_spec = full(tri_tab)
    else:
        tri_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [
            pltpu.SMEM((TRI_SLOTS,), jnp.int32),
            pltpu.VMEM((TRI_SLOTS, 9, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ]
    # v5e has 128 MB VMEM/core; the default scoped limit is 16 MB. Raising it
    # lets multi-MB node tables (and mid-size triangle tables) stay resident.
    params = (None if interpret else
              pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024))
    t, prim, b1, b2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 7 + [full(node_tab), tri_spec],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=params,
        interpret=interpret,
    )(*args, node_tab, tri_tab)

    t = t.reshape(-1)[:R]
    prim = prim.reshape(-1)[:R]
    b1 = b1.reshape(-1)[:R]
    b2 = b2.reshape(-1)[:R]
    miss = prim < 0
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim, b1=b1, b2=b2)


# per-scene packing cache (same discipline as pallas_traverse._pack_cache)
_pack_cache: dict = {}


def _get_packed(dbvh: DeviceBVH, tri_p) -> PackedSceneW4:
    key = (id(dbvh.node_lo), id(tri_p))
    ps = _pack_cache.get(key)
    if ps is None:
        ps = PackedSceneW4(dbvh, tri_p)
        _pack_cache.clear()
        _pack_cache[key] = ps
    return ps


def intersect_closest(dbvh: DeviceBVH, tri_p: Array, o: Array, d: Array,
                      t_max: Array, interpret: bool = False) -> Hit:
    ps = _get_packed(dbvh, tri_p)
    res = ps.tri_resident()
    return _traverse_bvh4(ps.node_tab,
                          ps.tri_tab_2d if res else ps.tri_tab_3d,
                          o, d, t_max, any_hit=False, tri_resident=res,
                          interpret=interpret)


def intersect_any(dbvh: DeviceBVH, tri_p: Array, o: Array, d: Array,
                  t_max: Array, interpret: bool = False) -> Array:
    ps = _get_packed(dbvh, tri_p)
    res = ps.tri_resident()
    h = _traverse_bvh4(ps.node_tab,
                       ps.tri_tab_2d if res else ps.tri_tab_3d,
                       o, d, t_max, any_hit=True, tri_resident=res,
                       interpret=interpret)
    return h.prim >= 0
