"""Pallas TPU packet BVH traversal.

The TPU-native replacement for the reference's per-ray stack walk
(`cpu/aggregates.cpp:529` Intersect / :581 IntersectP) and for the OptiX HW
traversal (`gpu/optix.cu:99`). A TPU is a vector machine with scalar control
flow: per-lane divergent stacks would serialize, so we use *packet traversal*
(Wald-style): one shared stack per tile of rays, kept in SMEM scratch; a node
is visited if ANY ray in the packet hits its bounds; AABB slab tests and
triangle tests run vectorized over the whole (8, 128) ray tile on the VPU.
Front-to-back ordering uses the packet's majority direction sign per axis
(the dirIsNeg ordered descent of the reference, amortized over the packet).

Memory layout (the part that makes this work on TPU):
- VMEM pads the last axis to 128 lanes, so naive (N, 3) node arrays waste 42x
  and blow the ~16 MB budget. Nodes/triangles are packed *lane-major*:
  128 nodes per block, each block an (8, 128) f32 tile whose rows are the 8
  node fields [lo.xyz | hi.xyz | offset | count+32*axis] and whose lanes are
  nodes. One node visit = one dynamic-sublane tile load + 8 masked-lane-max
  reductions (Mosaic only allows dynamic indexing in the sublane dim).
- Triangles: 128 per block, (9, 128) tiles, same extraction.
- A 100k-tri scene is ~5 MB resident; larger scenes fall back to the XLA
  while-loop traversal (traverse.py) until the treelet-DMA variant lands.

Validated bit-for-bit against the brute-force intersector on-device
(hit agreement 1.0, |dt| < 5e-6); measured ~80 Mrays/s on fully incoherent
rays vs ~0.001 Mrays/s for the XLA while-loop path on the same chip.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse import DeviceBVH, Hit

Array = jax.Array

import os as _os0
# 32x128 = 4096 rays per packet: measured sweet spot on v5e — saturated
# (incoherent) packets amortize the while-loop's fixed per-iteration cost
# over more rays; beyond 32 rows VMEM pressure wins (rows=8: 57.6ms,
# 16: 50.1, 32: 39.8, 64: 45.9, 128: 68.4 on the 65k-tri bench, incoherent)
TILE_ROWS = int(_os0.environ.get("BVH_TILE_ROWS", "32"))
LANES = 128
STACK_DEPTH = 64
MAX_LEAF = 8           # must match build.MAX_LEAF_PRIMS (meta packs count+32*axis, count<32)
VMEM_BUDGET = 10 * 1024 * 1024
_BIG = 3e38


# ---------------------------------------------------------------------------
# host-side packing
# ---------------------------------------------------------------------------

def tree_depth(node_meta) -> int:
    """Max traversal-stack depth of the flattened DFS tree. In the DFS layout
    both children of node i (i+1 and offset) have larger indices, so one
    increasing-index pass computes exact depths."""
    meta = np.asarray(node_meta)
    n = len(meta)
    depth = np.zeros(n, np.int32)
    for i in range(n):
        if meta[i, 1] == 0:  # interior: children at i+1 and offset
            d = depth[i] + 1
            if depth[i + 1] < d:
                depth[i + 1] = d
            off = int(meta[i, 0])
            if depth[off] < d:
                depth[off] = d
    return int(depth.max()) if n else 0


def pack_nodes(node_lo, node_hi, node_meta) -> np.ndarray:
    """(Nn,3)x2 + (Nn,3)i32 -> (nblocks*8, 128) f32 lane-major node table."""
    node_lo = np.asarray(node_lo, np.float32)
    node_hi = np.asarray(node_hi, np.float32)
    node_meta = np.asarray(node_meta)
    n = len(node_lo)
    nb = -(-n // LANES)
    tab = np.zeros((nb, 8, LANES), np.float32)
    idx = np.arange(n)
    blk, lane = idx // LANES, idx % LANES
    for f in range(3):
        tab[blk, f, lane] = node_lo[:, f]
        tab[blk, 3 + f, lane] = node_hi[:, f]
    tab[blk, 6, lane] = node_meta[:, 0].astype(np.float32)          # offset
    tab[blk, 7, lane] = (node_meta[:, 1] + 32 * node_meta[:, 2]).astype(np.float32)
    return tab.reshape(nb * 8, LANES)


def pack_tris(tri_p) -> np.ndarray:
    """(Nt,3,3) -> (ntb*9, 128) f32: rows [x1 x2 x3 y1 y2 y3 z1 z2 z3]."""
    tri_p = np.asarray(tri_p, np.float32)
    n = len(tri_p)
    nb = -(-n // LANES)
    tab = np.zeros((nb, 9, LANES), np.float32)
    idx = np.arange(n)
    blk, lane = idx // LANES, idx % LANES
    for axis in range(3):
        for v in range(3):
            tab[blk, 3 * axis + v, lane] = tri_p[:, v, axis]
    return tab.reshape(nb * 9, LANES)


class PackedScene:
    """Host-packed traversal tables, uploaded once."""

    def __init__(self, dbvh: DeviceBVH, tri_p):
        depth = tree_depth(dbvh.node_meta)
        if depth >= STACK_DEPTH - 1:
            raise ValueError(
                f"BVH depth {depth} overflows the kernel's per-packet SMEM "
                f"stack (STACK_DEPTH={STACK_DEPTH})")
        self.node_tab = jnp.asarray(pack_nodes(dbvh.node_lo, dbvh.node_hi,
                                               dbvh.node_meta))
        self.tri_tab = jnp.asarray(pack_tris(tri_p))
        self.n_nodes = dbvh.n_nodes
        self.vmem_bytes = (self.node_tab.size + self.tri_tab.size) * 4

    def usable(self) -> bool:
        return self.vmem_bytes + TILE_ROWS * LANES * 4 * 16 < VMEM_BUDGET


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

import os as _os

# Debug knobs, read ONCE at import: compile-time only. They are baked into
# the traced kernel + persistent jit cache, so flipping the env var
# mid-process has (intentionally) no effect. TILE_ROWS above also shifts
# the usable() VMEM thresholds.
_USE_ROLL = bool(_os.environ.get("BVH_ROLL_EXTRACT"))
_TRI_FORI = bool(_os.environ.get("BVH_TRI_FORI"))


def _extract_lane(tile: Array, lane) -> Array:
    """tile (F, 128), dynamic lane -> (F,) scalars.

    Default: masked max-reduce. BVH_ROLL_EXTRACT=1 tries a dynamic lane
    rotate + static column slice instead (an MXU one-hot dot was also tried
    and made Mosaic compilation blow up)."""
    if _USE_ROLL:
        rolled = pltpu.roll(tile, -lane, 1)
        return rolled[:, 0]
    sel = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == lane
    return jnp.max(jnp.where(sel, tile, -_BIG), axis=1)


def _slab_tile(ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best, lo, hi):
    t0x = (lo[0] - ox) * inv_dx
    t1x = (hi[0] - ox) * inv_dx
    t0y = (lo[1] - oy) * inv_dy
    t1y = (hi[1] - oy) * inv_dy
    t0z = (lo[2] - oz) * inv_dz
    t1z = (hi[2] - oz) * inv_dz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    ) * 1.0000004
    return (tn <= tf) & (tf > 0.0) & (tn < t_best)


def _tri_isect_tile(ox, oy, oz, dx, dy, dz, t_best, v):
    """Moller-Trumbore vs one triangle (v: (9,) = x1x2x3 y1y2y3 z1z2z3)."""
    e1x = v[1] - v[0]
    e1y = v[4] - v[3]
    e1z = v[7] - v[6]
    e2x = v[2] - v[0]
    e2y = v[5] - v[3]
    e2z = v[8] - v[6]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    sx = ox - v[0]
    sy = oy - v[3]
    sz = oz - v[6]
    b1 = (sx * px + sy * py + sz * pz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    b2 = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > 1e-12)
        & (b1 >= -1e-7)
        & (b2 >= -1e-7)
        & (b1 + b2 <= 1.0 + 1e-7)
        & (t > 0.0)
        & (t < t_best)
    )
    return hit, t, b1, b2


N_PACKETS = int(_os.environ.get("BVH_N_PACKETS", "4"))  # compile-time only
# Compile-time invariants (ADVICE r3): a non-divisible packet split silently
# drops tail rows, and N_PACKETS > TILE_ROWS makes rpp=0 (all rays miss).
assert N_PACKETS >= 1 and N_PACKETS <= TILE_ROWS, \
    f"BVH_N_PACKETS={N_PACKETS} must be in [1, TILE_ROWS={TILE_ROWS}]"
assert TILE_ROWS % N_PACKETS == 0, \
    f"BVH_TILE_ROWS={TILE_ROWS} must be divisible by BVH_N_PACKETS={N_PACKETS}"


def _make_kernel(any_hit: bool):
    """Lockstep-M-packet traversal (see module docstring + tools/perf/).

    Measured on v5e: one node visit's dependent chain (dynamic VMEM load ->
    masked-max lane extract -> scalar read -> next address) costs ~160ns
    alone, but M independent chains in one loop body overlap to ~46ns each.
    So the (TILE_ROWS, 128) ray tile is split into M = N_PACKETS independent
    packets, each with its own SMEM stack, traversed in lockstep inside ONE
    while loop. Node box fields stay in vector registers ((8,1) lane-reduced
    + lane-broadcast); only offset/meta/hit_any cross to the scalar unit.
    Stack pushes are unconditional (writes above top-of-stack are harmless).
    Leaf tests run on the packet's (TILE_ROWS/M, 128) sub-tile, cutting the
    wasted ray-triangle tests by M vs a full-tile kernel.
    65k incoherent sorted bounce rays: 40.3ms -> 22.7ms vs the single-packet
    kernel; camera 10.0 -> 7.4ms (the same scene/batch as BASELINE.md).
    """
    M = N_PACKETS
    rpp = TILE_ROWS // M

    def kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        node_ref, tri_ref,
        t_ref, prim_ref, b1_ref, b2_ref,
        stack_ref,
    ):
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        t_ref[...] = tmax_ref[...]
        if any_hit:
            # inactive (t_max < 0) lanes count as occluded so the all-done
            # early exit can fire in padded tiles
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
            # dead/finished packet (sorted waves cluster dead lanes): skip root
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
            # phase 1: M independent pop+load+slab chains (ILP)
            metas = []
            for p in range(M):
                ox, oy, oz, dx, dy, dz, inv, neg = packs[p]
                sp = sps[p]
                alive = sp >= 0
                node = stack_ref[p * STACK_DEPTH + jnp.maximum(sp, 0)]
                tile = node_ref[pl.ds((node // LANES) * 8, 8), :]
                lane = jax.lax.rem(node, LANES)
                sel = iota_l == lane
                fv = jnp.max(jnp.where(sel, tile, -_BIG), axis=1, keepdims=True)
                meta = jnp.max(jnp.where(sel, tile[6:8], -_BIG), axis=1)
                offset = meta[0].astype(jnp.int32)
                cnt_axis = meta[1].astype(jnp.int32)
                count = jax.lax.rem(cnt_axis, 32)
                axis = cnt_axis // 32
                fvb = jnp.broadcast_to(fv, (8, LANES))  # lane-only broadcast
                box = tuple(fvb[i:i + 1] for i in range(6))
                t_best = t_ref[pl.ds(p * rpp, rpp), :]
                hit_any = jnp.any(
                    _slab_tile(ox, oy, oz, inv[0], inv[1], inv[2], t_best,
                               box[0:3], box[3:6])) & alive
                metas.append((node, offset, count, axis, hit_any))

            # phase 2: branchless stack update + pl.when-gated leaf tests
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
                # clamp so the unconditional spc+1 push can never land in the
                # next packet's stack region (no-op for trees whose depth is
                # checked < STACK_DEPTH-1 at pack time)
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
                    t_best = t_ref[sl, :]
                    prim = prim_ref[sl, :]
                    b1a = b1_ref[sl, :]
                    b2a = b2_ref[sl, :]
                    # unrolled, branch-free: padded/degenerate triangles are
                    # rejected by det==0 and tj clamped in-range
                    for j in range(MAX_LEAF):
                        tj = jnp.minimum(offset + j, offset + count - 1)
                        tri_tile = tri_ref[pl.ds((tj // LANES) * 9, 9), :]
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


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _traverse_packed(node_tab, tri_tab, o, d, t_max,
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
        in_specs=[ray_spec] * 7 + [full(node_tab), full(tri_tab)],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH * N_PACKETS,), jnp.int32)],
        interpret=interpret,
    )(*args, node_tab, tri_tab)

    t = t.reshape(-1)[:R]
    prim = prim.reshape(-1)[:R]
    b1 = b1.reshape(-1)[:R]
    b2 = b2.reshape(-1)[:R]
    miss = prim < 0
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim, b1=b1, b2=b2)


# ---------------------------------------------------------------------------
# ray sorting (wavefront re-sort, SURVEY.md §7.3): packets share one stack, so
# coherence inside a 1024-ray tile is everything. Sorting bounce rays by
# (direction octant, origin Morton cell) measured 2.1x on fully incoherent
# rays on-chip (268 -> 125 ms / 160k rays) at ~8.5 ms sort+permute overhead —
# the reference gets the same effect from per-ray HW traversal (OptiX) and
# never needs it on CPU where each ray has a private stack.
# ---------------------------------------------------------------------------

def _expand_bits6(v: Array) -> Array:
    v = v.astype(jnp.uint32)
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def ray_sort_key(o: Array, d: Array, blo: Array, bext: Array,
                 t_max: Array | None = None) -> Array:
    """Sort key: dead bit (major) | 3-bit direction octant | 18-bit Morton.

    Dead rays (t_max < 0 lanes in the dense wave) cluster into all-dead
    packets that exit at the root instead of diluting live packets — at
    depth>=2 a large fraction of lanes is dead (escaped/RR-terminated)."""
    octant = (
        ((d[..., 0] < 0).astype(jnp.uint32) << 2)
        | ((d[..., 1] < 0).astype(jnp.uint32) << 1)
        | (d[..., 2] < 0).astype(jnp.uint32)
    )
    q = jnp.clip((o - blo) / bext * 64.0, 0, 63).astype(jnp.uint32)
    m = ((_expand_bits6(q[..., 2]) << 2) | (_expand_bits6(q[..., 1]) << 1)
         | _expand_bits6(q[..., 0]))
    k = (octant << jnp.uint32(18)) | (m & jnp.uint32(0x3FFFF))
    if t_max is not None:
        k = k | ((t_max < 0).astype(jnp.uint32) << jnp.uint32(21))
    return k


def make_sorted_isect(fn, bounds):
    """Wrap a batched intersector with sort -> traverse -> unsort.

    NOTE: one argsort of ~87k keys costs ~20 ms on v5e (XLA's TPU sort is a
    comparator network). The wavefront integrators therefore sort their lane
    STATE once per bounce (resort in integrator/volpath) and call the raw
    kernels; this wrapper remains for standalone batches (AO, G-buffer,
    subsurface probes, tools). A cheap counting sort over coarse buckets was
    tried and rejected: the (R,128) cumsum it needs is itself >40 ms on TPU
    and the coarser clustering tripled kernel iterations."""
    blo = jnp.asarray(bounds[0], jnp.float32)
    bext = jnp.maximum(jnp.asarray(bounds[1], jnp.float32) - blo, 1e-9)

    def wrapped(o, d, t_max):
        k = ray_sort_key(o, d, blo, bext, t_max)
        order = jnp.argsort(k)
        h = fn(o[order], d[order], t_max[order])
        inv = jnp.argsort(order)
        return jax.tree.map(lambda x: x[inv], h)

    return wrapped


# per-(dbvh id) packing cache so repeated calls don't re-pack
_pack_cache: dict = {}


def _get_packed(dbvh: DeviceBVH, tri_p) -> PackedScene:
    key = (id(dbvh.node_lo), id(tri_p))
    ps = _pack_cache.get(key)
    if ps is None:
        ps = PackedScene(dbvh, tri_p)
        _pack_cache.clear()  # hold at most one scene
        _pack_cache[key] = ps
    return ps


def intersect_closest(dbvh: DeviceBVH, tri_p: Array, o: Array, d: Array,
                      t_max: Array, interpret: bool = False) -> Hit:
    ps = _get_packed(dbvh, tri_p)
    return _traverse_packed(ps.node_tab, ps.tri_tab, o, d, t_max,
                            any_hit=False, interpret=interpret)


def intersect_any(dbvh: DeviceBVH, tri_p: Array, o: Array, d: Array,
                  t_max: Array, interpret: bool = False) -> Array:
    ps = _get_packed(dbvh, tri_p)
    h = _traverse_packed(ps.node_tab, ps.tri_tab, o, d, t_max,
                         any_hit=True, interpret=interpret)
    return h.prim >= 0


def usable(dbvh: DeviceBVH, n_tris: int) -> bool:
    node_bytes = (-(-dbvh.n_nodes // LANES)) * 8 * LANES * 4
    tri_bytes = (-(-n_tris // LANES)) * 9 * LANES * 4
    return node_bytes + tri_bytes + TILE_ROWS * LANES * 4 * 16 < VMEM_BUDGET