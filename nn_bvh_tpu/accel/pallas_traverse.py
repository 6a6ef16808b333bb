"""Pallas TPU packet BVH traversal.

The TPU-native replacement for the reference's per-ray stack walk
(`cpu/aggregates.cpp:529` Intersect / :581 IntersectP) and for the OptiX HW
traversal (`gpu/optix.cu:99`). A TPU is a vector machine with scalar control
flow: per-lane divergent stacks would serialize, so we use *packet traversal*
(Wald-style): one shared stack per tile of rays, kept in SMEM scratch; a node
is visited if ANY ray in the packet hits its bounds; AABB slab tests and
watertight-style triangle tests run vectorized over the whole (8, 128) ray
tile on the VPU. Front-to-back ordering uses the packet's majority direction
sign per axis (the dirIsNeg ordered descent of the reference, amortized over
the packet).

Scene residency: the flat BVH (node_lo/hi/meta) and triangle buffer live
wholly in VMEM — a 100k-triangle scene is ~5 MB, well under the ~16 MB VMEM
budget; larger scenes fall back to the XLA while-loop traversal
(traverse.py) until the two-level treelet-DMA variant lands.

Layout: rays are pre-shaped to (R/128, 128) per component so every vector op
is lane-aligned; the tile is TILE_ROWS x 128 rays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import traverse as xla_traverse
from .traverse import DeviceBVH, Hit

Array = jax.Array

TILE_ROWS = 8          # rays per tile = TILE_ROWS * 128
LANES = 128
STACK_DEPTH = 64
MAX_LEAF = 4           # must match build.MAX_LEAF_PRIMS
VMEM_BUDGET = 12 * 1024 * 1024


def _slab_tile(ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best, lo, hi):
    """Vector slab test of one node against the whole ray tile."""
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
    """Moller-Trumbore against one triangle (v: (9,) scalars), vectorized over
    the tile. Returns (hit, t, b1, b2). The watertight permuted variant is the
    XLA path's job (correctness anchor); here the scalar-free MT form keeps
    the VPU pipeline dense, with conservative epsilons."""
    e1x = v[1] - v[0]
    e1y = v[4] - v[3]
    e1z = v[7] - v[6]
    e2x = v[2] - v[0]
    e2y = v[5] - v[3]
    e2z = v[8] - v[6]
    # p = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    sx = ox - v[0]
    sy = oy - v[3]
    sz = oz - v[6]
    b1 = (sx * px + sy * py + sz * pz) * inv_det
    # q = s x e1
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


def _make_kernel(n_nodes: int, any_hit: bool):
    def kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        node_lo_ref, node_hi_ref, node_meta_ref, tri_ref,
        t_ref, prim_ref, b1_ref, b2_ref,
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
        if any_hit:
            # inactive (t_max < 0) lanes count as already-occluded so the
            # all-lanes-done early exit can fire in padded tiles
            prim_ref[...] = jnp.where(t0 < 0.0, 0, -1).astype(jnp.int32)
        else:
            prim_ref[...] = jnp.full_like(t0, -1.0).astype(jnp.int32)
        b1_ref[...] = jnp.zeros_like(t0)
        b2_ref[...] = jnp.zeros_like(t0)

        # packet-majority direction signs (ordered descent)
        neg_x = (jnp.sum(dx) < 0.0).astype(jnp.int32)
        neg_y = (jnp.sum(dy) < 0.0).astype(jnp.int32)
        neg_z = (jnp.sum(dz) < 0.0).astype(jnp.int32)

        stack_ref[0] = 0  # push root

        def cond(carry):
            sp, done = carry
            return (sp >= 0) & jnp.logical_not(done)

        def body(carry):
            sp, done = carry
            node = stack_ref[sp]
            sp = sp - 1

            lo = node_lo_ref[pl.ds(node, 1), :]   # (1, 3)
            hi = node_hi_ref[pl.ds(node, 1), :]
            meta = node_meta_ref[pl.ds(node, 1), :]
            offset = meta[0, 0]
            count = meta[0, 1]
            axis = meta[0, 2]

            t_best = t_ref[...]
            hit_any = jnp.any(
                _slab_tile(ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
                           (lo[0, 0], lo[0, 1], lo[0, 2]),
                           (hi[0, 0], hi[0, 1], hi[0, 2]))
            )

            is_leaf = count > 0

            # ---- leaf: bounded triangle loop ----------------------------
            @pl.when(hit_any & is_leaf)
            def _():
                def tri_body(j, _):
                    @pl.when(j < count)
                    def _():
                        v = tri_ref[pl.ds(offset + j, 1), :]  # (1, 9)
                        vs = tuple(v[0, k] for k in range(9))
                        tb = t_ref[...]
                        h, t, b1, b2 = _tri_isect_tile(ox, oy, oz, dx, dy, dz, tb, vs)
                        t_ref[...] = jnp.where(h, t, tb)
                        prim_ref[...] = jnp.where(h, offset + j, prim_ref[...])
                        b1_ref[...] = jnp.where(h, b1, b1_ref[...])
                        b2_ref[...] = jnp.where(h, b2, b2_ref[...])
                    return 0

                jax.lax.fori_loop(0, MAX_LEAF, tri_body, 0)

            # ---- interior: push far then near (near on top) --------------
            descend = hit_any & jnp.logical_not(is_leaf)
            neg = jax.lax.select_n(axis, neg_x, neg_y, neg_z)
            near = jnp.where(neg == 1, offset, node + 1)
            far = jnp.where(neg == 1, node + 1, offset)

            # write far at sp+1, near at sp+2 (branchless: write guarded)
            @pl.when(descend)
            def _():
                stack_ref[sp + 1] = far
                stack_ref[sp + 2] = near

            sp = jnp.where(descend, sp + 2, sp)

            if any_hit:
                done = jnp.all(prim_ref[...] >= 0)
            return (sp, done)

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.asarray(False)))

    return kernel


def _fits_vmem(dbvh: DeviceBVH, n_tris: int) -> bool:
    node_bytes = dbvh.node_lo.size * 4 + dbvh.node_hi.size * 4 + dbvh.node_meta.size * 4
    tri_bytes = n_tris * 9 * 4
    ray_bytes = TILE_ROWS * LANES * 4 * 11
    return node_bytes + tri_bytes + ray_bytes < VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("any_hit", "interpret"))
def _traverse_pallas(node_lo, node_hi, node_meta, tri_flat, o, d, t_max,
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

    n_nodes = node_lo.shape[0]
    grid = (rows // TILE_ROWS,)
    ray_spec = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)

    kernel = _make_kernel(n_nodes, any_hit)
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    t, prim, b1, b2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec] * 7 + [full(node_lo), full(node_hi), full(node_meta),
                                   full(tri_flat)],
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(*args, node_lo, node_hi, node_meta, tri_flat)

    t = t.reshape(-1)[:R]
    prim = prim.reshape(-1)[:R]
    b1 = b1.reshape(-1)[:R]
    b2 = b2.reshape(-1)[:R]
    miss = prim < 0
    return Hit(t=jnp.where(miss, jnp.inf, t), prim=prim, b1=b1, b2=b2)


def intersect_closest(dbvh: DeviceBVH, tri_p: Array, o: Array, d: Array,
                      t_max: Array, interpret: bool = False) -> Hit:
    """Packet-traversal closest hit. tri_p: (N, 3, 3) post-reorder triangles."""
    tri_flat = tri_p.reshape(tri_p.shape[0], 9)[:, [0, 3, 6, 1, 4, 7, 2, 5, 8]]
    # layout: [x1 x2 x3 | y1 y2 y3 | z1 z2 z3] to match _tri_isect_tile
    return _traverse_pallas(dbvh.node_lo, dbvh.node_hi, dbvh.node_meta, tri_flat,
                            o, d, t_max, any_hit=False, interpret=interpret)


def intersect_any(dbvh: DeviceBVH, tri_p: Array, o: Array, d: Array,
                  t_max: Array, interpret: bool = False) -> Array:
    tri_flat = tri_p.reshape(tri_p.shape[0], 9)[:, [0, 3, 6, 1, 4, 7, 2, 5, 8]]
    h = _traverse_pallas(dbvh.node_lo, dbvh.node_hi, dbvh.node_meta, tri_flat,
                         o, d, t_max, any_hit=True, interpret=interpret)
    return h.prim >= 0


def usable(dbvh: DeviceBVH, n_tris: int) -> bool:
    """Whether the VMEM-resident kernel applies to this scene."""
    return _fits_vmem(dbvh, n_tris)
