"""Differentiable node splitting with custom gradients for discrete events.

Rebuild of `nss_tree_modules.py` (cgaueb/nss + fork EPO edits):
- gen_nodes (nss_tree_modules.py:37): theta in [0,1] -> axis plane offset and
  the two child AABBs (box split at the plane).
- gen_nodes_epo (fork, :104): child bounds from *primitive midpoint
  classification*, with finite-difference step gradients to the next discrete
  event: left_child_bounds (:147), right_child_bounds (:194).
- qL_fn (:330): differentiable point-count-left-of-plane.
- qL_fn_sah (fork, :639): differentiable primitive-midpoint-count.
- soft_min (:374-413): hard min forward, softmax(-t x) backward.
- wL_fn_epo (fork, :1017): differentiable overlapped-surface-area (the EPO
  term of Aila et al.), gradient = surface of the next primitive to stop
  intersecting / distance to that event.

All functions are batched over arbitrary leading axes (B and the per-level
node axis K) — the reference's per-node Python loops become one fused call.
Masked reductions use +-BIG fills instead of the beta-offset trick.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import common
from .common import BIG

Array = jax.Array

_GRAD_CLIP = 1.0 / 1e-4  # reference clip_by_value(slope, 0, 1/0.0001)


# ---------------------------------------------------------------------------
# simple box splitter (SAH/point variant; nss_tree_modules.gen_nodes)
# ---------------------------------------------------------------------------

def gen_nodes(bounds: Array, thetas: Array):
    """bounds (..., 6), thetas (..., 3) -> (offsets (..., 3),
    child_bounds (..., 6 children, 6)) ordered [xL xR yL yR zL zR]."""
    bmin = bounds[..., 0:3]
    bmax = bounds[..., 3:6]
    offsets = bmin + thetas * (bmax - bmin)  # (..., 3) per-axis plane

    children = []
    for a in range(3):
        off = offsets[..., a : a + 1]
        l_max = bmax.at[..., a].set(jnp.clip(off[..., 0], bmin[..., a], bmax[..., a]))
        r_min = bmin.at[..., a].set(jnp.clip(off[..., 0], bmin[..., a], bmax[..., a]))
        children.append(jnp.concatenate([bmin, l_max], axis=-1))
        children.append(jnp.concatenate([r_min, bmax], axis=-1))
    return offsets, jnp.stack(children, axis=-2)


# ---------------------------------------------------------------------------
# qL_fn: differentiable count of points left of the plane
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=())
def ql_points(axis_points: Array, parent_mask: Array, parent_min: Array,
              parent_max: Array, offset: Array) -> Array:
    """N_left = sum(mask * [x <= offset]) with step-function gradient wrt
    offset (nss_tree_modules.qL_fn). axis_points (..., N); offset (...,)."""
    inside = parent_mask * (axis_points <= offset[..., None]).astype(jnp.float32)
    return jnp.sum(inside, axis=-1)


def _ql_points_fwd(axis_points, parent_mask, parent_min, parent_max, offset):
    n = ql_points(axis_points, parent_mask, parent_min, parent_max, offset)
    return n, (axis_points, parent_mask, parent_min, parent_max, offset, n)


def _ql_points_bwd(res, upstream):
    axis_points, parent_mask, parent_min, parent_max, offset, n = res
    # next discrete event: smallest masked point strictly right of offset
    right = parent_mask * (axis_points > offset[..., None]).astype(jnp.float32)
    offset_above = common.masked_min(axis_points, right, axis=-1)
    n1 = jnp.sum(
        parent_mask * (axis_points <= offset_above[..., None]).astype(jnp.float32),
        axis=-1,
    )
    has_event = offset_above < BIG
    slope = jnp.where(
        has_event, (n1 - n) / jnp.maximum(offset_above - offset, 1e-12), 0.0
    )
    slope = jnp.clip(slope, 0.0, _GRAD_CLIP)
    g = upstream * slope
    g = g * (offset >= parent_min).astype(jnp.float32)
    g = g * (offset <= parent_max).astype(jnp.float32)
    return (None, None, None, None, g)


ql_points.defvjp(_ql_points_fwd, _ql_points_bwd)


# ---------------------------------------------------------------------------
# qL_fn_SAH: differentiable count of primitive midpoints left of the plane
# ---------------------------------------------------------------------------

@jax.custom_vjp
def ql_prims(mids: Array, parent_mask: Array, parent_min: Array,
             parent_max: Array, offset: Array) -> Array:
    """N_left by midpoint classification (fork qL_fn_SAH,
    nss_tree_modules.py:639). mids (..., N); offset (...,)."""
    left = parent_mask * (mids <= offset[..., None]).astype(jnp.float32)
    return jnp.sum(left, axis=-1)


def _ql_prims_fwd(mids, parent_mask, parent_min, parent_max, offset):
    n = ql_prims(mids, parent_mask, parent_min, parent_max, offset)
    return n, (mids, parent_mask, parent_min, parent_max, offset, n)


def _ql_prims_bwd(res, upstream):
    mids, parent_mask, parent_min, parent_max, offset, n = res
    right = parent_mask * (mids > offset[..., None]).astype(jnp.float32)
    offset_above = common.masked_min(mids, right, axis=-1)
    inc = jnp.sum(
        right * (mids == offset_above[..., None]).astype(jnp.float32), axis=-1
    )
    inc = jnp.maximum(inc, 1.0)
    has_event = offset_above < BIG
    slope = jnp.where(has_event, inc / jnp.maximum(offset_above - offset, 1e-12), 0.0)
    slope = jnp.clip(slope, 0.0, _GRAD_CLIP)
    g = upstream * slope
    g = g * (offset >= parent_min).astype(jnp.float32)
    g = g * (offset <= parent_max).astype(jnp.float32)
    return (None, None, None, None, g)


ql_prims.defvjp(_ql_prims_fwd, _ql_prims_bwd)


# ---------------------------------------------------------------------------
# EPO child bounds: offset -> tight child plane bound with event gradients
# ---------------------------------------------------------------------------

@jax.custom_vjp
def left_child_bound(axis_points: Array, parent_mask: Array, parent_min: Array,
                     parent_max: Array, offset: Array) -> Array:
    """Max bound of the left child = max over prim-maxes of prims whose mid is
    left of offset (fork left_child_bounds, nss_tree_modules.py:147).
    axis_points (..., N, 3 verts); offset (...,) -> bound (...,)."""
    mins = jnp.min(axis_points, axis=-1)
    maxs = jnp.max(axis_points, axis=-1)
    mids = 0.5 * (mins + maxs)
    left = parent_mask * (offset[..., None] >= mids).astype(jnp.float32)
    bound = common.masked_max(maxs, left, axis=-1)
    return jnp.maximum(bound, parent_min)


def _lcb_fwd(axis_points, parent_mask, parent_min, parent_max, offset):
    b = left_child_bound(axis_points, parent_mask, parent_min, parent_max, offset)
    return b, (axis_points, parent_mask, parent_min, parent_max, offset, b)


def _lcb_bwd(res, upstream):
    axis_points, parent_mask, parent_min, parent_max, offset, bound = res
    mins = jnp.min(axis_points, axis=-1)
    maxs = jnp.max(axis_points, axis=-1)
    mids = 0.5 * (mins + maxs)
    # next event: the prim with the smallest mid strictly right of the current
    # left-child plane; moving offset there pulls its max into the left child
    right = parent_mask * (bound[..., None] < mids).astype(jnp.float32)
    offset_above = common.masked_min(mids, right, axis=-1)
    at_event = right * (mids == offset_above[..., None]).astype(jnp.float32)
    bound_above = common.masked_max(maxs, at_event, axis=-1)
    has_event = offset_above < BIG
    slope = jnp.where(
        has_event,
        (bound_above - bound) / jnp.where(jnp.abs(offset_above - offset) < 1e-12,
                                          1e-12, offset_above - offset),
        0.0,
    )
    slope = jnp.clip(slope, 0.0, _GRAD_CLIP)
    g = upstream * slope
    g = g * (offset >= parent_min).astype(jnp.float32)
    g = g * (offset <= parent_max).astype(jnp.float32)
    return (None, None, None, None, g)


left_child_bound.defvjp(_lcb_fwd, _lcb_bwd)


@jax.custom_vjp
def right_child_bound(axis_points: Array, parent_mask: Array, parent_min: Array,
                      parent_max: Array, offset: Array) -> Array:
    """Min bound of the right child = min over prim-mins of prims whose mid is
    right of offset (fork right_child_bounds, nss_tree_modules.py:194)."""
    mins = jnp.min(axis_points, axis=-1)
    maxs = jnp.max(axis_points, axis=-1)
    mids = 0.5 * (mins + maxs)
    right = parent_mask * (offset[..., None] < mids).astype(jnp.float32)
    bound = common.masked_min(mins, right, axis=-1)
    return jnp.minimum(bound, parent_max)


def _rcb_fwd(axis_points, parent_mask, parent_min, parent_max, offset):
    b = right_child_bound(axis_points, parent_mask, parent_min, parent_max, offset)
    return b, (axis_points, parent_mask, parent_min, parent_max, offset, b)


def _rcb_bwd(res, upstream):
    axis_points, parent_mask, parent_min, parent_max, offset, bound = res
    mins = jnp.min(axis_points, axis=-1)
    maxs = jnp.max(axis_points, axis=-1)
    mids = 0.5 * (mins + maxs)
    # previous event: the prim with the largest mid left of the current right
    # bound; moving offset below it pushes the right-child min further left
    left = parent_mask * (bound[..., None] >= mids).astype(jnp.float32)
    offset_below = common.masked_max(mids, left, axis=-1)
    at_event = left * (mids == offset_below[..., None]).astype(jnp.float32)
    bound_below = common.masked_min(mins, at_event, axis=-1)
    has_event = offset_below > -BIG
    # negative: larger offset -> larger right min bound (see reference comment)
    slope = jnp.where(
        has_event,
        -(bound - bound_below) / jnp.where(jnp.abs(offset - offset_below) < 1e-12,
                                           1e-12, offset - offset_below),
        0.0,
    )
    slope = jnp.clip(slope, 0.0, _GRAD_CLIP)
    g = upstream * slope
    g = g * (offset >= parent_min).astype(jnp.float32)
    g = g * (offset <= parent_max).astype(jnp.float32)
    return (None, None, None, None, g)


right_child_bound.defvjp(_rcb_fwd, _rcb_bwd)


# ---------------------------------------------------------------------------
# soft_min: hard min forward, softmax(-t x) gradient (soft_min3/4)
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(1,))
def soft_min(vals: Array, t: float = 1.0) -> Array:
    """vals (..., M) -> (...,) min with temperature-t softmax backward."""
    return jnp.min(vals, axis=-1)


def _soft_min_fwd(vals, t):
    return jnp.min(vals, axis=-1), vals


def _soft_min_bwd(t, vals, upstream):
    x = -t * vals
    x = x - jnp.max(x, axis=-1, keepdims=True)
    w = jax.nn.softmax(x, axis=-1)
    return (upstream[..., None] * w,)


soft_min.defvjp(_soft_min_fwd, _soft_min_bwd)


# ---------------------------------------------------------------------------
# EPO splitter: theta -> plane + children with refit bounds
# ---------------------------------------------------------------------------

def gen_nodes_epo(prims: Array, bounds: Array, thetas: Array, node_mask: Array):
    """Fork gen_nodes_EPO vectorized over all 3 axes.

    prims (..., N, 9); bounds (..., 6); thetas (..., 3); node_mask (..., N).
    Returns (offsets (..., 3), off_left (..., 3), off_right (..., 3),
    child_bounds (..., 6, 6) ordered [xL xR yL yR zL zR]).
    """
    bmin = bounds[..., 0:3]
    bmax = bounds[..., 3:6]
    offsets = bmin + thetas * (bmax - bmin)

    children = []
    off_l = []
    off_r = []
    for a in range(3):
        ap = common.prim_axis_points(prims, a)  # (..., N, 3)
        b0 = bmin[..., a]
        b1 = bmax[..., a]
        off = offsets[..., a]
        ol = left_child_bound(ap, node_mask, b0, b1, off)
        orr = right_child_bound(ap, node_mask, b0, b1, off)
        l_max = jnp.clip(ol, b0, b1)
        r_min = jnp.clip(orr, b0, b1)
        left_b = jnp.concatenate([bmin, bmax.at[..., a].set(l_max)], axis=-1)
        right_b = jnp.concatenate([bmin.at[..., a].set(r_min), bmax], axis=-1)
        children.append(left_b)
        children.append(right_b)
        off_l.append(ol)
        off_r.append(orr)
    return (
        offsets,
        jnp.stack(off_l, axis=-1),
        jnp.stack(off_r, axis=-1),
        jnp.stack(children, axis=-2),
    )


# ---------------------------------------------------------------------------
# wL_fn_EPO: differentiable overlapped surface area
# ---------------------------------------------------------------------------

def _epo_masks(prims, node_bounds, node_mask, parent_mask):
    """Prims intersecting the node (>=1 vertex inside) but not belonging to it
    (get_prims_intersecting_node_mask, nss_tree_modules.py:946)."""
    v = common.prim_vertices(prims)  # (..., N, 3 verts, 3 xyz)
    bmin = node_bounds[..., None, None, 0:3]
    bmax = node_bounds[..., None, None, 3:6]
    pt_in = jnp.all((v >= bmin) & (v <= bmax), axis=-1)  # (..., N, 3)
    any_in = jnp.any(pt_in, axis=-1).astype(jnp.float32)  # (..., N)
    not_in_node = 1.0 - node_mask
    isect_not_member = any_in * not_in_node
    sibling = parent_mask * not_in_node
    in_sibling = isect_not_member * sibling
    outside_sibling = isect_not_member - in_sibling
    return isect_not_member, in_sibling, outside_sibling, pt_in


@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def w_epo(prims: Array, node_bounds: Array, node_mask: Array, parent_mask: Array,
          node_min: Array, node_max: Array, axis: int, is_left: bool) -> Array:
    """EPO weight of a node: 0.5 * SA(prims intersecting the node from
    outside) / SA(all prims) (fork wL_fn_EPO, nss_tree_modules.py:1017).

    Gradient wrt node_min (right child) / node_max (left child): surface of
    the next primitive to stop intersecting divided by the distance to that
    event, clipped to [0, 1e4].
    """
    isect, _, _, _ = _epo_masks(prims, node_bounds, node_mask, parent_mask)
    areas = common.prim_areas(prims)
    sa_isect = jnp.sum(areas * isect, axis=-1)
    sa_total = jnp.maximum(jnp.sum(areas, axis=-1), 1e-12)
    return 0.5 * sa_isect / sa_total


def _w_epo_fwd(prims, node_bounds, node_mask, parent_mask, node_min, node_max,
               axis, is_left):
    out = w_epo(prims, node_bounds, node_mask, parent_mask, node_min, node_max,
                axis, is_left)
    return out, (prims, node_bounds, node_mask, parent_mask, node_min, node_max)


def _w_epo_bwd(axis, is_left, res, upstream):
    prims, node_bounds, node_mask, parent_mask, node_min, node_max = res
    isect, in_sibling, outside_sibling, pt_in = _epo_masks(
        prims, node_bounds, node_mask, parent_mask
    )
    ap = common.prim_axis_points(prims, axis)  # (..., N, 3)
    areas = common.prim_areas(prims)

    if is_left:
        # which intersecting prim's min is the next to leave when node_max shrinks
        mins_inside = jnp.min(jnp.where(pt_in, ap, BIG), axis=-1)
        prim_ref = jnp.where(
            in_sibling > 0,
            jnp.min(ap, axis=-1),
            jnp.where(outside_sibling > 0, mins_inside, -BIG),
        )
        event_coord = common.masked_max(prim_ref, isect, axis=-1)
        at_event = isect * (prim_ref == event_coord[..., None]).astype(jnp.float32)
        numer = jnp.sum(areas * at_event, axis=-1) * 0.5
        denom = node_max - event_coord
    else:
        maxs_inside = jnp.max(jnp.where(pt_in, ap, -BIG), axis=-1)
        prim_ref = jnp.where(
            in_sibling > 0,
            jnp.max(ap, axis=-1),
            jnp.where(outside_sibling > 0, maxs_inside, BIG),
        )
        event_coord = common.masked_min(prim_ref, isect, axis=-1)
        at_event = isect * (prim_ref == event_coord[..., None]).astype(jnp.float32)
        numer = -jnp.sum(areas * at_event, axis=-1) * 0.5
        denom = event_coord - node_min

    sa_total = jnp.maximum(jnp.sum(areas, axis=-1), 1e-12)
    slope = jnp.where(
        jnp.abs(denom) > 1e-12, numer / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom), 0.0
    ) / sa_total
    slope = jnp.clip(slope, 0.0, _GRAD_CLIP)
    g = upstream * slope
    g_min = jnp.zeros_like(g) if is_left else g
    g_max = g if is_left else jnp.zeros_like(g)
    return (None, None, None, None, g_min, g_max)


w_epo.defvjp(_w_epo_fwd, _w_epo_bwd)
