"""Vectorized watertight ray-triangle intersection.

Counterpart of the reference's `Triangle::Intersect` / `IntersectTriangle`
(`src/pbrt/shapes.h:833`, shapes.cpp): the Woop/Benthin/Wald watertight
transform (translate to ray origin, permute so |d| is largest in z, shear,
2D edge functions). All steps are elementwise over a ray x triangle batch —
pure VPU code, no branches; the double-precision fallback for exactly-zero
edge functions is dropped (f32 conservative epsilons instead).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vecmath as vm

Array = jax.Array


class TriHit(NamedTuple):
    hit: Array      # bool
    t: Array        # f32 distance
    b0: Array       # barycentric weights (b0*p0 + b1*p1 + b2*p2)
    b1: Array
    b2: Array


def intersect(o: Array, d: Array, t_max: Array, p0: Array, p1: Array, p2: Array) -> TriHit:
    """Batched watertight intersection.

    o, d: (..., 3) ray origin/direction; t_max: (...,);
    p0/p1/p2: (..., 3) triangle vertices (broadcastable against rays).
    """
    # translate vertices to ray-origin space
    p0t = p0 - o
    p1t = p1 - o
    p2t = p2 - o

    # permute so the dominant direction axis is z
    kz = vm.max_dimension(jnp.abs(d))
    kx = jnp.where(kz == 2, 0, kz + 1)
    ky = jnp.where(kx == 2, 0, kx + 1)
    perm = jnp.stack([kx, ky, kz], axis=-1)
    dp = vm.permute(d, perm)
    p0t = vm.permute(p0t, perm)
    p1t = vm.permute(p1t, perm)
    p2t = vm.permute(p2t, perm)

    # shear so the ray is +z
    inv_dz = 1.0 / dp[..., 2]
    sx = -dp[..., 0] * inv_dz
    sy = -dp[..., 1] * inv_dz
    sz = inv_dz

    def shear_xy(p):
        return jnp.stack(
            [p[..., 0] + sx * p[..., 2], p[..., 1] + sy * p[..., 2], p[..., 2]],
            axis=-1,
        )

    p0t = shear_xy(p0t)
    p1t = shear_xy(p1t)
    p2t = shear_xy(p2t)

    # 2D edge functions. The reference recomputes exactly-zero edge functions
    # in double precision (shapes.h IntersectTriangle "fall back to double
    # precision"); in XLA the a*b - c*d form is FMA-contracted, which breaks
    # the exact antisymmetry between the two triangles sharing an edge — an
    # exact edge hit then gets opposite *tiny* signs on both and leaks through
    # the seam. A few-ulp relative tolerance restores watertightness (both
    # triangles accept; closest-hit picks one).
    def edge(a, b):
        e = a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
        tol = 4e-7 * (jnp.abs(a[..., 0] * b[..., 1]) + jnp.abs(a[..., 1] * b[..., 0]))
        return e, tol

    e0, tol0 = edge(p1t, p2t)
    e1, tol1 = edge(p2t, p0t)
    e2, tol2 = edge(p0t, p1t)

    same_side = (
        ((e0 >= -tol0) & (e1 >= -tol1) & (e2 >= -tol2))
        | ((e0 <= tol0) & (e1 <= tol1) & (e2 <= tol2))
    )
    det = e0 + e1 + e2
    nonzero = det != 0

    # scaled hit distance
    t_scaled = e0 * p0t[..., 2] * sz + e1 * p1t[..., 2] * sz + e2 * p2t[..., 2] * sz
    # sign-consistent range test (det may be negative)
    pos = (det > 0) & (t_scaled > 0) & (t_scaled < t_max * det)
    neg = (det < 0) & (t_scaled < 0) & (t_scaled > t_max * det)

    hit = same_side & nonzero & (pos | neg)
    inv_det = jnp.where(nonzero, 1.0 / jnp.where(nonzero, det, 1.0), 0.0)
    t = t_scaled * inv_det
    b0 = e0 * inv_det
    b1 = e1 * inv_det
    b2 = e2 * inv_det
    # guard NaNs from degenerate triangles
    hit = hit & jnp.isfinite(t)
    return TriHit(hit, jnp.where(hit, t, jnp.inf), b0, b1, b2)


def geometric_normal(p0: Array, p1: Array, p2: Array) -> Array:
    return vm.normalize(vm.cross(p1 - p0, p2 - p0))


def area(p0: Array, p1: Array, p2: Array) -> Array:
    return 0.5 * vm.length(vm.cross(p1 - p0, p2 - p0))


def solid_angle(p0: Array, p1: Array, p2: Array, p: Array) -> Array:
    """Subtended solid angle from p (reference Triangle::SolidAngle,
    shapes.h:873)."""
    return vm.spherical_triangle_area(
        vm.normalize(p0 - p), vm.normalize(p1 - p), vm.normalize(p2 - p)
    )
