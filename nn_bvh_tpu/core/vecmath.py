"""Vector math over trailing-axis-3 jnp arrays.

TPU-native counterpart of the reference's CRTP vector/point/normal classes
(`src/pbrt/util/vecmath.h`). Instead of distinct Point/Vector/Normal types we use
plain ``(..., 3)`` float32 arrays and keep the *semantics* (normal flipping,
frame transforms, robust spawn offsets) in free functions, so everything is
vmappable and lays out as SoA on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


# ---------------------------------------------------------------------------
# basic ops
# ---------------------------------------------------------------------------

def safe_sqrt(x: Array) -> Array:
    """sqrt with a finite gradient at 0 (grad of sqrt(max(x,0)) is inf AT 0,
    and masked-out lanes hit exactly that — the jnp.where NaN-grad trap)."""
    return jnp.sqrt(jnp.maximum(x, 1e-12))


def safe_acos(x: Array) -> Array:
    """arccos clamped inside (-1, 1): grad of arccos at +-1 is infinite and
    degenerate (masked) lanes land exactly on +-1."""
    return jnp.arccos(jnp.clip(x, -1.0 + 1e-7, 1.0 - 1e-7))


def dot(a: Array, b: Array) -> Array:
    """Elementwise dot over trailing axis; keeps batch shape."""
    return jnp.sum(a * b, axis=-1)


def absdot(a: Array, b: Array) -> Array:
    return jnp.abs(dot(a, b))


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def length_squared(v: Array) -> Array:
    return dot(v, v)


def length(v: Array) -> Array:
    return jnp.sqrt(length_squared(v))


def normalize(v: Array) -> Array:
    """Safe normalize: zero vectors stay zero — in VALUE and in GRADIENT.

    Double-where: rsqrt'(x) = -x^{-3/2}/2 overflows f32 below x ~ 2e-26, and
    the chain rule multiplies that inf by the (zero) cotangent of the masked
    branch — 0*inf = NaN (the r4 crown-gradient TPU NaN). The masked lanes
    must therefore never SEE the tiny operand."""
    len2 = length_squared(v)
    ok = len2 > 1e-20
    inv = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, len2, 1.0)), 0.0)
    return v * inv[..., None]


def distance(a: Array, b: Array) -> Array:
    return length(a - b)


def lerp(t: Array, a: Array, b: Array) -> Array:
    return (1.0 - t) * a + t * b


def face_forward(n: Array, v: Array) -> Array:
    """Flip n so it lies in the hemisphere of v (vecmath.h FaceForward)."""
    return jnp.where(dot(n, v)[..., None] < 0, -n, n)


def max_component(v: Array) -> Array:
    return jnp.max(v, axis=-1)


def min_component(v: Array) -> Array:
    return jnp.min(v, axis=-1)


def max_dimension(v: Array) -> Array:
    """Index of the largest component (used by watertight triangle isect)."""
    return jnp.argmax(v, axis=-1)


def permute(v: Array, idx: Array) -> Array:
    """Permute trailing-axis components by integer index vector idx (...,3)."""
    return jnp.take_along_axis(v, idx, axis=-1)


# ---------------------------------------------------------------------------
# coordinate frames
# ---------------------------------------------------------------------------

def coordinate_system(n: Array) -> tuple[Array, Array]:
    """Build an orthonormal basis around unit vector n.

    Branchless Duff et al. construction (reference: vecmath.h CoordinateSystem).
    Returns (t, b) with [t, b, n] right-handed.
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t1 = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    t2 = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t1, t2


def to_local(n: Array, v: Array) -> Array:
    """World→shading-frame transform with +z = n (reference Frame::ToLocal)."""
    t, b = coordinate_system(n)
    return jnp.stack([dot(v, t), dot(v, b), dot(v, n)], axis=-1)


def from_local(n: Array, v: Array) -> Array:
    """Shading-frame→world with +z = n (reference Frame::FromLocal)."""
    t, b = coordinate_system(n)
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


# ---------------------------------------------------------------------------
# spherical geometry
# ---------------------------------------------------------------------------

def spherical_direction(sin_theta: Array, cos_theta: Array, phi: Array) -> Array:
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def spherical_theta(v: Array) -> Array:
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v: Array) -> Array:
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0, p + 2.0 * jnp.pi, p)


def spherical_triangle_area(a: Array, b: Array, c: Array) -> Array:
    """Solid angle of spherical triangle abc (vecmath.h SphericalTriangleArea).

    Double-where on the atan2 operands: its VJP divides by (x^2 + y^2),
    which is 0 when the reference point lies on a triangle edge's line (an
    edge-on/borderline hit: b == -a makes both operands vanish) — the
    masked lane's zero cotangent times that inf is the NaN that killed the
    crown 64x64 pixel gradients (r4). Degenerate lanes return area 0, and
    the pdf consumers already gate on omega > eps."""
    num = dot(a, cross(b, c))
    den = 1.0 + dot(a, b) + dot(a, c) + dot(b, c)
    bad = (jnp.abs(num) < 1e-20) & (jnp.abs(den) < 1e-12)
    return jnp.abs(
        2.0 * jnp.arctan2(jnp.where(bad, 0.0, num), jnp.where(bad, 1.0, den))
    )


def cos_theta(w: Array) -> Array:
    return w[..., 2]


def abs_cos_theta(w: Array) -> Array:
    return jnp.abs(w[..., 2])


def cos2_theta(w: Array) -> Array:
    return w[..., 2] * w[..., 2]


def sin2_theta(w: Array) -> Array:
    return jnp.maximum(0.0, 1.0 - cos2_theta(w))


def sin_theta(w: Array) -> Array:
    return jnp.sqrt(sin2_theta(w))


def tan2_theta(w: Array) -> Array:
    return sin2_theta(w) / jnp.maximum(cos2_theta(w), 1e-20)


def cos_phi(w: Array) -> Array:
    s = sin_theta(w)
    return jnp.where(s == 0, 1.0, jnp.clip(w[..., 0] / jnp.maximum(s, 1e-20), -1, 1))


def sin_phi(w: Array) -> Array:
    s = sin_theta(w)
    return jnp.where(s == 0, 0.0, jnp.clip(w[..., 1] / jnp.maximum(s, 1e-20), -1, 1))


def same_hemisphere(w: Array, wp: Array) -> Array:
    return w[..., 2] * wp[..., 2] > 0


def reflect(wo: Array, n: Array) -> Array:
    return -wo + 2.0 * dot(wo, n)[..., None] * n


def refract(wi: Array, n: Array, eta: Array):
    """Snell refraction. Returns (valid_mask, eta_used, wt).

    Follows bxdfs/optics Refract semantics: flips n/eta when wi is on the
    backside so callers can pass the geometric eta directly.
    """
    ct_i = dot(n, wi)
    # flip orientation if backside
    flip = ct_i < 0
    eta = jnp.where(flip, 1.0 / eta, eta)
    ct_i = jnp.where(flip, -ct_i, ct_i)
    n = jnp.where(flip[..., None], -n, n)
    s2_i = jnp.maximum(0.0, 1.0 - ct_i * ct_i)
    s2_t = s2_i / (eta * eta)
    tir = s2_t >= 1.0
    ct_t = safe_sqrt(1.0 - s2_t)
    wt = -wi / eta[..., None] + (ct_i / eta - ct_t)[..., None] * n
    return ~tir, eta, wt


# ---------------------------------------------------------------------------
# bounds: (..., 2, 3) arrays, [0]=min, [1]=max
# ---------------------------------------------------------------------------

def bounds_empty(batch_shape=()) -> Array:
    lo = jnp.full(batch_shape + (3,), jnp.inf, jnp.float32)
    hi = jnp.full(batch_shape + (3,), -jnp.inf, jnp.float32)
    return jnp.stack([lo, hi], axis=-2)


def bounds_union(a: Array, b: Array) -> Array:
    return jnp.stack(
        [jnp.minimum(a[..., 0, :], b[..., 0, :]), jnp.maximum(a[..., 1, :], b[..., 1, :])],
        axis=-2,
    )


def bounds_union_point(b: Array, p: Array) -> Array:
    return jnp.stack(
        [jnp.minimum(b[..., 0, :], p), jnp.maximum(b[..., 1, :], p)], axis=-2
    )


def bounds_diagonal(b: Array) -> Array:
    return b[..., 1, :] - b[..., 0, :]


def bounds_surface_area(b: Array) -> Array:
    d = jnp.maximum(bounds_diagonal(b), 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0])


def bounds_centroid(b: Array) -> Array:
    return 0.5 * (b[..., 0, :] + b[..., 1, :])


def bounds_contains(b: Array, p: Array) -> Array:
    return jnp.all((p >= b[..., 0, :]) & (p <= b[..., 1, :]), axis=-1)


def ray_bounds_hit(o: Array, inv_d: Array, t_max: Array, blo: Array, bhi: Array):
    """Slab test. Returns (hit_mask, t_entry). Robust to inf*0 via min/max of NaN-free terms.

    Mirrors the conservative slab test used by the reference's BVH traversal
    (`cpu/aggregates.cpp:529` IntersectP with dirIsNeg ordering); here we use the
    branchless min/max form which is VPU-friendly.
    """
    t0 = (blo - o) * inv_d
    t1 = (bhi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    # conservative epsilon like pbrt's 1+2*gamma(3) scaling of tFar
    t_near = jnp.max(tn, axis=-1)
    t_far = jnp.min(tf, axis=-1) * 1.0000004
    hit = (t_near <= t_far) & (t_far > 0) & (t_near < t_max)
    return hit, jnp.maximum(t_near, 0.0)


# ---------------------------------------------------------------------------
# robust spawn offsets (reference: interaction.h OffsetRayOrigin / ray.h)
# ---------------------------------------------------------------------------

def offset_ray_origin(p: Array, n: Array, w: Array, scale: float = 1e-4) -> Array:
    """Offset p along n to avoid self-intersection.

    The reference computes a tight float error bound (`Interaction::OffsetRayOrigin`,
    interaction.h); we use a scale-relative epsilon which is robust in f32 for
    scene scales after normalization.
    """
    mag = jnp.maximum(1.0, jnp.max(jnp.abs(p), axis=-1))
    d = (scale * mag)[..., None]
    off = jnp.where(dot(w, n)[..., None] < 0, -d, d)
    return p + off * n


def equal_area_sphere_to_square(d: Array) -> Array:
    """Equal-area octahedral mapping, sphere dir -> [0,1]^2 (vecmath.h
    EqualAreaSphereToSquare). Used by ImageInfiniteLight env maps."""
    x, y, z = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    r = jnp.sqrt(jnp.clip(1.0 - z, 0.0, 1.0))
    a = jnp.maximum(x, y)
    b = jnp.minimum(x, y)
    b = jnp.where(a == 0, 0.0, b / jnp.maximum(a, 1e-20))
    # atan approximation domain [0,1]
    phi = jnp.arctan(b) * (2.0 / jnp.pi)
    phi = jnp.where(x < y, 1.0 - phi, phi)
    v = phi * r
    u = r - v
    # southern hemisphere
    u, v = (
        jnp.where(d[..., 2] < 0, 1.0 - v, u),
        jnp.where(d[..., 2] < 0, 1.0 - u, v),
    )
    u = jnp.copysign(u, d[..., 0])
    v = jnp.copysign(v, d[..., 1])
    return jnp.stack([0.5 * (u + 1.0), 0.5 * (v + 1.0)], axis=-1)


def equal_area_square_to_sphere(p: Array) -> Array:
    """Inverse of equal_area_sphere_to_square ([0,1]^2 -> unit dir)."""
    u = 2.0 * p[..., 0] - 1.0
    v = 2.0 * p[..., 1] - 1.0
    up = jnp.abs(u)
    vp = jnp.abs(v)
    sd = 1.0 - (up + vp)
    d = jnp.abs(sd)
    r = 1.0 - d
    phi = jnp.where(r == 0, 1.0, (vp - up) / jnp.maximum(r, 1e-20) + 1.0) * jnp.pi / 4.0
    z = jnp.copysign(1.0 - r * r, sd)
    cphi = jnp.copysign(jnp.cos(phi), u)
    sphi = jnp.copysign(jnp.sin(phi), v)
    s = r * jnp.sqrt(jnp.clip(2.0 - r * r, 0.0, 2.0))
    return jnp.stack([cphi * s, sphi * s, z], axis=-1)
