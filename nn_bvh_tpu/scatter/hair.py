"""Marschner-model hair BSDF (HairBxDF, base/bxdf.h:166 tag list; math in
src/pbrt/bxdfs.h/cpp HairBxDF — re-derived here from the published model:
Marschner et al. 2003 + the pbrt/d'Eon longitudinal/azimuthal factorization).

Lobes p = 0 (R), 1 (TT), 2 (TRT) and a residual p >= 3 lobe:
  f = sum_p  Mp(theta_o, theta_i; v_p) * Ap[p] * Np(phi; s) / |cos theta_i|

Frame convention: the hair fiber axis is the *local x axis* of the shading
frame (the reference's curves use the same convention: sinTheta = w.x).
`h` in [-1, 1] is the normalized offset of the ray across the fiber width.

Everything is pure jnp, vectorized over lanes, and differentiable w.r.t.
sigma_a / beta_m / beta_n — usable both in the renderer and as a learnable
appearance model.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vecmath as vm

Array = jax.Array

P_MAX = 3
SQRT_PI_OVER_8 = float(np.sqrt(np.pi / 8.0))


# ---------------------------------------------------------------------------
# ingredient functions
# ---------------------------------------------------------------------------

def _i0(x: Array) -> Array:
    """Modified Bessel I0 via the first 10 series terms (bxdfs.cpp I0)."""
    val = jnp.zeros_like(x)
    x2i = jnp.ones_like(x)
    ifact = 1.0
    for i in range(10):
        if i > 1:
            ifact *= i
        val = val + x2i / (4.0 ** i) / (ifact * ifact)
        x2i = x2i * x * x
    return val


def _log_i0(x: Array) -> Array:
    big = x > 12.0
    xs = jnp.maximum(x, 1e-6)
    approx = xs + 0.5 * (-jnp.log(2.0 * jnp.pi) + jnp.log(1.0 / xs)
                         + 1.0 / (8.0 * xs))
    return jnp.where(big, approx, jnp.log(jnp.maximum(_i0(x), 1e-30)))


def mp(cos_ti: Array, cos_to: Array, sin_ti: Array, sin_to: Array,
       v: Array) -> Array:
    """Longitudinal scattering function (bxdfs.cpp Mp)."""
    a = cos_ti * cos_to / v
    b = sin_ti * sin_to / v
    small = v <= 0.1
    m_small = jnp.exp(_log_i0(a) - b - 1.0 / jnp.maximum(v, 1e-9)
                      + 0.6931 + jnp.log(1.0 / (2.0 * jnp.maximum(v, 1e-9))))
    sinh = jnp.sinh(1.0 / jnp.maximum(v, 1e-4))
    m_big = (jnp.exp(-b) * _i0(a)) / (2.0 * v * jnp.maximum(sinh, 1e-30))
    return jnp.where(small, m_small, m_big)


def _logistic(x: Array, s: Array) -> Array:
    x = jnp.abs(x)
    e = jnp.exp(-x / s)
    return e / (s * (1.0 + e) ** 2)


def _logistic_cdf(x: Array, s: Array) -> Array:
    return 1.0 / (1.0 + jnp.exp(-x / s))


def _trimmed_logistic(x: Array, s: Array, a: float, b: float) -> Array:
    return _logistic(x, s) / (_logistic_cdf(jnp.full_like(x, b), s)
                              - _logistic_cdf(jnp.full_like(x, a), s))


def _sample_trimmed_logistic(u: Array, s: Array, a: float, b: float) -> Array:
    k = _logistic_cdf(jnp.full_like(u, b), s) - _logistic_cdf(
        jnp.full_like(u, a), s)
    x = -s * jnp.log(1.0 / jnp.maximum(
        u * k + _logistic_cdf(jnp.full_like(u, a), s), 1e-9) - 1.0)
    return jnp.clip(x, a, b)


def _phi_p(p: int, gamma_o: Array, gamma_t: Array) -> Array:
    return 2.0 * p * gamma_t - 2.0 * gamma_o + p * np.pi


def np_(p: int, phi: Array, s: Array, gamma_o: Array, gamma_t: Array) -> Array:
    """Azimuthal scattering Np (bxdfs.cpp Np): trimmed logistic around the
    perfect-specular azimuth of lobe p."""
    dphi = phi - _phi_p(p, gamma_o, gamma_t)
    dphi = jnp.remainder(dphi + np.pi, 2.0 * np.pi) - np.pi
    return _trimmed_logistic(dphi, s, -np.pi, np.pi)


def _fr_dielectric(cos_i: Array, eta: Array) -> Array:
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    sin2_t = (1.0 - cos_i * cos_i) / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = vm.safe_sqrt(1.0 - sin2_t)
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-9)
    r_per = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-9)
    return jnp.where(tir, 1.0, 0.5 * (r_par ** 2 + r_per ** 2))


def ap(cos_to: Array, eta: Array, h: Array, transmittance: Array) -> Array:
    """Attenuation per lobe -> (..., P_MAX+1, S) (bxdfs.cpp Ap)."""
    cos_go = vm.safe_sqrt(1.0 - h * h)
    cos_t = cos_to * cos_go
    f = _fr_dielectric(cos_t, eta)[..., None]
    T = transmittance
    a0 = jnp.broadcast_to(f, T.shape)
    a1 = (1.0 - f) ** 2 * T
    a2 = a1 * T * f
    a_rest = a2 * f * T / jnp.maximum(1.0 - T * f, 1e-4)
    return jnp.stack([a0, a1, a2, a_rest], axis=-2)


def _derived(beta_m: Array, beta_n: Array):
    """(v per lobe (..., P_MAX+1), logistic scale s) from roughnesses."""
    v0 = (0.726 * beta_m + 0.812 * beta_m ** 2 + 3.7 * beta_m ** 20) ** 2
    v = jnp.stack([v0, 0.25 * v0, 4.0 * v0, 4.0 * v0], axis=-1)
    v = jnp.maximum(v, 1e-5)
    s = SQRT_PI_OVER_8 * (0.265 * beta_n + 1.194 * beta_n ** 2
                          + 5.372 * beta_n ** 22)
    return v, jnp.maximum(s, 1e-4)


# scale tilt: pbrt rotates lobe p by 2^k alpha (alpha = 2 degrees); we apply
# the same per-lobe theta_o adjustment
_ALPHA = np.deg2rad(2.0)
_SIN_2K = [np.sin(_ALPHA), None, None]
_SIN_2K[1] = 2 * _SIN_2K[0] * np.cos(_ALPHA)   # sin(2a)
_COS_2K = [np.cos(_ALPHA), np.cos(_ALPHA) ** 2 - _SIN_2K[0] ** 2, None]
_SIN_2K[2] = 2 * _SIN_2K[1] * _COS_2K[1]
_COS_2K[2] = _COS_2K[1] ** 2 - _SIN_2K[1] ** 2


def _tilted(p: int, sin_to: Array, cos_to: Array):
    if p == 0:
        s, c = _SIN_2K[1], _COS_2K[1]
        return sin_to * c - cos_to * s, cos_to * c + sin_to * s
    if p == 1:
        s, c = _SIN_2K[0], _COS_2K[0]
        return sin_to * c + cos_to * s, cos_to * c - sin_to * s
    if p == 2:
        s, c = _SIN_2K[2], _COS_2K[2]
        return sin_to * c + cos_to * s, cos_to * c - sin_to * s
    return sin_to, cos_to


def _geom(wo: Array, wi: Array, h: Array, eta: Array, sigma_a: Array):
    sin_to = jnp.clip(wo[..., 0], -1.0, 1.0)
    cos_to = vm.safe_sqrt(1.0 - sin_to ** 2)
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    sin_ti = jnp.clip(wi[..., 0], -1.0, 1.0)
    cos_ti = vm.safe_sqrt(1.0 - sin_ti ** 2)
    phi_i = jnp.arctan2(wi[..., 2], wi[..., 1])

    # refracted-ray geometry
    sin_tt = sin_to / eta
    cos_tt = vm.safe_sqrt(1.0 - sin_tt ** 2)
    etap = vm.safe_sqrt(eta * eta - sin_to ** 2) / jnp.maximum(cos_to, 1e-6)
    sin_gt = jnp.clip(h / jnp.maximum(etap, 1e-6), -1.0, 1.0)
    cos_gt = vm.safe_sqrt(1.0 - sin_gt ** 2)
    gamma_t = jnp.arcsin(sin_gt)
    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))

    # absorption along the internal chord
    T = jnp.exp(-sigma_a * (2.0 * cos_gt / jnp.maximum(cos_tt, 1e-5))[..., None])
    phi = phi_i - phi_o
    return (sin_to, cos_to, sin_ti, cos_ti, gamma_o, gamma_t, T, phi)


def f(wo: Array, wi: Array, h: Array, eta: Array, sigma_a: Array,
      beta_m: Array, beta_n: Array) -> Array:
    """Hair BSDF value (..., S). wo/wi in the fiber local frame (x = axis)."""
    (sin_to, cos_to, sin_ti, cos_ti, gamma_o, gamma_t, T, phi) = _geom(
        wo, wi, h, eta, sigma_a)
    v, s = _derived(beta_m, beta_n)
    a = ap(cos_to, eta, h, T)  # (..., 4, S)

    fsum = jnp.zeros_like(T)
    for p in range(P_MAX):
        sin_tp, cos_tp = _tilted(p, sin_to, cos_to)
        cos_tp = jnp.abs(cos_tp)
        m = mp(cos_ti, cos_tp, sin_ti, sin_tp, v[..., p])
        n = np_(p, phi, s, gamma_o, gamma_t)
        fsum = fsum + (m * n)[..., None] * a[..., p, :]
    m_rest = mp(cos_ti, cos_to, sin_ti, sin_to, v[..., P_MAX])
    fsum = fsum + (m_rest / (2.0 * np.pi))[..., None] * a[..., P_MAX, :]

    abs_ci = vm.abs_cos_theta(wi)
    return jnp.where(abs_ci[..., None] > 1e-6,
                     fsum / jnp.maximum(abs_ci, 1e-6)[..., None], 0.0)


def _ap_pdf(cos_to: Array, eta: Array, h: Array, T: Array) -> Array:
    """Lobe selection pdf from mean attenuation -> (..., P_MAX+1)."""
    a = jnp.mean(ap(cos_to, eta, h, T), axis=-1)  # luminance proxy
    tot = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), 1e-9)
    return a / tot


def pdf(wo: Array, wi: Array, h: Array, eta: Array, sigma_a: Array,
        beta_m: Array, beta_n: Array) -> Array:
    (sin_to, cos_to, sin_ti, cos_ti, gamma_o, gamma_t, T, phi) = _geom(
        wo, wi, h, eta, sigma_a)
    v, s = _derived(beta_m, beta_n)
    apdf = _ap_pdf(cos_to, eta, h, T)
    out = jnp.zeros_like(phi)
    for p in range(P_MAX):
        sin_tp, cos_tp = _tilted(p, sin_to, cos_to)
        cos_tp = jnp.abs(cos_tp)
        out = out + (apdf[..., p]
                     * mp(cos_ti, cos_tp, sin_ti, sin_tp, v[..., p])
                     * np_(p, phi, s, gamma_o, gamma_t))
    out = out + (apdf[..., P_MAX]
                 * mp(cos_ti, cos_to, sin_ti, sin_to, v[..., P_MAX])
                 / (2.0 * np.pi))
    return out


def sample_f(wo: Array, h: Array, eta: Array, sigma_a: Array,
             beta_m: Array, beta_n: Array, uc: Array, u2: Array):
    """Importance-sample the hair BSDF (bxdfs.cpp HairBxDF::Sample_f).

    Returns (wi, f_val (...,S), pdf (...,)). uc selects the lobe; u2 drives
    the longitudinal (Mp) and azimuthal (Np) samples (two extra dims are
    derived from u2 by bit mixing — the reference demuxes one 2D sample the
    same way with DemuxFloat)."""
    sin_to = jnp.clip(wo[..., 0], -1.0, 1.0)
    cos_to = vm.safe_sqrt(1.0 - sin_to ** 2)
    phi_o = jnp.arctan2(wo[..., 2], wo[..., 1])
    etap = vm.safe_sqrt(eta * eta - sin_to ** 2) / jnp.maximum(cos_to, 1e-6)
    sin_gt = jnp.clip(h / jnp.maximum(etap, 1e-6), -1.0, 1.0)
    gamma_t = jnp.arcsin(sin_gt)
    gamma_o = jnp.arcsin(jnp.clip(h, -1.0, 1.0))
    sin_tt = sin_to / eta
    cos_tt = vm.safe_sqrt(1.0 - sin_tt ** 2)
    cos_gt = vm.safe_sqrt(1.0 - sin_gt ** 2)
    T = jnp.exp(-sigma_a * (2.0 * cos_gt / jnp.maximum(cos_tt, 1e-5))[..., None])

    v, s = _derived(beta_m, beta_n)
    apdf = _ap_pdf(cos_to, eta, h, T)  # (..., 4)

    # lobe selection by inverting the discrete CDF
    c0 = apdf[..., 0]
    c1 = c0 + apdf[..., 1]
    c2 = c1 + apdf[..., 2]
    p_sel = (uc >= c0).astype(jnp.int32) + (uc >= c1) + (uc >= c2)

    # remap uc to a fresh uniform within the chosen lobe interval
    lo = jnp.stack([jnp.zeros_like(c0), c0, c1, c2], -1)
    w = jnp.take_along_axis(apdf, p_sel[..., None], -1)[..., 0]
    u_lob = jnp.clip((uc - jnp.take_along_axis(lo, p_sel[..., None], -1)[..., 0])
                     / jnp.maximum(w, 1e-9), 0.0, 0.9999)

    # per-lobe tilted angles, gathered by p_sel
    tilts = [_tilted(p, sin_to, cos_to) for p in range(P_MAX)] + [
        (sin_to, cos_to)]
    sin_tp = jnp.stack([t[0] for t in tilts], -1)
    cos_tp = jnp.abs(jnp.stack([t[1] for t in tilts], -1))
    sin_top = jnp.take_along_axis(sin_tp, p_sel[..., None], -1)[..., 0]
    cos_top = jnp.take_along_axis(cos_tp, p_sel[..., None], -1)[..., 0]
    vp = jnp.take_along_axis(v, p_sel[..., None], -1)[..., 0]

    # sample Mp: d'Eon et al. inversion
    u0 = jnp.maximum(u2[..., 0], 1e-5)
    cos_theta = 1.0 + vp * jnp.log(u0 + (1.0 - u0) * jnp.exp(-2.0 / vp))
    sin_theta = vm.safe_sqrt(1.0 - cos_theta ** 2)
    u1 = u2[..., 1]
    cos_phi_m = jnp.cos(2.0 * np.pi * u1)
    sin_ti = -cos_theta * sin_top + sin_theta * cos_phi_m * cos_top
    cos_ti = vm.safe_sqrt(1.0 - sin_ti ** 2)

    # sample Np: trimmed logistic for p < P_MAX, uniform for the rest.
    # The azimuthal uniform is u_lob — the SampleDiscrete-remapped remainder
    # of uc after lobe selection — exactly as the reference reuses the
    # remapped uc for SampleTrimmedLogistic (bxdfs.cpp:408,449). Deriving it
    # from u2 instead would correlate the azimuthal and longitudinal samples
    # and make the sampled density disagree with pdf().
    dphi_log = _phi_p(0, gamma_o, gamma_t) * 0.0 + _sample_trimmed_logistic(
        u_lob, s, -np.pi, np.pi)
    phi_base = jnp.stack([_phi_p(p, gamma_o, gamma_t) for p in range(P_MAX)]
                         + [jnp.zeros_like(gamma_o)], -1)
    phi_p_sel = jnp.take_along_axis(phi_base, p_sel[..., None], -1)[..., 0]
    dphi = jnp.where(p_sel < P_MAX, phi_p_sel + dphi_log,
                     2.0 * np.pi * u_lob - np.pi)
    phi_i = phi_o + dphi
    wi = jnp.stack([sin_ti, cos_ti * jnp.cos(phi_i), cos_ti * jnp.sin(phi_i)],
                   -1)
    f_val = f(wo, wi, h, eta, sigma_a, beta_m, beta_n)
    pdf_val = pdf(wo, wi, h, eta, sigma_a, beta_m, beta_n)
    return wi, f_val, pdf_val


def sigma_a_from_reflectance(refl: Array, beta_n: Array) -> Array:
    """Chiang et al. 2016 inversion used by the reference's hair material
    (materials.cpp HairMaterial): absorption from desired albedo."""
    r = jnp.clip(refl, 1e-4, 0.9999)
    denom = (5.969 - 0.215 * beta_n + 2.532 * beta_n ** 2
             - 10.73 * beta_n ** 3 + 5.574 * beta_n ** 4
             + 0.245 * beta_n ** 5)
    return (jnp.log(r) / denom[..., None]) ** 2
