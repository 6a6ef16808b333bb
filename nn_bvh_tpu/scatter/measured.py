"""Measured/tabulated BRDF (MeasuredBxDF, base/bxdf.h:166; bxdfs.h Measured —
the reference evaluates Dupuy-Jakob 2018 RGL `.bsdf` tables).

TPU re-design: the RGL format's NDF-warped parameterization needs per-eval
Newton inversions and many dependent gathers — hostile to a vector machine.
Instead the table is resampled ONCE on host into a dense isotropic grid over
(mu_o, mu_i, dphi/pi) in [0,1]^3, each cell holding the spectral-uplift
coefficients [c0 c1 c2 scale] of the RGB BRDF value (the same storage as our
image textures, core/rgb2spec.py). Evaluation is one fused 8-corner
trilinear gather + a sigmoid-polynomial eval — fully vectorized, no control
flow. Isotropy and reciprocity of measured materials make the reduced
parameterization near-lossless at 32^3 (the reference's own tables are
effectively isotropic too).

Sampling uses the cosine hemisphere (unbiased for any table; a visible-NDF
proxy importance sampler is a quality follow-up). `tabulate()` converts any
RGB BRDF function into a table — the ingestion path for converted RGL data
and the test harness.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vecmath as vm, sampling

Array = jax.Array


def tabulate(fn, res: tuple[int, int, int] = (16, 16, 16)) -> np.ndarray:
    """Build an RGB table from fn(wo, wi) -> (..., 3) evaluated on the grid.

    Grid cell centers: mu_o, mu_i in (0,1], dphi in [0,pi]. Returns
    (No, Ni, Np, 3) float32 RGB BRDF values."""
    no, ni, npp = res
    mu_o = (np.arange(no) + 0.5) / no
    mu_i = (np.arange(ni) + 0.5) / ni
    dphi = (np.arange(npp) + 0.5) / npp * np.pi
    MO, MI, DP = np.meshgrid(mu_o, mu_i, dphi, indexing="ij")
    so = np.sqrt(1 - MO ** 2)
    si = np.sqrt(1 - MI ** 2)
    wo = np.stack([so, np.zeros_like(so), MO], -1)
    wi = np.stack([si * np.cos(DP), si * np.sin(DP), MI], -1)
    vals = np.asarray(fn(wo.astype(np.float32), wi.astype(np.float32)))
    return vals.astype(np.float32)


def table_to_coeffs(table_rgb: np.ndarray) -> np.ndarray:
    """(No, Ni, Np, 3) RGB -> (No, Ni, Np, 4) spectral-uplift coefficients."""
    from ..core import rgb2spec

    no, ni, npp, _ = table_rgb.shape
    flat = table_rgb.reshape(no, ni * npp, 3)
    return rgb2spec.rgb_image_to_coeffs(flat).reshape(no, ni, npp, 4)


def save_table(path: str, table_rgb: np.ndarray) -> None:
    """Persist a measured table (our binary interchange for converted RGL
    data; the reference ships `.bsdf` files we cannot redistribute)."""
    np.savez_compressed(path, brdf_rgb=table_rgb.astype(np.float32))


def load_table(path: str) -> np.ndarray:
    return np.load(path)["brdf_rgb"]


def eval_coeffs(tab: Array, tab_id: Array, wo: Array, wi: Array) -> Array:
    """Trilinear lookup -> (..., 4) uplift coefficients.

    tab: (T, No, Ni, Np, 4); tab_id (...,) i32; wo/wi local frame."""
    T, no, ni, npp, _ = tab.shape
    flat = tab.reshape(T * no * ni * npp, 4)
    mu_o = vm.abs_cos_theta(wo)
    mu_i = vm.abs_cos_theta(wi)
    phi = jnp.arctan2(wi[..., 1], wi[..., 0]) - jnp.arctan2(wo[..., 1],
                                                            wo[..., 0])
    dphi = jnp.abs(jnp.remainder(phi + np.pi, 2 * np.pi) - np.pi) / np.pi

    def axis(u, n):
        x = jnp.clip(u * n - 0.5, 0.0, n - 1.0)
        i0 = jnp.clip(x.astype(jnp.int32), 0, n - 2)
        return i0, x - i0

    io, fo = axis(mu_o, no)
    ii, fi = axis(mu_i, ni)
    ip, fp = axis(dphi, npp)
    base = jnp.maximum(tab_id, 0) * (no * ni * npp)

    out = jnp.zeros(wo.shape[:-1] + (4,), jnp.float32)
    for do in (0, 1):
        for di in (0, 1):
            for dp in (0, 1):
                idx = base + ((io + do) * ni + (ii + di)) * npp + (ip + dp)
                w = ((fo if do else 1 - fo) * (fi if di else 1 - fi)
                     * (fp if dp else 1 - fp))
                out = out + w[..., None] * flat[idx]
    return out


def f(tab: Array, tab_id: Array, wo: Array, wi: Array, lam: Array) -> Array:
    """BRDF value (..., S): spectral uplift of the interpolated RGB table.
    Reflection-only (tables store no transmission), zero across hemispheres."""
    from ..core import rgb2spec

    c = eval_coeffs(tab, tab_id, wo, wi)
    spec = rgb2spec.eval_sigmoid_poly(c[..., 0:3], lam) * c[..., 3:4]
    ok = vm.same_hemisphere(wo, wi)
    return jnp.where(ok[..., None], jnp.clip(spec, 0.0, None), 0.0)


def pdf(wo: Array, wi: Array) -> Array:
    ok = vm.same_hemisphere(wo, wi)
    return jnp.where(ok, sampling.cosine_hemisphere_pdf(vm.abs_cos_theta(wi)),
                     0.0)


def sample_f(tab: Array, tab_id: Array, wo: Array, lam: Array, u2: Array):
    """Cosine-hemisphere sample on wo's side -> (wi, f, pdf)."""
    wi = sampling.sample_cosine_hemisphere(u2)
    wi = jnp.where(wo[..., 2:3] < 0, wi * jnp.asarray([1.0, 1.0, -1.0]), wi)
    return wi, f(tab, tab_id, wo, wi, lam), pdf(wo, wi)
