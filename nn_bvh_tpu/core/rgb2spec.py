"""RGB -> full-spectrum uplifting via sigmoid polynomials.

Counterpart of the reference's RGBSigmoidPolynomial / RGBToSpectrumTable
(`util/color.h`, tables precomputed offline by `cmd/rgb2spec_opt.cpp:960` with
Gauss-Newton). Same representation — s(lambda) = sigmoid(c0 x^2 + c1 x + c2),
sigmoid(v) = 1/2 + v / (2 sqrt(1 + v^2)) — but we solve the coefficient table
at first use with a *vectorized* Gauss-Newton over all table cells at once
(numpy, host-side, cached to data/), instead of shipping a binary blob.

Device-side evaluation (eval_sigmoid_poly / albedo tables) is pure VPU math.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from . import spectrum, colorspace

Array = jax.Array

_TABLE_RES = 33
_CACHE = os.path.join(os.path.dirname(__file__), "..", "..", "data")


def _lam_normalized(lam):
    """Map [LAMBDA_MIN, LAMBDA_MAX] -> [-1, 1] for polynomial conditioning."""
    return (lam - spectrum.LAMBDA_MIN) / (spectrum.LAMBDA_MAX - spectrum.LAMBDA_MIN) * 2.0 - 1.0


def sigmoid(x):
    return 0.5 + x / (2.0 * jnp.sqrt(1.0 + x * x))


def eval_sigmoid_poly(coeffs: Array, lam: Array) -> Array:
    """coeffs (..., 3), lam (..., S) -> spectrum values (..., S)."""
    xn = _lam_normalized(lam)
    x = coeffs[..., 0:1] * xn * xn + coeffs[..., 1:2] * xn + coeffs[..., 2:3]
    return sigmoid(x)


# ---------------------------------------------------------------------------
# host-side fitting (numpy)
# ---------------------------------------------------------------------------

def _reflectance_basis():
    """B (3, nl): linear operator mapping spectrum samples -> sensor RGB under
    the std illuminant (so s==1 maps to RGB (1,1,1))."""
    lam = np.arange(spectrum.LAMBDA_MIN, spectrum.LAMBDA_MAX + 1.0, 5.0)
    w = spectrum.illuminant_d(lam)
    cie = np.stack([spectrum.cie_x(lam), spectrum.cie_y(lam), spectrum.cie_z(lam)])
    norm = float(np.sum(spectrum.cie_y(lam) * w))
    B = colorspace.SENSOR_XYZ_TO_SRGB @ (cie * w[None, :]) / norm
    return B.astype(np.float64), lam


def _np_sigmoid(x):
    return 0.5 + x / (2.0 * np.sqrt(1.0 + x * x))


def fit_sigmoid_coeffs(targets: np.ndarray, iters: int = 60) -> np.ndarray:
    """Vectorized Gauss-Newton fit. targets (N,3) in [0,1] -> coeffs (N,3)."""
    B, lam = _reflectance_basis()
    xn = np.asarray(_lam_normalized(lam), np.float64)
    V = np.stack([xn * xn, xn, np.ones_like(xn)], axis=-1)  # (nl, 3)
    t = np.asarray(targets, np.float64)
    n = t.shape[0]
    c = np.zeros((n, 3))
    mean = np.clip(t.mean(-1), 1e-4, 1 - 1e-4)
    # invert sigmoid for the constant init
    c[:, 2] = (2 * mean - 1) / (2.0 * np.sqrt(mean * (1 - mean)))
    lm = np.full(n, 1e-4)
    for _ in range(iters):
        x = c @ V.T  # (n, nl)
        s = _np_sigmoid(x)
        rgb = s @ B.T  # (n, 3)
        r = rgb - t
        ds = 0.5 / np.power(1.0 + x * x, 1.5)  # sigmoid'
        # J (n, 3rgb, 3coef) = B @ diag(ds) @ V
        J = np.einsum("kl,nl,lc->nkc", B, ds, V)
        JtJ = np.einsum("nkc,nkd->ncd", J, J)
        Jtr = np.einsum("nkc,nk->nc", J, r)
        A = JtJ + lm[:, None, None] * np.eye(3)[None]
        try:
            step = np.linalg.solve(A, Jtr[..., None])[..., 0]
        except np.linalg.LinAlgError:
            step = np.linalg.solve(A + 1e-6 * np.eye(3)[None], Jtr[..., None])[..., 0]
        c = c - step
    return c.astype(np.float32)


def _table_path():
    return os.path.abspath(os.path.join(_CACHE, f"rgb2spec_srgb_{_TABLE_RES}.npy"))


_table_cache = None


def get_table() -> np.ndarray:
    """(res, res, res, 3) coefficient table over RGB in [0,1]^3 (lazily fit +
    cached on disk — the cmd/rgb2spec_opt.cpp equivalent)."""
    global _table_cache
    if _table_cache is not None:
        return _table_cache
    path = _table_path()
    if os.path.exists(path):
        _table_cache = np.load(path)
        return _table_cache
    res = _TABLE_RES
    g = np.linspace(0.0, 1.0, res)
    rr, gg, bb = np.meshgrid(g, g, g, indexing="ij")
    targets = np.stack([rr, gg, bb], axis=-1).reshape(-1, 3)
    coeffs = fit_sigmoid_coeffs(targets).reshape(res, res, res, 3)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.save(path, coeffs)
    _table_cache = coeffs
    return _table_cache


def rgb_to_coeffs_host(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact per-color fit (host, scene-build time). rgb (N,3) unbounded >= 0.

    Returns (coeffs (N,3), scale (N,)): spectrum = scale * sigmoid_poly(coeffs).
    Matches RGBAlbedoSpectrum for scale==1 and RGBUnboundedSpectrum otherwise
    (spectrum.h:531,557).
    """
    rgb = np.asarray(rgb, np.float32).reshape(-1, 3)
    m = rgb.max(-1)
    scale = np.where(m > 1.0, 2.0 * m, 1.0).astype(np.float32)
    norm = rgb / scale[:, None]
    coeffs = fit_sigmoid_coeffs(norm)
    return coeffs, scale


def lookup_coeffs(table: Array, rgb: Array) -> tuple[Array, Array]:
    """Trilinear table lookup on device. rgb (...,3) -> (coeffs (...,3), scale)."""
    res = _TABLE_RES
    m = jnp.max(rgb, axis=-1)
    scale = jnp.where(m > 1.0, 2.0 * m, 1.0)
    norm = rgb / scale[..., None]
    f = jnp.clip(norm, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(f.astype(jnp.int32), 0, res - 2)
    fr = f - i0
    def gather(di, dj, dk):
        return table[i0[..., 0] + di, i0[..., 1] + dj, i0[..., 2] + dk]
    c = jnp.zeros(rgb.shape[:-1] + (3,), jnp.float32)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                w = (
                    (fr[..., 0] if di else 1 - fr[..., 0])
                    * (fr[..., 1] if dj else 1 - fr[..., 1])
                    * (fr[..., 2] if dk else 1 - fr[..., 2])
                )
                c = c + w[..., None] * gather(di, dj, dk)
    return c, scale


def rgb_image_to_coeffs(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) RGB -> (H, W, 4) [c0, c1, c2, scale] via trilinear lookup in
    the cached coefficient table (host-side; the per-texel analog of pbrt's
    RGBToSpectrumTable applied at scene-build time so the device never walks
    the 33^3 table)."""
    img = np.asarray(img, np.float32)
    table = get_table()
    res = _TABLE_RES
    m = img.max(-1)
    scale = np.where(m > 1.0, 2.0 * m, 1.0).astype(np.float32)
    norm = np.clip(img / scale[..., None], 0.0, 1.0)
    f = norm * (res - 1)
    i0 = np.minimum(f.astype(np.int64), res - 2)
    fr = f - i0
    out = np.zeros(img.shape[:-1] + (3,), np.float32)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                w = (
                    (fr[..., 0] if di else 1 - fr[..., 0])
                    * (fr[..., 1] if dj else 1 - fr[..., 1])
                    * (fr[..., 2] if dk else 1 - fr[..., 2])
                )
                out += w[..., None] * table[i0[..., 0] + di, i0[..., 1] + dj, i0[..., 2] + dk]
    return np.concatenate([out, scale[..., None]], axis=-1)
