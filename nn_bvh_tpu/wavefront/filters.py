"""Reconstruction filters with tabulated importance sampling.

Counterpart of the reference's Filter family (`base/filter.h:25`, impls
`filters.h/cpp`): Box, Triangle, Gaussian, Mitchell, LanczosSinc — plus the
FilterSampler (filters.h FilterSampler): a tabulated 2D distribution over |f|
so every film sample carries weight f(p)/pdf(p) and the film just averages
(filter importance sampling; the reference's wavefront path uses exactly this,
film.h:232 AddSample with weight).

The sampling tables are built on host (numpy) at filter construction; lookup
at render time is the shared distribution-2d machinery (core.sampling).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import sampling

Array = jax.Array

BOX = 0
TRIANGLE = 1
GAUSSIAN = 2
MITCHELL = 3
LANCZOS = 4

_TABLE = 32


class FilterConfig(NamedTuple):
    kind: int          # static
    radius: tuple      # static (rx, ry)
    p0: float          # static param (sigma | b | tau)
    p1: float          # static param (c)
    # tabulated sampler (None for box)
    dist: tuple | None  # make_distribution_2d output over |f|
    integral: float    # static: integral of f over the support


from ..utils.pytree import register_static as _register_static

_register_static(FilterConfig, ("kind", "radius", "p0", "p1", "integral"))


def _gauss(x, sigma):
    return np.exp(-x * x / (2 * sigma * sigma)) / np.sqrt(2 * np.pi * sigma * sigma)


def _eval_1d_np(kind, x, r, p0, p1):
    ax = np.abs(x)
    if kind == BOX:
        return np.where(ax <= r, 1.0, 0.0)
    if kind == TRIANGLE:
        return np.maximum(0.0, r - ax)
    if kind == GAUSSIAN:
        return np.maximum(0.0, _gauss(x, p0) - _gauss(r, p0))
    if kind == MITCHELL:
        b, c = p0, p1
        x2 = np.abs(2 * x / r)  # mitchell defined on [-2,2]
        out = np.where(
            x2 > 1,
            ((-b - 6 * c) * x2**3 + (6 * b + 30 * c) * x2**2 +
             (-12 * b - 48 * c) * x2 + (8 * b + 24 * c)) / 6,
            ((12 - 9 * b - 6 * c) * x2**3 + (-18 + 12 * b + 6 * c) * x2**2 +
             (6 - 2 * b)) / 6,
        )
        return np.where(x2 <= 2, out, 0.0)
    if kind == LANCZOS:
        tau = p0

        def sinc(v):
            v = np.abs(v) + 1e-9
            return np.sin(np.pi * v) / (np.pi * v)

        return np.where(ax <= r, sinc(x) * sinc(x / tau), 0.0)
    raise ValueError(kind)


def evaluate_np(cfg: FilterConfig, x, y):
    """Host-side filter evaluation f(x, y) (separable product)."""
    rx, ry = cfg.radius
    return (_eval_1d_np(cfg.kind, np.asarray(x), rx, cfg.p0, cfg.p1)
            * _eval_1d_np(cfg.kind, np.asarray(y), ry, cfg.p0, cfg.p1))


def make_filter(kind: str = "box", radius=None, sigma: float = 0.5,
                b: float = 1.0 / 3.0, c: float = 1.0 / 3.0,
                tau: float = 3.0) -> FilterConfig:
    """Filter factory with the reference's defaults (filters.cpp Create*):
    box r=0.5, triangle r=2, gaussian r=1.5 sigma=0.5, mitchell r=2 b=c=1/3,
    lanczossinc r=4 tau=3."""
    kinds = {"box": BOX, "triangle": TRIANGLE, "gaussian": GAUSSIAN,
             "mitchell": MITCHELL, "sinc": LANCZOS, "lanczossinc": LANCZOS}
    k = kinds[kind]
    defaults = {BOX: 0.5, TRIANGLE: 2.0, GAUSSIAN: 1.5, MITCHELL: 2.0,
                LANCZOS: 4.0}
    r = float(radius) if radius is not None else defaults[k]
    p0 = {GAUSSIAN: sigma, MITCHELL: b, LANCZOS: tau}.get(k, 0.0)
    p1 = c if k == MITCHELL else 0.0
    if k == BOX:
        return FilterConfig(k, (r, r), p0, p1, None, (2 * r) ** 2)
    # tabulate f over the support for the importance sampler
    xs = (np.arange(_TABLE) + 0.5) / _TABLE * 2 * r - r
    f = (_eval_1d_np(k, xs, r, p0, p1)[None, :]
         * _eval_1d_np(k, xs, r, p0, p1)[:, None])
    integral = float(f.sum() * (2 * r / _TABLE) ** 2)
    dist = sampling.make_distribution_2d(jnp.asarray(np.abs(f), jnp.float32))
    cfg = FilterConfig(k, (r, r), p0, p1, dist, integral)
    return cfg


def _eval_1d(cfg: FilterConfig, x: Array, r: float) -> Array:
    ax = jnp.abs(x)
    k = cfg.kind
    if k == BOX:
        return jnp.where(ax <= r, 1.0, 0.0)
    if k == TRIANGLE:
        return jnp.maximum(0.0, r - ax)
    if k == GAUSSIAN:
        s = cfg.p0
        g = lambda v: jnp.exp(-v * v / (2 * s * s)) / jnp.sqrt(2 * jnp.pi * s * s)
        return jnp.maximum(0.0, g(x) - g(jnp.float32(r)))
    if k == MITCHELL:
        b, c = cfg.p0, cfg.p1
        x2 = jnp.abs(2 * x / r)
        hi = ((-b - 6 * c) * x2**3 + (6 * b + 30 * c) * x2**2 +
              (-12 * b - 48 * c) * x2 + (8 * b + 24 * c)) / 6
        lo = ((12 - 9 * b - 6 * c) * x2**3 + (-18 + 12 * b + 6 * c) * x2**2 +
              (6 - 2 * b)) / 6
        return jnp.where(x2 <= 1, lo, jnp.where(x2 <= 2, hi, 0.0))
    if k == LANCZOS:
        tau = cfg.p0
        sinc = lambda v: jnp.sin(jnp.pi * (jnp.abs(v) + 1e-9)) / (jnp.pi * (jnp.abs(v) + 1e-9))
        return jnp.where(ax <= r, sinc(x) * sinc(x / tau), 0.0)
    raise ValueError(k)


def evaluate(cfg: FilterConfig, p: Array) -> Array:
    """f(p) for offsets p (..., 2) from the pixel center."""
    return (_eval_1d(cfg, p[..., 0], cfg.radius[0])
            * _eval_1d(cfg, p[..., 1], cfg.radius[1]))


def sample(cfg: FilterConfig, u2: Array):
    """FilterSampler::Sample — u2 (...,2) -> (offset (...,2), weight (...,)).

    weight = f(p) / pdf(p); for box this is the constant 1 with uniform
    in-pixel offsets (matching the previous jitter behavior)."""
    rx, ry = cfg.radius
    if cfg.kind == BOX:
        off = (u2 - 0.5) * jnp.asarray([2 * rx, 2 * ry], jnp.float32)
        return off, jnp.ones(u2.shape[:-1], jnp.float32)
    p01, pdf = sampling.sample_distribution_2d(cfg.dist, u2)
    off = (p01 - 0.5) * jnp.asarray([2 * rx, 2 * ry], jnp.float32)
    # pdf from the table is over [0,1]^2; rescale to the support area
    pdf_area = pdf / (4 * rx * ry)
    f = evaluate(cfg, off)
    return off, f / jnp.maximum(pdf_area, 1e-12)
