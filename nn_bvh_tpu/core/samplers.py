"""Stateless per-ray samplers.

Counterpart of the reference's Sampler tagged-pointer family
(`base/sampler.h:36`, impls `samplers.h:33-735`). The reference samplers are
*stateful* objects (StartPixelSample / Get1D / Get2D); on TPU every sample
dimension must be a pure function of (pixel, sample_index, dimension), so each
sampler here is

    u = get_1d(cfg, pixel_index, sample_index, dim)
    (u, v) = get_2d(cfg, pixel_index, sample_index, dim)

fully vectorized over ray batches. The wavefront integrator pre-generates all
dimensions for a bounce into SoA arrays exactly like the reference's
GenerateRaySamples stage (`wavefront/samples.cpp:19`).

Implemented: INDEPENDENT (hash-based, = IndependentSampler),
STRATIFIED (jittered in sample-count grid), SOBOL (Owen-scrambled padded Sobol',
= PaddedSobolSampler with FastOwen randomization), HALTON (scrambled radical
inverse padding), ZSOBOL (= ZSobolSampler, samplers.h: blue-noise Ahmed-Wonka
morton-order base-4 index shuffling over Owen-scrambled Sobol').
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import rng, lowdiscrepancy as ld

Array = jax.Array

INDEPENDENT = 0
STRATIFIED = 1
SOBOL = 2
HALTON = 3
ZSOBOL = 4
TABLE = 5  # u-vector driven (MLT primary-sample-space chains)


class SamplerConfig(NamedTuple):
    kind: int  # static python int — selects code path at trace time
    seed: int
    spp: int  # samples per pixel (for stratified / sobol log2 rounding)
    width: int = 0  # image width (ZSobol needs 2D pixel coords from the flat index)
    table: Array | None = None  # (lanes, D) u-values for kind=TABLE; the
    # MLT driver passes sample_index = lane index so get_* can row-index it


def make_sampler(kind: str = "sobol", seed: int = 0, spp: int = 16,
                 width: int = 0) -> SamplerConfig:
    kinds = {
        "independent": INDEPENDENT,
        "stratified": STRATIFIED,
        "sobol": SOBOL,
        "paddedsobol": SOBOL,
        "zsobol": ZSOBOL,
        "pmj02bn": ZSOBOL,  # blue-noise point sets; ZSobol is our bn sampler
        "halton": HALTON,
    }
    return SamplerConfig(kinds[kind], seed, spp, width)


def _pixel_xy(cfg: SamplerConfig, pixel: Array):
    if cfg.width > 0:
        w = jnp.uint32(cfg.width)
        p = jnp.asarray(pixel, jnp.uint32)
        return p % w, p // w
    return jnp.asarray(pixel, jnp.uint32), jnp.zeros_like(pixel, jnp.uint32)


def _log2_ceil(n: int) -> int:
    return max(1, int(n - 1).bit_length())


def get_1d(cfg: SamplerConfig, pixel: Array, sample: Array, dim) -> Array:
    """One sample dimension in [0,1). pixel/sample are int32 arrays, dim int."""
    if cfg.kind == TABLE:
        d = jnp.clip(jnp.asarray(dim, jnp.int32), 0, cfg.table.shape[1] - 1)
        return cfg.table[sample, d]
    dim = jnp.asarray(dim, jnp.uint32)
    if cfg.kind == INDEPENDENT:
        return rng.hash_float(pixel, sample, dim, jnp.uint32(cfg.seed))
    if cfg.kind == STRATIFIED:
        u = rng.hash_float(pixel, sample, dim, jnp.uint32(cfg.seed))
        return (sample.astype(jnp.float32) + u) / cfg.spp
    if cfg.kind == SOBOL:
        log_n = _log2_ceil(cfg.spp)
        pad_seed = rng.hash_combine(pixel, dim, jnp.uint32(cfg.seed))
        idx = ld.owen_shuffle_index(sample, log_n, pad_seed)
        x, _ = ld.owen_scrambled_sobol_2d(idx, pad_seed ^ jnp.uint32(0x55555555), pad_seed)
        return x
    if cfg.kind == HALTON:
        pad_seed = rng.hash_combine(pixel, dim, jnp.uint32(cfg.seed))
        log_n = _log2_ceil(cfg.spp)
        idx = ld.owen_shuffle_index(sample, log_n, pad_seed)
        return ld.radical_inverse(0, idx + (pad_seed >> 16))
    if cfg.kind == ZSOBOL:
        px, py = _pixel_xy(cfg, pixel)
        idx = ld.zsobol_shuffled_index(px, py, sample, _log2_ceil(cfg.spp),
                                       dim, jnp.uint32(cfg.seed))
        x, _ = ld.owen_scrambled_sobol_2d(
            idx, rng.hash_combine(dim, jnp.uint32(cfg.seed)),
            rng.hash_combine(dim, jnp.uint32(cfg.seed ^ 0x9E377)))
        return x
    raise ValueError(f"unknown sampler kind {cfg.kind}")


def get_2d(cfg: SamplerConfig, pixel: Array, sample: Array, dim) -> tuple[Array, Array]:
    """A 2D sample in [0,1)^2; consumes dims (dim, dim+1)."""
    if cfg.kind == TABLE:
        d = jnp.clip(jnp.asarray(dim, jnp.int32), 0, cfg.table.shape[1] - 2)
        return cfg.table[sample, d], cfg.table[sample, d + 1]
    dim = jnp.asarray(dim, jnp.uint32)
    if cfg.kind == INDEPENDENT:
        return (
            rng.hash_float(pixel, sample, dim, jnp.uint32(cfg.seed)),
            rng.hash_float(pixel, sample, dim + jnp.uint32(1), jnp.uint32(cfg.seed)),
        )
    if cfg.kind == STRATIFIED:
        # jittered NxN grid over the sample index (N = ceil(sqrt(spp)))
        import math

        n = int(math.ceil(math.sqrt(cfg.spp)))
        # decorrelate strata order per pixel/dim
        perm = rng.hash_combine(pixel, dim, jnp.uint32(cfg.seed))
        s = (sample.astype(jnp.uint32) + perm) % jnp.uint32(n * n)
        sx = (s % n).astype(jnp.float32)
        sy = (s // n).astype(jnp.float32)
        jx = rng.hash_float(pixel, sample, dim, jnp.uint32(cfg.seed))
        jy = rng.hash_float(pixel, sample, dim + jnp.uint32(1), jnp.uint32(cfg.seed))
        return (sx + jx) / n, (sy + jy) / n
    if cfg.kind == SOBOL:
        log_n = _log2_ceil(cfg.spp)
        pad_seed = rng.hash_combine(pixel, dim, jnp.uint32(cfg.seed))
        idx = ld.owen_shuffle_index(sample, log_n, pad_seed)
        return ld.owen_scrambled_sobol_2d(
            idx, pad_seed ^ jnp.uint32(0x55555555), rng.mix_bits(pad_seed)
        )
    if cfg.kind == HALTON:
        pad_seed = rng.hash_combine(pixel, dim, jnp.uint32(cfg.seed))
        log_n = _log2_ceil(cfg.spp)
        idx = ld.owen_shuffle_index(sample, log_n, pad_seed)
        off = pad_seed >> 16
        return ld.radical_inverse(0, idx + off), ld.radical_inverse(1, idx + off)
    if cfg.kind == ZSOBOL:
        px, py = _pixel_xy(cfg, pixel)
        idx = ld.zsobol_shuffled_index(px, py, sample, _log2_ceil(cfg.spp),
                                       dim, jnp.uint32(cfg.seed))
        return ld.owen_scrambled_sobol_2d(
            idx, rng.hash_combine(dim, jnp.uint32(cfg.seed)),
            rng.hash_combine(dim, jnp.uint32(cfg.seed ^ 0x9E377)))
    raise ValueError(f"unknown sampler kind {cfg.kind}")
