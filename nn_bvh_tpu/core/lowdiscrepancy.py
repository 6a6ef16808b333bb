"""Low-discrepancy sequences: base-2 Sobol' (0,2)-sequence + Owen scrambling.

TPU-native replacement for the reference's table-driven Sobol machinery
(`util/lowdiscrepancy.h` + 696 KB of `sobolmatrices.cpp`): instead of shipping
1024-dimension direction-number tables, we generate the first two Sobol'
dimensions from their closed-form recurrences and *pad* higher dimensions by
hash-shuffling the sample index per (pixel, dimension) — the design of pbrt's
PaddedSobolSampler (`samplers.h`), which needs exactly these two dimensions.
All ops are 32-bit integer VPU ops; the 32x2 direction table lives in registers.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import rng

Array = jax.Array


def _sobol_direction_numbers() -> np.ndarray:
    """(32, 2) uint32 direction numbers for Sobol' dims 0 and 1.

    dim 0: van der Corput, v_k = 1 << (31-k).
    dim 1: primitive polynomial x+1; recurrence m_k = m_{k-1} ^ (2 m_{k-1}),
    m_1 = 1; v_k = m_k << (32-k). (Standard Sobol'/Joe-Kuo construction.)
    """
    v = np.zeros((32, 2), np.uint32)
    m = 1
    for k in range(32):
        v[k, 0] = np.uint32(1 << (31 - k))
        v[k, 1] = np.uint32((m << (31 - k)) & 0xFFFFFFFF)
        m = m ^ (2 * m)
    return v


_SOBOL_V = jnp.asarray(_sobol_direction_numbers())


def sobol_2d_bits(index: Array) -> tuple[Array, Array]:
    """Sobol' sample `index` for dims (0, 1) as uint32 bit patterns.

    Branch-free matrix-vector product over GF(2): XOR direction numbers where
    the corresponding index bit is set.
    """
    index = jnp.asarray(index, jnp.uint32)
    x = jnp.zeros_like(index)
    y = jnp.zeros_like(index)
    for k in range(32):
        bit = (index >> k) & jnp.uint32(1)
        mask = jnp.where(bit == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
        x = x ^ (_SOBOL_V[k, 0] & mask)
        y = y ^ (_SOBOL_V[k, 1] & mask)
    return x, y


def reverse_bits32(v: Array) -> Array:
    v = jnp.asarray(v, jnp.uint32)
    v = ((v >> 1) & jnp.uint32(0x55555555)) | ((v & jnp.uint32(0x55555555)) << 1)
    v = ((v >> 2) & jnp.uint32(0x33333333)) | ((v & jnp.uint32(0x33333333)) << 2)
    v = ((v >> 4) & jnp.uint32(0x0F0F0F0F)) | ((v & jnp.uint32(0x0F0F0F0F)) << 4)
    v = ((v >> 8) & jnp.uint32(0x00FF00FF)) | ((v & jnp.uint32(0x00FF00FF)) << 8)
    return (v >> 16) | (v << 16)


def fast_owen_scramble(v: Array, seed: Array) -> Array:
    """Laine–Karras style hash-based Owen scramble (reference
    `util/lowdiscrepancy.h` FastOwenScrambler). Input/output are
    *bit-reversed-domain* uint32s; caller reverses around the call."""
    v = jnp.asarray(v, jnp.uint32)
    seed = jnp.asarray(seed, jnp.uint32)
    v ^= v * jnp.uint32(0x3D20ADEA)
    v += seed
    v *= (seed >> 16) | jnp.uint32(1)
    v ^= v * jnp.uint32(0x05526C56)
    v ^= v * jnp.uint32(0x53A22864)
    return v


def owen_scrambled_sobol_2d(index: Array, seed_x: Array, seed_y: Array) -> tuple[Array, Array]:
    """Owen-scrambled Sobol' dims (0,1) -> two float32 arrays in [0,1)."""
    xb, yb = sobol_2d_bits(index)
    xb = reverse_bits32(fast_owen_scramble(reverse_bits32(xb), seed_x))
    yb = reverse_bits32(fast_owen_scramble(reverse_bits32(yb), seed_y))
    return rng.uint32_to_float01(xb), rng.uint32_to_float01(yb)


def owen_shuffle_index(index: Array, n_pow2_log: int, seed: Array) -> Array:
    """Owen-shuffle a sample index within a 2^n block (index padding: decorrelates
    dimension pairs, PaddedSobolSampler semantics)."""
    index = jnp.asarray(index, jnp.uint32)
    shifted = index << (32 - n_pow2_log)
    shuffled = fast_owen_scramble(shifted, jnp.asarray(seed, jnp.uint32))
    return shuffled >> (32 - n_pow2_log)


# ---------------------------------------------------------------------------
# Halton radical inverse (first primes, no permutation tables: hash-perm digits)
# ---------------------------------------------------------------------------

_PRIMES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def radical_inverse(base_index: int, a: Array) -> Array:
    """Radical inverse of integer a in the (base_index)-th prime base
    (reference util/lowdiscrepancy.h RadicalInverse)."""
    base = _PRIMES[base_index]
    inv_base = 1.0 / base
    # the reversed-digit accumulator must stay < 2^32: use
    # n_digits = floor(32/log2(base)) digits and fold the input into range
    # (base^n_digits), otherwise rev overflows uint32 (biased samples)
    n_digits = int(np.floor(32 / np.log2(base)))
    modulus = np.uint32(base**n_digits) if base**n_digits < 2**32 else np.uint32(0)
    a = jnp.asarray(a, jnp.uint32)
    if int(modulus) != 0:
        a = a % modulus

    def body(_, carry):
        a, rev, inv = carry
        digit = a % base
        return a // base, rev * base + digit, inv * inv_base

    a_out, rev, inv = jax.lax.fori_loop(
        0, n_digits, body, (a, jnp.zeros_like(a), jnp.ones_like(a, jnp.float32) * 1.0)
    )
    return jnp.minimum(rev.astype(jnp.float32) * inv, 1.0 - 2**-24)
