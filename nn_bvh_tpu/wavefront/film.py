"""Film: pixel accumulation and develop.

Counterpart of the reference's RGBFilm + PixelSensor (`film.h:232,36`). The
reference accumulates with per-pixel atomics (AtomicFloat splats); here film
accumulation is a scatter-add over flat pixel indices — order-independent and
deterministic, which is what makes the multi-device psum reduction exact
(SURVEY.md §5.8).

Film state is a pytree so it shards/donates cleanly through jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import colorspace, spectrum

Array = jax.Array


class Film(NamedTuple):
    xyz: Array      # (H*W, 3) weighted XYZ sums
    weight: Array   # (H*W,) filter-weight sums
    splat_xyz: Array  # (H*W, 3) splat accumulation (AddSplat path for BDPT/light tracing)
    height: int
    width: int


from ..utils.pytree import register_static as _register_static

_register_static(Film, ("height", "width"))


def make_film(height: int, width: int) -> Film:
    n = height * width
    return Film(
        xyz=jnp.zeros((n, 3), jnp.float32),
        weight=jnp.zeros((n,), jnp.float32),
        splat_xyz=jnp.zeros((n, 3), jnp.float32),
        height=height,
        width=width,
    )


def add_samples(film: Film, pixel_idx: Array, L: Array, lam: Array, lam_pdf: Array,
                filter_weight: Array | None = None, sequential: bool = False) -> Film:
    """Accumulate spectral radiance samples (RGBFilm::AddSample analog).

    pixel_idx: (R,) flat indices; L: (R,4); lam/lam_pdf: (R,4).
    With filter importance sampling (the reference's FilterSampler), the
    filter weight is constant 1 — jitter position carries the filter.

    sequential=True asserts pixel_idx == arange(H*W) (the standard one-sample-
    per-pixel wave) and skips the scatter — a plain vector add, which avoids
    the TPU's slow scatter path.
    """
    xyz = spectrum.spectrum_to_xyz(L, lam, lam_pdf)
    w = jnp.ones(pixel_idx.shape, jnp.float32) if filter_weight is None else filter_weight
    # clamp NaN/inf defensively (film.h RGBFilm max-component clamp)
    xyz = jnp.where(jnp.isfinite(xyz), xyz, 0.0)
    if sequential:
        new_xyz = film.xyz + xyz * w[..., None]
        new_w = film.weight + w
    else:
        new_xyz = film.xyz.at[pixel_idx].add(xyz * w[..., None])
        new_w = film.weight.at[pixel_idx].add(w)
    return film._replace(xyz=new_xyz, weight=new_w)


def add_splats(film: Film, pixel_idx: Array, L: Array, lam: Array, lam_pdf: Array) -> Film:
    xyz = spectrum.spectrum_to_xyz(L, lam, lam_pdf)
    xyz = jnp.where(jnp.isfinite(xyz), xyz, 0.0)
    return film._replace(splat_xyz=film.splat_xyz.at[pixel_idx].add(xyz))


def develop(film: Film, splat_scale: float = 1.0) -> Array:
    """-> (H, W, 3) linear sRGB (white-balanced sensor response,
    RGBFilm::GetImage)."""
    w = jnp.maximum(film.weight, 1e-9)[:, None]
    xyz = film.xyz / w + splat_scale * film.splat_xyz
    rgb = colorspace.xyz_to_linear_srgb(xyz)
    return rgb.reshape(film.height, film.width, 3)


def merge(films: list[Film]) -> Film:
    """Sum partial films (the psum analog for host-side combination)."""
    out = films[0]
    for f in films[1:]:
        out = out._replace(
            xyz=out.xyz + f.xyz,
            weight=out.weight + f.weight,
            splat_xyz=out.splat_xyz + f.splat_xyz,
        )
    return out
