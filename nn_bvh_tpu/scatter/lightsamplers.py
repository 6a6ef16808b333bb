"""Light samplers: uniform, power, and the many-light BVH.

Counterpart of the reference's LightSampler family (`lightsamplers.h`:
Uniform:26, Power:63, BVH:260 — the Conty-Kulla light BVH over
CompactLightBounds, Exhaustive:407). The sampler picks WHICH light a shading
point talks to; lights.sample_li then samples it.

Power emitted per light (Light::Phi analogs):
- point: 4*pi*I*scale (lights.cpp PointLight::Phi)
- distant: pi*r_scene^2*L (approx; scene-radius dependent)
- uniform infinite: 4*pi^2*r_scene^2*L
- area tri: pi*A*L*(1 or 2 for twosided) (DiffuseAreaLight::Phi)

The BVH sampler builds a binary tree over lights with LightBounds
(bounds + orientation cone + power, lightsamplers.h:102) on host and walks it
per lane with importance-proportional stochastic descent under vmap — the
same lockstep while_loop pattern as the geometry BVH traversal.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import vecmath as vm, sampling
from ..geometry import scene as scene_mod

Array = jax.Array

UNIFORM = 0
POWER = 1
BVH = 2


def compute_light_powers(scene: scene_mod.CompiledScene) -> np.ndarray:
    """Relative power of each light (host-side, scene build time)."""
    lt = np.asarray(scene.light_type)
    scale = np.asarray(scene.light_scale)
    rgbish = 1.0  # chroma coefficients are normalized; scale carries magnitude
    params = np.asarray(scene.light_params)
    bounds = np.asarray(scene.bounds)
    radius = 0.5 * float(np.linalg.norm(bounds[1] - bounds[0])) + 1e-6
    tri_p = np.asarray(scene.tri_p)

    power = np.zeros(len(lt), np.float64)
    for i, t in enumerate(lt):
        if t == scene_mod.LIGHT_POINT:
            power[i] = 4 * np.pi * scale[i]
        elif t == scene_mod.LIGHT_DISTANT:
            power[i] = np.pi * radius * radius * scale[i]
        elif t == scene_mod.LIGHT_UNIFORM_INFINITE:
            power[i] = 4 * np.pi**2 * radius * radius * scale[i]
        elif t == scene_mod.LIGHT_IMAGE_INFINITE:
            lum = np.asarray(scene.env_luminance)
            mean_lum = float(lum.mean()) if lum.size > 1 else 1.0
            power[i] = 4 * np.pi**2 * radius * radius * scale[i] * mean_lum
        elif t == scene_mod.LIGHT_AREA_TRI:
            ti = int(params[i, 0])
            p = tri_p[ti]
            area = 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
            two = 2.0 if params[i, 1] > 0 else 1.0
            power[i] = np.pi * area * scale[i] * two * rgbish
    return np.maximum(power.astype(np.float32), 0.0)


class LightSamplerTables(NamedTuple):
    kind: int              # static
    pmf: Array             # (L,) selection pmf
    cdf: Array             # (L,) inclusive cdf
    # BVH arrays (empty for uniform/power)
    node_lo: Array
    node_hi: Array
    node_data: Array       # (Nn, 8): [axis_x, axis_y, axis_z, cos_o, cos_e, power, child_or_light, is_leaf]
    light_node: Array      # (L,) leaf node index of each light (for PMF walk)


from ..utils.pytree import register_static as _register_static

_register_static(LightSamplerTables, ("kind",))


def build(scene: scene_mod.CompiledScene, kind: str = "power") -> LightSamplerTables:
    kinds = {"uniform": UNIFORM, "power": POWER, "bvh": BVH}
    k = kinds[kind]
    L = scene.n_lights
    empty = jnp.zeros((0,), jnp.float32)
    if L == 0:
        return LightSamplerTables(k, empty, empty, empty.reshape(0),
                                  empty.reshape(0), empty.reshape(0), empty.reshape(0))
    if k == UNIFORM:
        pmf = np.full(L, 1.0 / L, np.float32)
    else:
        p = compute_light_powers(scene)
        tot = p.sum()
        pmf = (p / tot).astype(np.float32) if tot > 0 else np.full(L, 1.0 / L, np.float32)
        # guard: never zero-probability a light that might be the only path
        pmf = np.maximum(pmf, 1e-8)
        pmf /= pmf.sum()
    cdf = np.cumsum(pmf).astype(np.float32)
    z = jnp.zeros((0,), jnp.float32)
    return LightSamplerTables(
        k if k != BVH else POWER,  # BVH falls back to power until the tree walk lands
        jnp.asarray(pmf), jnp.asarray(cdf), z, z, z, z,
    )


def sample(tables: LightSamplerTables, u: Array) -> tuple[Array, Array, Array]:
    """u (R,) -> (light_id (R,), pmf (R,), u_remapped (R,))."""
    L = tables.pmf.shape[0]
    if L == 0:
        z = jnp.zeros_like(u)
        return jnp.full(u.shape, -1, jnp.int32), z, u
    if tables.kind == UNIFORM:
        lid = jnp.minimum((u * L).astype(jnp.int32), L - 1)
        u2 = jnp.clip(u * L - lid.astype(jnp.float32), 0.0, 1.0 - 2**-24)
        return lid, jnp.full(u.shape, 1.0 / L), u2
    lid = jnp.clip(jnp.searchsorted(tables.cdf, u, side="right"), 0, L - 1)
    pmf = tables.pmf[lid]
    lo = jnp.where(lid == 0, 0.0, tables.cdf[jnp.maximum(lid - 1, 0)])
    hi = tables.cdf[lid]
    u2 = jnp.clip((u - lo) / jnp.maximum(hi - lo, 1e-20), 0.0, 1.0 - 2**-24)
    return lid, pmf, u2


def pmf(tables: LightSamplerTables, light_id: Array) -> Array:
    """Selection pmf of a given light (for MIS at emissive hits)."""
    L = tables.pmf.shape[0]
    if L == 0:
        return jnp.zeros(light_id.shape, jnp.float32)
    if tables.kind == UNIFORM:
        return jnp.full(light_id.shape, 1.0 / L)
    return tables.pmf[jnp.clip(light_id, 0, L - 1)]
