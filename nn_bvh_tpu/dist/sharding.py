"""Multi-device execution: ray/tile sharding over a jax Mesh.

The reference's entire parallel backend is a single-node thread pool
(`util/parallel.h:313` ThreadPool + ParallelFor2D tile scheduler,
cpu/integrators.cpp:164). The TPU-native design (SURVEY.md §2.10, §5.8):

- the *ray/pixel axis* shards across devices (the renderer analog of DP+SP),
- the scene (geometry, BVH, materials, lights) is replicated per device,
- film accumulation is a scatter-add into a per-device partial film followed
  by a `psum` over the mesh — the collective replacement for AtomicFloat film
  splats (parallel.h:126),
- gradients (treeNet/material) psum over the same mesh axis.

Multi-host: the same code runs under jax.distributed with a global mesh; the
driver validates via xla_force_host_platform_device_count.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import samplers, spectrum
from ..geometry import scene as scene_mod
from ..wavefront import camera as camera_mod, film as film_mod, integrator
from .. import accel

Array = jax.Array

RAY_AXIS = "rays"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (RAY_AXIS,))


def render_sharded(
    scene: scene_mod.CompiledScene,
    dbvh: accel.DeviceBVH,
    cam: camera_mod.Camera,
    mesh: Mesh,
    spp: int = 16,
    sampler: str = "sobol",
    seed: int = 0,
    cfg: integrator.IntegratorConfig = integrator.IntegratorConfig(),
):
    """Render with the pixel axis sharded over `mesh`. Returns (H,W,3) linear sRGB."""
    n_dev = mesh.devices.size
    R = cam.width * cam.height
    if R % n_dev != 0:
        raise ValueError(f"pixel count {R} must divide device count {n_dev}")
    sampler_cfg = samplers.make_sampler(sampler, seed=seed, spp=spp)
    from ..scatter import lightsamplers

    ls_tables = lightsamplers.build(scene, cfg.light_sampler)
    scene, dbvh, ls_tables = jax.tree.map(jnp.asarray, (scene, dbvh, ls_tables))
    scene_spec = jax.tree.map(lambda _: P(), (scene, dbvh, ls_tables))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(scene_spec, P(RAY_AXIS), P()),
        out_specs=(P(), P()),
    )
    def wave(scene_and_bvh, pixel_idx_local, sample_idx):
        sc, bvh, lst = scene_and_bvh
        L, lam, lam_pdf, fw = integrator.trace_wave(
            sc, bvh, cam, sampler_cfg, cfg, pixel_idx_local, sample_idx, lst
        )
        # per-device partial film -> psum (the film reduction over ICI)
        f = film_mod.make_film(cam.height, cam.width)
        f = film_mod.add_samples(f, pixel_idx_local, L, lam, lam_pdf,
                                 filter_weight=fw)
        return (
            jax.lax.psum(f.xyz, RAY_AXIS),
            jax.lax.psum(f.weight, RAY_AXIS),
        )

    wave_jit = jax.jit(wave)
    pixel_idx = jnp.arange(R, dtype=jnp.int32)
    film = film_mod.make_film(cam.height, cam.width)
    xyz = film.xyz
    weight = film.weight
    for s in range(spp):
        dx, dw = wave_jit((scene, dbvh, ls_tables), pixel_idx, jnp.int32(s))
        xyz = xyz + dx
        weight = weight + dw
    film = film._replace(xyz=xyz, weight=weight)
    return film_mod.develop(film)
