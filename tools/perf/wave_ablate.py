"""Ablate wave stages to locate non-traversal cost. Run on TPU."""

import sys
import time

sys.path.insert(0, ".")


def main():
    from nn_bvh_tpu.utils.cache import enable_jax_cache

    enable_jax_cache()
    import jax
    import jax.numpy as jnp
    import bench
    from nn_bvh_tpu.core import samplers
    from nn_bvh_tpu.wavefront import integrator, film as film_mod

    sc, dbvh, bvh, cam = bench.build_bench_scene()
    sampler_cfg = samplers.make_sampler("sobol", seed=0, spp=16)

    def run(tag, **kw):
        cfg = integrator.IntegratorConfig(**kw)
        wave = integrator.make_wave_fn(sc, dbvh, cam, sampler_cfg, cfg)
        film = film_mod.make_film(cam.height, cam.width)
        film = wave(film, jnp.int32(0))
        jax.block_until_ready(film.xyz)
        t0 = time.perf_counter()
        for s in range(1, 4):
            film = wave(film, jnp.int32(s))
        jax.block_until_ready(film.xyz)
        dt = (time.perf_counter() - t0) / 3
        print(f"{tag:44s} {dt*1e3:8.1f} ms", flush=True)

    run("full path depth4 (baseline)", max_depth=4, mis=True, rr_depth=2)
    run("no light sampling (no shadow rays)", max_depth=4, mis=True,
        rr_depth=2, sample_lights=False)
    run("depth 0 (camera+emission only)", max_depth=0, mis=True)
    run("depth 1", max_depth=1, mis=True, rr_depth=2)
    run("depth 2", max_depth=2, mis=True, rr_depth=2)
    run("simplepath depth4 (no MIS, uniform lights)", max_depth=4, mis=False)
    run("light sampler uniform", max_depth=4, mis=True, rr_depth=2,
        light_sampler="uniform")


if __name__ == "__main__":
    main()
