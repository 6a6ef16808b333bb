#!/usr/bin/env python
"""On-chip determinism gate: same seed => bit-identical image, REAL kernels.

tests/test_determinism.py runs with use_pallas=False on the CPU CI box, so
its bit-identical guarantee covers the XLA fallback, not the Pallas packet
kernels the chip actually executes (VERDICT r4 weak #9). This tool runs the
same-seed check on the attached TPU with the default (Pallas BVH4)
traversal + the wavefront integrator, twice in fresh jit contexts, and
prints ONE JSON line for BASELINE.md.

Usage: python tools/determinism_chip.py
"""

import json
import sys

sys.path.insert(0, ".")


def main():
    from nn_bvh_tpu.utils.cache import enable_jax_cache

    enable_jax_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import bench
    from nn_bvh_tpu.core import samplers
    from nn_bvh_tpu.wavefront import integrator, film as film_mod

    assert jax.devices()[0].platform != "cpu", "run on the TPU chip"
    sc, dbvh, bvh, cam = bench.build_bench_scene()
    cam = cam._replace(width=256, height=256)
    cfg = integrator.IntegratorConfig(max_depth=4, mis=True, rr_depth=2)

    imgs = []
    for run in range(2):
        sampler_cfg = samplers.make_sampler("sobol", seed=7, spp=4,
                                            width=cam.width)
        wave = integrator.make_wave_fn(sc, dbvh, cam, sampler_cfg, cfg)
        film = film_mod.make_film(cam.height, cam.width)
        for s in range(4):
            film = wave(film, jnp.int32(s))
        imgs.append(np.asarray(film_mod.develop(film)))
        jax.clear_caches()

    identical = bool((imgs[0] == imgs[1]).all())
    print(json.dumps({
        "metric": "onchip_same_seed_bit_identical",
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "value": identical,
        "max_abs_diff": float(np.abs(imgs[0] - imgs[1]).max()),
        "mean": float(imgs[0].mean()),
    }))
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
