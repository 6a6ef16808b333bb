"""Per-stage traversal profiling on the attached accelerator.

Measures, on the bench scene (65k tris):
  - closest-hit on camera rays / diffuse-bounce rays / incoherent rays
  - any-hit (shadow) on bounce-origin rays
  - the (octant,Morton) argsort cost alone
  - one full Path wave for reference

Run:  python tools/perf/trav_prof.py [backend]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, *args, reps=8):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    from nn_bvh_tpu.utils.cache import enable_jax_cache

    enable_jax_cache()
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    import bench
    from nn_bvh_tpu.accel import dispatch, pallas_traverse

    sc, dbvh, bvh, cam = bench.build_bench_scene()
    print(f"tris={sc.tri_p.shape[0]} nodes={dbvh.n_nodes}", flush=True)

    R = cam.width * cam.height
    rs = np.random.RandomState(1)

    # camera rays
    from nn_bvh_tpu.wavefront import camera as camera_mod
    pix = jnp.arange(R, dtype=jnp.int32)
    u_pix = jnp.asarray(rs.rand(R, 2), jnp.float32)
    o_cam, d_cam = camera_mod.generate_rays(cam, pix, u_pix,
                                            jnp.zeros((R, 2), jnp.float32))
    t_inf = jnp.full((R,), 1e30, jnp.float32)

    isect = dispatch.make_intersectors(sc, dbvh, sort=True)
    print("backend:", isect.backend, flush=True)
    bi = isect.bind()
    closest = jax.jit(bi.closest)
    anyh = jax.jit(bi.any_hit)
    # unsorted variants
    bi_ns = dispatch.Intersectors(isect.backend, isect.tables, isect.bounds,
                                  sort=False).bind()
    closest_ns = jax.jit(bi_ns.closest)
    anyh_ns = jax.jit(bi_ns.any_hit)

    dt, hit_cam = timed(closest, o_cam, d_cam, t_inf)
    print(f"camera closest (sorted):   {dt*1e3:8.2f} ms  {R/dt/1e6:7.1f} Mray/s")

    # diffuse bounce rays from the camera hits
    hit_cam = jax.tree.map(np.asarray, hit_cam)
    t = np.where(np.isfinite(hit_cam.t), hit_cam.t, 0.0)
    p = np.asarray(o_cam) + np.asarray(d_cam) * t[:, None]
    found = hit_cam.prim >= 0
    # cosine-hemisphere around +y-ish random normals (approx): good enough to
    # reproduce in-render divergence
    v = rs.randn(R, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    o_b = jnp.asarray(np.where(found[:, None], p + 1e-3 * v, 0.0), jnp.float32)
    d_b = jnp.asarray(v, jnp.float32)
    tb = jnp.asarray(np.where(found, 1e30, -1.0), jnp.float32)
    frac_live = float(found.mean())

    dt, _ = timed(closest, o_b, d_b, tb)
    print(f"bounce closest (sorted):   {dt*1e3:8.2f} ms  {R/dt/1e6:7.1f} Mray/s  (live {frac_live:.2f})")
    dt, _ = timed(closest_ns, o_b, d_b, tb)
    print(f"bounce closest (unsorted): {dt*1e3:8.2f} ms  {R/dt/1e6:7.1f} Mray/s")

    # shadow rays: hit points -> area light at (0,6,0)
    to_l = np.array([0, 6, 0.0]) + rs.rand(R, 3) * np.array([4, 0, 4]) - np.array([2, 0, 2]) - p
    dist = np.linalg.norm(to_l, axis=1) + 1e-9
    d_s = jnp.asarray(to_l / dist[:, None], jnp.float32)
    t_s = jnp.asarray(np.where(found, dist * 0.999, -1.0), jnp.float32)
    dt, _ = timed(anyh, jnp.asarray(p, jnp.float32), d_s, t_s)
    print(f"shadow any (sorted):       {dt*1e3:8.2f} ms  {R/dt/1e6:7.1f} Mray/s")
    dt, _ = timed(anyh_ns, jnp.asarray(p, jnp.float32), d_s, t_s)
    print(f"shadow any (unsorted):     {dt*1e3:8.2f} ms  {R/dt/1e6:7.1f} Mray/s")

    # fully incoherent rays inside scene bounds
    o_i = jnp.asarray((rs.rand(R, 3) - 0.5) * np.array([12, 4, 12]) + np.array([0, 2, 0]), jnp.float32)
    v = rs.randn(R, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    dt, _ = timed(closest, o_i, jnp.asarray(v), t_inf)
    print(f"incoherent closest(sorted):{dt*1e3:8.2f} ms  {R/dt/1e6:7.1f} Mray/s")

    # sort cost alone
    blo = jnp.asarray(sc.bounds[0], jnp.float32)
    bext = jnp.asarray(sc.bounds[1], jnp.float32) - blo

    @jax.jit
    def sort_only(o, d, tm):
        k = pallas_traverse.ray_sort_key(o, d, blo, bext, tm)
        order = jnp.argsort(k)
        inv = jnp.argsort(order)
        return o[order][inv]

    dt, _ = timed(sort_only, o_b, d_b, tb)
    print(f"sort+unsort alone:         {dt*1e3:8.2f} ms")

    # full wave for reference
    from nn_bvh_tpu.core import samplers
    from nn_bvh_tpu.wavefront import integrator, film as film_mod

    cfg = integrator.IntegratorConfig(max_depth=4, mis=True, rr_depth=2)
    sampler_cfg = samplers.make_sampler("sobol", seed=0, spp=16)
    wave = integrator.make_wave_fn(sc, dbvh, cam, sampler_cfg, cfg)
    film = film_mod.make_film(cam.height, cam.width)
    film = wave(film, jnp.int32(0))
    jax.block_until_ready(film.xyz)
    t0 = time.perf_counter()
    for s in range(1, 4):
        film = wave(film, jnp.int32(s))
    jax.block_until_ready(film.xyz)
    dt = (time.perf_counter() - t0) / 3
    print(f"full wave (depth 4):       {dt*1e3:8.2f} ms  -> {R*9/dt/1e6:.2f} Mray/s")


if __name__ == "__main__":
    main()
