import os, sys, numpy as np, jax, jax.numpy as jnp
from nn_bvh_tpu.utils.cache import enable_jax_cache
enable_jax_cache()
from nn_bvh_tpu.geometry import pbrt_parser
from nn_bvh_tpu.core import samplers
from nn_bvh_tpu.wavefront import integrator
from nn_bvh_tpu.scatter import lightsamplers
from nn_bvh_tpu.accel import dispatch

sc, dbvh, cam, res = pbrt_parser.load_scene("/tmp/crown_golden/crown_golden.pbrt")
cam = cam._replace(width=64, height=64)
ls = lightsamplers.build(sc, "power")
isect = dispatch.make_intersectors(sc, dbvh)
scd, dbvhd, lsd = jax.tree.map(jnp.asarray, (sc, dbvh, ls))
pix = jnp.zeros((8,), jnp.int32)
sampler_cfg = samplers.make_sampler("independent", seed=7, spp=2)

def run(tag, **kw):
    cfg = integrator.IntegratorConfig(max_depth=4, mis=True, kind="path", **kw)
    def loss(coeffs, tables, scd, dbvhd, lsd):
        s2 = scd.replace(mat_coeffs=coeffs)
        bi = isect.bind(tables)
        total = jnp.float32(0.0)
        for s in range(2):
            L, lam, lam_pdf, fw = integrator.trace_wave(
                s2, dbvhd, cam, sampler_cfg, cfg, pix, jnp.int32(s), lsd, bi)
            total = total + jnp.mean(L)
        return total
    g = jax.jit(jax.grad(loss))(jnp.asarray(sc.mat_coeffs), isect.tables,
                                scd, dbvhd, lsd)
    print(tag, "finite:", bool(jnp.all(jnp.isfinite(g))), flush=True)

run("baseline")
run("no-lights", sample_lights=False)
