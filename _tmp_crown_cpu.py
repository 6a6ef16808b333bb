import os, numpy as np, jax, jax.numpy as jnp
from nn_bvh_tpu.geometry import pbrt_parser
from nn_bvh_tpu.core import samplers
from nn_bvh_tpu.wavefront import integrator
from nn_bvh_tpu.scatter import lightsamplers

sc, dbvh, cam, res = pbrt_parser.load_scene("/tmp/crown_golden/crown_golden.pbrt")
cam = cam._replace(width=8, height=8)
cfg = integrator.IntegratorConfig(max_depth=2, mis=True, kind="path", use_pallas=False)
scfg = samplers.make_sampler("independent", seed=7, spp=1)
lst = lightsamplers.build(sc, cfg.light_sampler)
R = 64
pix = jnp.arange(R, dtype=jnp.int32)
scd, dbvhd, lsd = jax.tree.map(jnp.asarray, (sc, dbvh, lst))

def loss(coeffs):
    s2 = scd.replace(mat_coeffs=coeffs)
    L, lam, pdf, fw = integrator.trace_wave(s2, dbvhd, cam, scfg, cfg, pix,
                                            jnp.int32(0), lsd)
    return jnp.mean(L), L

(g, L) = jax.grad(loss, has_aux=True)(jnp.asarray(sc.mat_coeffs))
print("L finite:", bool(jnp.all(jnp.isfinite(L))), "mean:", float(jnp.mean(L)))
gn = np.asarray(g)
bad = ~np.isfinite(gn).all(axis=1)
print("grad finite:", bool(np.isfinite(gn).all()), "bad mats:", np.nonzero(bad)[0][:20])
if bad.any():
    print("bad mat types:", np.asarray(sc.mat_type)[bad][:20])
