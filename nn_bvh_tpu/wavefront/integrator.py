"""Wavefront path-tracing integrators.

This is the TPU re-design of the reference's wavefront backend
(`wavefront/integrator.cpp:290` stage loop): per sample-per-pixel wave, all
pixels form one dense SoA ray batch; the bounce loop unrolls statically and
every stage (camera rays, intersect, escaped/emissive handling, material eval,
shadow rays, film update) is a fused batched op. The reference's atomic
WorkQueue push/pop (`workqueue.h:92`) becomes lane masking — queues never
materialize; XLA fuses the stage pipeline instead. Film accumulation is a
scatter-add (no AtomicFloat).

Integrator semantics implemented:
- SimplePath (cpu/integrators.h:183): uniform light sampling + BSDF sampling,
  no MIS, no Russian roulette. Emission only on specular/first bounces.
- Path (cpu/integrators.h:207): power-heuristic MIS between light and BSDF
  sampling, Russian roulette on throughput (integrators.cpp:828-area).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vecmath as vm, sampling, spectrum, samplers
from ..geometry import scene as scene_mod, triangle
from ..scatter import bxdf, lights
from .. import accel
from . import camera as camera_mod, film as film_mod

Array = jax.Array

# sampler dimension layout per pixel sample (GenerateRaySamples analog,
# wavefront/samples.cpp:19): fixed static schedule
DIM_PIXEL = 0       # 2 dims
DIM_WAVELENGTH = 2  # 1 dim
DIM_LENS = 3        # 2 dims
DIM_PATH_BASE = 5
DIMS_PER_DEPTH = 7  # [bsdf_uc, bsdf_u, bsdf_v, light_select, light_u, light_v, rr]


class IntegratorConfig(NamedTuple):
    max_depth: int = 5
    mis: bool = True              # False = SimplePath semantics
    rr_depth: int = 1             # start RR after this depth (Path only)
    sample_lights: bool = True
    sample_bsdf: bool = True


class ShadingPoint(NamedTuple):
    p: Array       # (R,3) hit position
    ng: Array      # geometric normal (faces the incoming ray side for offsets)
    ns: Array      # interpolated shading normal
    uv: Array      # (R,2)
    mat: Array     # (R,) i32
    prim: Array    # (R,) i32


def _shading_point(scene: scene_mod.CompiledScene, hit: accel.Hit, o: Array, d: Array) -> ShadingPoint:
    prim = jnp.maximum(hit.prim, 0)
    tp = scene.tri_p[prim]
    tn = scene.tri_n[prim]
    tuv = scene.tri_uv[prim]
    b0 = 1.0 - hit.b1 - hit.b2
    p = o + jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)[..., None] * d
    ng = triangle.geometric_normal(tp[..., 0, :], tp[..., 1, :], tp[..., 2, :])
    ns = vm.normalize(
        b0[..., None] * tn[..., 0, :]
        + hit.b1[..., None] * tn[..., 1, :]
        + hit.b2[..., None] * tn[..., 2, :]
    )
    # align shading normal with geometric orientation (interaction.h
    # SurfaceInteraction ctor adjusts ng to ns hemisphere; we keep ng fixed
    # for robust offsets and flip ns if degenerate)
    ns = jnp.where(vm.length_squared(ns)[..., None] < 0.5, ng, ns)
    uv = (
        b0[..., None] * tuv[..., 0, :]
        + hit.b1[..., None] * tuv[..., 1, :]
        + hit.b2[..., None] * tuv[..., 2, :]
    )
    return ShadingPoint(p=p, ng=ng, ns=ns, uv=uv, mat=scene.tri_mat[prim], prim=hit.prim)


def trace_wave(
    scene: scene_mod.CompiledScene,
    dbvh: accel.DeviceBVH,
    cam: camera_mod.Camera,
    sampler_cfg: samplers.SamplerConfig,
    cfg: IntegratorConfig,
    pixel_idx: Array,
    sample_idx: Array,
):
    """Trace one path per entry of pixel_idx. Returns (L, lam, lam_pdf)."""
    R = pixel_idx.shape[0]
    sidx = jnp.broadcast_to(jnp.asarray(sample_idx, jnp.int32), (R,))

    # --- camera rays (kernel 1) ------------------------------------------
    upx, upy = samplers.get_2d(sampler_cfg, pixel_idx, sidx, DIM_PIXEL)
    ulx, uly = samplers.get_2d(sampler_cfg, pixel_idx, sidx, DIM_LENS)
    o, d = camera_mod.generate_rays(
        cam, pixel_idx, jnp.stack([upx, upy], -1), jnp.stack([ulx, uly], -1)
    )

    # --- wavelengths ------------------------------------------------------
    ul = samplers.get_1d(sampler_cfg, pixel_idx, sidx, DIM_WAVELENGTH)
    lam, lam_pdf = spectrum.sample_wavelengths_visible(ul)

    S = spectrum.N_SPECTRUM_SAMPLES
    L = jnp.zeros((R, S), jnp.float32)
    beta = jnp.ones((R, S), jnp.float32)
    active = jnp.ones((R,), bool)
    specular_prev = jnp.ones((R,), bool)  # camera "bounce" counts as specular
    prev_pdf = jnp.ones((R,), jnp.float32)
    prev_p = o
    eta_scale = jnp.ones((R,), jnp.float32)

    n_lights = scene.n_lights
    light_pmf = 1.0 / max(n_lights, 1)

    for depth in range(cfg.max_depth + 1):
        base = DIM_PATH_BASE + depth * DIMS_PER_DEPTH

        t_max = jnp.where(active, 1e30, -1.0)
        hit = accel.intersect_closest(dbvh, scene.tri_p, o, d, t_max)
        found = active & (hit.prim >= 0)

        # --- escaped rays: infinite lights (HandleEscapedRays,
        # wavefront/integrator.cpp:495) --------------------------------------
        escaped = active & (hit.prim < 0)
        if n_lights > 0:
            le_inf = lights.infinite_le(scene, d, lam)
            if cfg.mis and cfg.sample_lights:
                pdf_l = sampling.UNIFORM_SPHERE_PDF * light_pmf
                w_mis = jnp.where(
                    specular_prev,
                    1.0,
                    sampling.power_heuristic(1.0, prev_pdf, 1.0, jnp.full((R,), pdf_l)),
                )
            else:
                w_mis = jnp.where(specular_prev | (not cfg.sample_lights), 1.0, 0.0)
            L = L + jnp.where(escaped[..., None], beta * le_inf * w_mis[..., None], 0.0)
        active = found

        sp = _shading_point(scene, hit, o, d)
        wo = -d

        # --- emissive hits (HandleEmissiveIntersection, integrator.cpp:539) --
        if n_lights > 0:
            le = lights.area_light_l(scene, sp.prim, sp.ng, wo, lam)
            if cfg.mis and cfg.sample_lights:
                lid = scene.tri_light[jnp.maximum(sp.prim, 0)]
                pdf_l = lights.pdf_li(scene, lid, prev_p, d) * light_pmf
                w_mis = jnp.where(
                    specular_prev,
                    1.0,
                    sampling.power_heuristic(1.0, prev_pdf, 1.0, pdf_l),
                )
            else:
                w_mis = jnp.where(specular_prev | (not cfg.sample_lights), 1.0, 0.0)
            L = L + jnp.where(found[..., None], beta * le * w_mis[..., None], 0.0)

        if depth == cfg.max_depth:
            break

        # --- material context -------------------------------------------
        ctx = bxdf.gather_material(scene, sp.mat, lam)
        has_mat = sp.mat >= 0
        active = active & has_mat
        wo_local = vm.to_local(sp.ns, wo)

        # --- direct lighting (SampleLd, integrators.cpp:764 /
        # wavefront TraceShadowRays, integrator.cpp:575) -------------------
        if cfg.sample_lights and n_lights > 0:
            u_sel = samplers.get_1d(sampler_cfg, pixel_idx, sidx, base + 3)
            ulu, ulv = samplers.get_2d(sampler_cfg, pixel_idx, sidx, base + 4)
            light_id = jnp.minimum((u_sel * n_lights).astype(jnp.int32), n_lights - 1)
            ls = lights.sample_li(scene, light_id, sp.p, lam, jnp.stack([ulu, ulv], -1))
            wi_l = ls.wi
            f_l, pdf_b = bxdf.evaluate(ctx, wo_local, vm.to_local(sp.ns, wi_l))
            cos_l = vm.absdot(wi_l, sp.ns)
            want = active & ls.valid & (cos_l > 0) & jnp.any(f_l > 0, axis=-1)
            # shadow ray
            ng_o = vm.face_forward(sp.ng, wi_l)
            so = vm.offset_ray_origin(sp.p, ng_o, wi_l)
            s_tmax = jnp.where(want, jnp.minimum(ls.dist * 0.999, 1e30), -1.0)
            occluded = accel.intersect_any(dbvh, scene.tri_p, so, wi_l, s_tmax)
            pdf_light = ls.pdf * light_pmf
            if cfg.mis:
                w_l = jnp.where(
                    ls.is_delta,
                    1.0,
                    sampling.power_heuristic(1.0, pdf_light, 1.0, pdf_b),
                )
            else:
                w_l = jnp.ones((R,), jnp.float32)
            contrib = beta * f_l * (cos_l * w_l / jnp.maximum(pdf_light, 1e-20))[..., None] * ls.li
            L = L + jnp.where((want & ~occluded)[..., None], contrib, 0.0)

        # --- BSDF sampling / next bounce (EvaluateMaterialsAndBSDFs,
        # surfscatter.cpp:39) ---------------------------------------------
        uc = samplers.get_1d(sampler_cfg, pixel_idx, sidx, base + 0)
        ubu, ubv = samplers.get_2d(sampler_cfg, pixel_idx, sidx, base + 1)
        bs = bxdf.sample(ctx, wo_local, uc, jnp.stack([ubu, ubv], -1))
        wi_world = vm.from_local(sp.ns, bs.wi)
        cos_b = vm.absdot(wi_world, sp.ns)
        beta_new = beta * bs.f * (cos_b / jnp.maximum(bs.pdf, 1e-20))[..., None]
        active = active & bs.valid & jnp.any(beta_new > 0, axis=-1)
        beta = jnp.where(active[..., None], beta_new, beta)
        specular_prev = jnp.where(active, bs.specular, specular_prev)
        prev_pdf = jnp.where(active, bs.pdf, prev_pdf)
        prev_p = jnp.where(active[..., None], sp.p, prev_p)
        eta_scale = jnp.where(active, eta_scale * bs.eta * bs.eta, eta_scale)

        ng_o = vm.face_forward(sp.ng, wi_world)
        o = jnp.where(active[..., None], vm.offset_ray_origin(sp.p, ng_o, wi_world), o)
        d = jnp.where(active[..., None], wi_world, d)

        # --- Russian roulette (Path only; integrators.cpp RR on beta*etaScale)
        if cfg.mis and depth >= cfg.rr_depth:
            u_rr = samplers.get_1d(sampler_cfg, pixel_idx, sidx, base + 6)
            m = jnp.max(beta, axis=-1) * eta_scale
            q = jnp.maximum(0.0, 1.0 - m)
            die = active & (u_rr < q)
            active = active & ~die
            beta = jnp.where(
                active[..., None], beta / jnp.maximum(1.0 - q, 1e-6)[..., None], beta
            )

    return L, lam, lam_pdf


def make_wave_fn(
    scene: scene_mod.CompiledScene,
    dbvh: accel.DeviceBVH,
    cam: camera_mod.Camera,
    sampler_cfg: samplers.SamplerConfig,
    cfg: IntegratorConfig,
):
    """Build the jitted 1-spp wave function: film, sample_idx -> film.

    The scene/BVH arrays are closed over (donated film threads through), the
    static config (image size, depth, sampler kind) is baked into the trace.
    """

    def wave(f: film_mod.Film, sample_idx):
        R = cam.width * cam.height
        pixel_idx = jnp.arange(R, dtype=jnp.int32)
        L, lam, lam_pdf = trace_wave(scene, dbvh, cam, sampler_cfg, cfg, pixel_idx, sample_idx)
        return film_mod.add_samples(f, pixel_idx, L, lam, lam_pdf)

    return jax.jit(wave, donate_argnums=(0,))


def render(
    scene: scene_mod.CompiledScene,
    dbvh: accel.DeviceBVH,
    cam: camera_mod.Camera,
    spp: int = 16,
    sampler: str = "sobol",
    seed: int = 0,
    cfg: IntegratorConfig = IntegratorConfig(),
):
    """Progressive render: one 1-spp wave per jit call (the reference's
    progressive wave loop, cpu/integrators.cpp:162). Returns (H,W,3) linear sRGB."""
    sampler_cfg = samplers.make_sampler(sampler, seed=seed, spp=spp)
    film = film_mod.make_film(cam.height, cam.width)
    wave = make_wave_fn(scene, dbvh, cam, sampler_cfg, cfg)
    for s in range(spp):
        film = wave(film, jnp.int32(s))
    return film_mod.develop(film)
