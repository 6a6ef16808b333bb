"""Subsurface scattering stage for the wavefront integrator.

Counterpart of the reference's probe-ray machinery
(`wavefront/subsurface.cpp:18` SampleSubsurface, `gpu/optix.cu:480`
__raygen__randomHit, `bssrdf.h:105` TabulatedBSSRDF::SampleSp/PDF_Sp):

- entry: the SubsurfaceMaterial's smooth dielectric interface — with
  probability Fr(wo) the lane becomes a mirror reflection, else it enters.
- probe: choose an axis frame (.5 ns / .25 t1 / .25 t2), a wavelength
  channel (1/4), a radius r ~ Sr via the beam-diffusion CDF; cast a probe
  segment of length 2h through the sample disc and RESERVOIR-pick uniformly
  among up to K hits on the same material (IntersectOneRandom semantics,
  realized as K iterated closest-hit marches — no new traversal kernel).
- weight: Sp(po,pi) * n_hits / PDF_Sp with the 3-axis x 4-channel MIS pdf
  (bssrdf.h PDF_Sp), applied to beta.
- exit: the shading point moves to the probe hit; the continuation BSDF is
  the PDF-normalized Fresnel lobe (MAT_SSS_EXIT in scatter/bxdf.py), which
  both the NEE block and BSDF sampling then use at the exit point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import vecmath as vm, rng, rgb2spec
from ..geometry import scene as scene_mod
from ..scatter import bxdf, bssrdf as bss
from .. import accel

Array = jax.Array

N_PROBE = 3  # iterated closest-hit marches per probe segment


def _sss_table(scene, s: int) -> bss.BSSRDFTable:
    return bss.BSSRDFTable(
        rho=scene.sss_rho, radius=scene.sss_radius,
        profile=scene.sss_profile[s], cdf=scene.sss_cdf[s],
        rho_eff=scene.sss_rho_eff[s])


def _per_material(scene, sssid, fn):
    """Evaluate fn(table_s) for each sss material and select per lane —
    S is tiny (one table per SubsurfaceMaterial), so an unrolled select
    beats per-lane gathers of whole (64,64) tables."""
    S = scene.sss_g.shape[0]
    out = fn(_sss_table(scene, 0))
    for s in range(1, S):
        val = fn(_sss_table(scene, s))
        sel = sssid == s
        out = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(sel, sel.shape + (1,) * (a.ndim - sel.ndim)), b, a),
            out, val)
    return out


def transition(scene, isect_closest, shading_point_fn, sp, wo, wo_local, ctx,
               lam, beta, active, pixel_idx, sidx, depth):
    """Resolve MAT_SUBSURFACE lanes: mirror at the interface or move the
    shading point through the medium to a sampled exit point.

    Returns (sp, ctx, wo_local, beta, active)."""
    is_sss = active & (ctx.mat_type == scene_mod.MAT_SUBSURFACE)

    d32 = jnp.asarray(depth, jnp.uint32)
    u_entry = rng.hash_float(pixel_idx, sidx, d32, jnp.uint32(0x5501))
    u_axis = rng.hash_float(pixel_idx, sidx, d32, jnp.uint32(0x5502))
    u_ch = rng.hash_float(pixel_idx, sidx, d32, jnp.uint32(0x5503))
    u_r = rng.hash_float(pixel_idx, sidx, d32, jnp.uint32(0x5504))
    u_phi = rng.hash_float(pixel_idx, sidx, d32, jnp.uint32(0x5505))

    fr = bxdf.fr_dielectric(vm.abs_cos_theta(wo_local), ctx.eta)
    enter = is_sss & (u_entry >= fr)
    mirror = is_sss & ~enter

    # --- per-lane scattering coefficients at the sampled wavelengths ------
    sssid = scene.mat_params[jnp.maximum(sp.mat, 0), 3].astype(jnp.int32)
    sssid = jnp.clip(sssid, 0, scene.sss_g.shape[0] - 1)
    ca = scene.sss_coeffs_a[sssid]
    cs = scene.sss_coeffs_s[sssid]
    sig_a = rgb2spec.eval_sigmoid_poly(ca, lam) * scene.sss_scale_a[sssid][..., None]
    sig_s = rgb2spec.eval_sigmoid_poly(cs, lam) * scene.sss_scale_s[sssid][..., None]
    sigma_t = sig_a + sig_s                       # (R,4)
    rho = sig_s / jnp.maximum(sigma_t, 1e-9)      # (R,4)

    # --- channel + axis + radius (SampleSp, bssrdf.h) ---------------------
    S = 4
    ch = jnp.clip((u_ch * S).astype(jnp.int32), 0, S - 1)
    st_ch = jnp.take_along_axis(sigma_t, ch[..., None], -1)[..., 0]
    rho_ch = jnp.take_along_axis(rho, ch[..., None], -1)[..., 0]

    def samp(t):
        rr, pp, _ = bss.sr_sample(t, st_ch, rho_ch, u_r)
        rm = bss.r_max(t, st_ch, rho_ch)
        return (rr, rm)
    r, rmax = _per_material(scene, sssid, samp)
    r = jnp.minimum(r, rmax * 0.999)
    h = jnp.sqrt(jnp.maximum(rmax * rmax - r * r, 0.0))

    ns = sp.ns
    t1, t2 = vm.coordinate_system(ns)
    # axis frame: (va, vb, axis) with probabilities .5 / .25 / .25
    ax_sel = jnp.where(u_axis < 0.5, 0, jnp.where(u_axis < 0.75, 1, 2))
    axis_v = jnp.where((ax_sel == 0)[..., None], ns,
                       jnp.where((ax_sel == 1)[..., None], t1, t2))
    va = jnp.where((ax_sel == 0)[..., None], t1,
                   jnp.where((ax_sel == 1)[..., None], t2, ns))
    vb = jnp.where((ax_sel == 0)[..., None], t2,
                   jnp.where((ax_sel == 1)[..., None], ns, t1))

    phi = 2.0 * jnp.pi * u_phi
    disc = (r * jnp.cos(phi))[..., None] * va + (r * jnp.sin(phi))[..., None] * vb
    p_start = sp.p + disc + h[..., None] * axis_v
    d_probe = -axis_v
    seg_len = 2.0 * h

    # --- iterated closest-hit march with same-material reservoir ---------
    o_k = p_start
    t_rem = jnp.where(enter, seg_len, -1.0)
    n_found = jnp.zeros_like(u_r, jnp.int32)
    best_prim = jnp.full_like(n_found, -1)
    best_b1 = jnp.zeros_like(u_r)
    best_b2 = jnp.zeros_like(u_r)
    best_p = sp.p
    eps = 1e-4 * jnp.maximum(seg_len, 1.0)
    for k in range(N_PROBE):
        hit = isect_closest(o_k, d_probe, t_rem)
        found = enter & (hit.prim >= 0)
        hmat = scene.tri_shade[jnp.maximum(hit.prim, 0), 24].astype(jnp.int32)
        same = found & (hmat == sp.mat)
        n_new = n_found + same.astype(jnp.int32)
        u_k = rng.hash_float(pixel_idx, sidx, d32, jnp.uint32(0x5510 + k))
        take = same & (u_k * n_new.astype(jnp.float32)
                       < jnp.ones_like(u_k))
        p_hit = o_k + jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)[..., None] * d_probe
        best_prim = jnp.where(take, hit.prim, best_prim)
        best_b1 = jnp.where(take, hit.b1, best_b1)
        best_b2 = jnp.where(take, hit.b2, best_b2)
        best_p = jnp.where(take[..., None], p_hit, best_p)
        n_found = n_new
        # march past the hit
        step = jnp.where(jnp.isfinite(hit.t), hit.t, 0.0) + eps
        o_k = jnp.where(found[..., None], o_k + step[..., None] * d_probe, o_k)
        t_rem = jnp.where(found, t_rem - step, -1.0)

    ok = enter & (n_found > 0)

    # --- exit shading point ----------------------------------------------
    exit_hit = accel.Hit(t=jnp.zeros_like(u_r), prim=jnp.maximum(best_prim, 0),
                         b1=best_b1, b2=best_b2)
    sp_exit = shading_point_fn(scene, exit_hit, best_p, d_probe)
    sp_exit = sp_exit._replace(p=best_p)

    # --- Sp / PDF_Sp ------------------------------------------------------
    dist = vm.length(best_p - sp.p)
    sp_val = _per_material(
        scene, sssid,
        lambda t: bss.sr_eval(t, sigma_t, rho, dist[..., None]))  # (R,4)

    d_vec = sp.p - best_p
    d_local = jnp.stack([vm.dot(ns, d_vec), vm.dot(t1, d_vec),
                         vm.dot(t2, d_vec)], -1)
    n_exit = sp_exit.ns
    n_local = jnp.abs(jnp.stack([vm.dot(ns, n_exit), vm.dot(t1, n_exit),
                                 vm.dot(t2, n_exit)], -1))
    r_proj = jnp.stack([
        jnp.sqrt(d_local[..., 1] ** 2 + d_local[..., 2] ** 2),
        jnp.sqrt(d_local[..., 2] ** 2 + d_local[..., 0] ** 2),
        jnp.sqrt(d_local[..., 0] ** 2 + d_local[..., 1] ** 2)], -1)
    ax_prob = jnp.asarray([0.5, 0.25, 0.25], jnp.float32)
    pdf = jnp.zeros_like(u_r)
    for a in range(3):
        for c in range(4):
            pdf_rc = _per_material(
                scene, sssid,
                lambda t, a=a, c=c: bss.sr_pdf(t, sigma_t[..., c],
                                               rho[..., c], r_proj[..., a]))
            pdf = pdf + ax_prob[a] * 0.25 * pdf_rc * n_local[..., a]
    w_sp = sp_val * (n_found.astype(jnp.float32)
                     / jnp.maximum(pdf, 1e-12))[..., None]
    w_sp = jnp.where(jnp.isfinite(w_sp), w_sp, 0.0)

    # --- merge ------------------------------------------------------------
    okn = ok[..., None]
    sp = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(ok, ok.shape + (1,) * (a.ndim - ok.ndim)), b, a),
        sp, sp_exit)
    beta = jnp.where(okn, beta * w_sp, beta)
    active = active & (~enter | ok)

    # exit lanes: PDF-normalized Fresnel lobe; mirror lanes: perfect mirror
    new_type = jnp.where(ok, scene_mod.MAT_SSS_EXIT,
                         jnp.where(mirror, scene_mod.MAT_CONDUCTOR,
                                   ctx.mat_type))
    big_k = jnp.where(mirror, 1e6, ctx.k)
    refl1 = jnp.where((ok | mirror)[..., None], jnp.ones_like(ctx.refl),
                      ctx.refl)
    zero_a = jnp.where(ok | mirror, 0.0, ctx.ax)
    ctx = ctx._replace(mat_type=new_type, k=big_k, refl=refl1,
                       ax=zero_a, ay=zero_a)
    # exit wo: along the exit normal (cos = 1); NEE + BSDF sampling then run
    # in the exit frame
    wo_local = jnp.where(okn, jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0]), wo_local.shape), wo_local)
    return sp, ctx, wo_local, beta, active
