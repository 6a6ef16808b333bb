"""BxDF evaluation/sampling over ray batches.

Counterpart of the reference's BxDF tagged-pointer family (`base/bxdf.h:166`,
impls `bxdfs.h/cpp`): DiffuseBxDF, ConductorBxDF (smooth + rough
Trowbridge-Reitz), DielectricBxDF (smooth + rough). All functions operate in
the local shading frame (+z = shading normal) over (...,)-batched lanes, and
dispatch on per-lane material type tags with masked selects — the lane-level
analog of TaggedPointer::Dispatch.

Spectral: every f/reflectance is (..., 4) over the sampled wavelengths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import vecmath as vm, sampling
from ..geometry import scene as scene_mod

Array = jax.Array

INV_PI = sampling.INV_PI


class BSDFSample(NamedTuple):
    wi: Array        # (..., 3) local
    f: Array         # (..., 4) spectral value
    pdf: Array       # (...,)
    specular: Array  # (...,) bool — delta component sampled
    transmission: Array  # (...,) bool — crossed the surface
    eta: Array       # (...,) relative IOR carried by the path (for etaScale)
    valid: Array     # (...,) bool


# ---------------------------------------------------------------------------
# Fresnel (bxdfs.h FrDielectric / FrComplex)
# ---------------------------------------------------------------------------

def fr_dielectric(cos_i: Array, eta: Array) -> Array:
    """Unpolarized Fresnel reflectance for dielectrics (real eta)."""
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    flip = cos_i < 0
    eta = jnp.where(flip, 1.0 / eta, eta)
    cos_i = jnp.abs(cos_i)
    sin2_i = 1.0 - cos_i * cos_i
    sin2_t = sin2_i / (eta * eta)
    tir = sin2_t >= 1.0
    cos_t = vm.safe_sqrt(1.0 - sin2_t)
    r_parl = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-9)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-9)
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fr_complex(cos_i: Array, eta: Array, k: Array) -> Array:
    """Fresnel for conductors with complex IOR eta - i k (scalar approx of the
    reference's per-wavelength FrComplex; spectral eta/k tables can slot in)."""
    cos_i = jnp.clip(jnp.abs(cos_i), 0.0, 1.0)
    cos2 = cos_i * cos_i
    sin2 = 1.0 - cos2
    eta2, k2 = eta * eta, k * k
    t0 = eta2 - k2 - sin2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * k2, 0.0))
    t1 = a2b2 + cos2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * cos_i
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-9)
    t3 = cos2 * a2b2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-9)
    return jnp.clip(0.5 * (rp + rs), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Trowbridge-Reitz (GGX) microfacet distribution (bxdfs.h TrowbridgeReitzDistribution)
# ---------------------------------------------------------------------------

def fresnel_moment1(eta: Array) -> Array:
    """First moment of Fresnel reflectance (polynomial fits, the
    FresnelMoment1 of bssrdf.cpp / PBR book 11.4.1) — jnp, branch-free."""
    e2, e3, e4, e5 = eta**2, eta**3, eta**4, eta**5
    lo = (0.45966 - 1.73965 * eta + 3.37668 * e2 - 3.904945 * e3
          + 2.49277 * e4 - 0.68441 * e5)
    hi = (-4.61686 + 11.1136 * eta - 10.4646 * e2 + 5.11455 * e3
          - 1.27198 * e4 + 0.12746 * e5)
    return jnp.where(eta < 1.0, lo, hi)


def sss_exit_f(eta: Array, abs_cos_i: Array) -> Array:
    """NormalizedFresnelBxDF value (bssrdf.h Sw): (1 - Fr(cos, eta))/(c pi),
    the PDF-normalized diffusion exit lobe."""
    c = 1.0 - 2.0 * fresnel_moment1(1.0 / eta)
    return (1.0 - fr_dielectric(abs_cos_i, eta)) / jnp.maximum(
        c * jnp.pi, 1e-6)


def tr_d(wm: Array, ax: Array, ay: Array) -> Array:
    t2 = vm.tan2_theta(wm)
    c4 = vm.cos2_theta(wm) ** 2
    e = (vm.cos_phi(wm) ** 2 / jnp.maximum(ax * ax, 1e-12)
         + vm.sin_phi(wm) ** 2 / jnp.maximum(ay * ay, 1e-12)) * t2
    d = 1.0 / jnp.maximum(jnp.pi * ax * ay * c4 * (1.0 + e) ** 2, 1e-20)
    return jnp.where(jnp.isfinite(t2), d, 0.0)


def tr_lambda(w: Array, ax: Array, ay: Array) -> Array:
    t2 = vm.tan2_theta(w)
    a2 = vm.cos_phi(w) ** 2 * ax * ax + vm.sin_phi(w) ** 2 * ay * ay
    lam = 0.5 * (jnp.sqrt(1.0 + a2 * t2) - 1.0)
    return jnp.where(jnp.isfinite(t2), lam, 0.0)


def tr_g1(w: Array, ax: Array, ay: Array) -> Array:
    return 1.0 / (1.0 + tr_lambda(w, ax, ay))


def tr_g(wo: Array, wi: Array, ax: Array, ay: Array) -> Array:
    return 1.0 / (1.0 + tr_lambda(wo, ax, ay) + tr_lambda(wi, ax, ay))


def tr_d_visible(w: Array, wm: Array, ax: Array, ay: Array) -> Array:
    return (
        tr_g1(w, ax, ay)
        / jnp.maximum(vm.abs_cos_theta(w), 1e-9)
        * tr_d(wm, ax, ay)
        * vm.absdot(w, wm)
    )


def tr_sample_wm(w: Array, u: Array, ax: Array, ay: Array) -> Array:
    """Sample visible normals (Heitz 2018; bxdfs.h Sample_wm)."""
    wh = vm.normalize(
        jnp.stack([ax * w[..., 0], ay * w[..., 1], w[..., 2]], axis=-1)
    )
    wh = jnp.where(wh[..., 2:3] < 0, -wh, wh)
    t1 = jnp.where(
        (jnp.abs(wh[..., 2]) < 0.999)[..., None],
        vm.normalize(vm.cross(jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wh.shape), wh)),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), wh.shape),
    )
    t2 = vm.cross(wh, t1)
    p = sampling.sample_uniform_disk_concentric(u)
    h = vm.safe_sqrt(1.0 - p[..., 0] ** 2)
    py = vm.lerp((1.0 + wh[..., 2]) / 2.0, h, p[..., 1])
    pz = vm.safe_sqrt(1.0 - p[..., 0] ** 2 - py**2)
    nh = p[..., 0:1] * t1 + py[..., None] * t2 + pz[..., None] * wh
    return vm.normalize(
        jnp.stack(
            [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(1e-6, nh[..., 2])], axis=-1
        )
    )


def tr_pdf(wo: Array, wm: Array, ax: Array, ay: Array) -> Array:
    return tr_d_visible(wo, wm, ax, ay)


def roughness_to_alpha(r: Array) -> Array:
    """pbrt-v4 uses alpha = sqrt(roughness) by default in its material layer."""
    return jnp.sqrt(jnp.maximum(r, 0.0))


def effectively_smooth(ax: Array, ay: Array) -> Array:
    return jnp.maximum(ax, ay) < 1e-3


# ---------------------------------------------------------------------------
# lane-dispatched BSDF over the material table
# ---------------------------------------------------------------------------

class MaterialCtx(NamedTuple):
    """Per-lane shading inputs gathered from the material table."""

    mat_type: Array   # (...,) i32
    refl: Array       # (..., 4) spectral base color at sampled wavelengths
    ax: Array         # (...,)
    ay: Array
    eta: Array        # (...,)
    k: Array
    coat_ax: Array = None  # (...,) coat GGX alpha (coated materials)
    h: Array = None   # (...,) hair fiber offset in [-1,1]; None when the
    #   scene has no hair material (keeps hair math off the hot path)
    meas_tab: Array = None  # (T,No,Ni,Np,4) shared measured-BRDF tables;
    #   None when the scene has no measured material
    meas_id: Array = None   # (...,) i32 per-lane table id
    meas_alpha: Array = None  # (...,) fitted GGX proxy-sampler roughness
    lam: Array = None       # (..., S) wavelengths (measured uplift needs them)
    # spectral complex IOR at the sampled wavelengths (named-spectrum
    # conductors, util/spectrum.cpp metal-*-eta/k); None when the scene has
    # no spectral-eta materials (keeps the gathers off the hot path)
    eta_s: Array = None     # (..., S)
    k_s: Array = None       # (..., S)


def material_records(scene: scene_mod.CompiledScene) -> Array:
    """(M, 11) fused material table, built in-jit so gradients flow to
    mat_coeffs/mat_scale: [0 type | 1:4 coeffs | 4 scale | 5:11 params]."""
    return jnp.concatenate(
        [
            scene.mat_type[:, None].astype(jnp.float32),
            scene.mat_coeffs,
            scene.mat_scale[:, None],
            scene.mat_params,
        ],
        axis=-1,
    )


def _feat(scene: scene_mod.CompiledScene, flag: str, mat: int) -> bool:
    """Static material-feature gate. The scene rides through jit as an
    argument, so under jit only the STATIC feat_* flags (aux_data on the
    CompiledScene pytree) are inspectable; outside jit, fall back to the
    mat_type array for scenes built before the flags existed."""
    import numpy as np

    if getattr(scene, flag, False):
        return True
    try:
        return bool(np.any(np.asarray(scene.mat_type) == mat))
    except jax.errors.TracerArrayConversionError:
        return False


def has_mix(scene: scene_mod.CompiledScene) -> bool:
    """Static: any MixMaterial? (gates the resolve re-gather)."""
    return _feat(scene, "feat_mix", scene_mod.MAT_MIX)


def has_hair(scene: scene_mod.CompiledScene) -> bool:
    """Static: any HairMaterial? (gates the hair lobes in evaluate/sample)."""
    return _feat(scene, "feat_hair", scene_mod.MAT_HAIR)


def has_measured(scene: scene_mod.CompiledScene) -> bool:
    """Static: any MeasuredBxDF? (gates the table branch)."""
    return _feat(scene, "feat_measured", scene_mod.MAT_MEASURED)


def has_coated(scene: scene_mod.CompiledScene) -> bool:
    """Static: any coated material? (gates the stochastic LayeredBxDF walk —
    when absent, ctx.coat_ax is None and the walk is never traced)."""
    return (_feat(scene, "feat_coated", scene_mod.MAT_COATED_DIFFUSE)
            or _feat(scene, "feat_coated", scene_mod.MAT_COATED_CONDUCTOR))


def has_spectral(scene: scene_mod.CompiledScene) -> bool:
    """Static: any named-spectrum eta/k material? (gates spectral Fresnel)."""
    return bool(getattr(scene, "feat_spectral", False)) and \
        scene.spec_tables is not None


def sample_spec_table(tables, tab_idx, lam):
    """Evaluate dense 1-nm spectra at sampled wavelengths: gather + lerp
    (the device analog of PiecewiseLinearSpectrum::operator(), spectrum.h).
    tables: (S, 471); tab_idx: (...,) i32; lam: (..., 4) nm -> (..., 4)."""
    from ..core import spectrum as spec_mod

    x = jnp.clip(lam - spec_mod.LAMBDA_MIN, 0.0,
                 tables.shape[1] - 1.001)
    lo = x.astype(jnp.int32)
    frac = x - lo.astype(jnp.float32)
    ti = jnp.maximum(tab_idx, 0)[..., None]
    v0 = tables[ti, lo]
    v1 = tables[ti, lo + 1]
    return v0 * (1.0 - frac) + v1 * frac


def select_ctx(mask: Array, ctx_new: MaterialCtx,
               ctx_old: MaterialCtx) -> MaterialCtx:
    """Per-lane select between two MaterialCtx (mask (...,) picks ctx_new).
    Shared table refs (meas_tab) pass through unchanged — they are identical
    scene constants on both sides."""
    def sel(new, old):
        if new is None or old is None:
            return new if old is None else old
        if new.ndim == mask.ndim + 1 and new.shape[:-1] == mask.shape:
            return jnp.where(mask[..., None], new, old)
        if new.shape == mask.shape:
            return jnp.where(mask, new, old)
        return new
    return MaterialCtx(*[sel(n, o) for n, o in zip(ctx_new, ctx_old)])


def zeros_ctx_like(ctx: MaterialCtx) -> MaterialCtx:
    """A neutral ctx with the same pytree structure (mat_type = -1)."""
    z = jax.tree.map(jnp.zeros_like, ctx)
    return z._replace(mat_type=jnp.full_like(ctx.mat_type, -1),
                      eta=jnp.ones_like(ctx.eta),
                      meas_tab=ctx.meas_tab, lam=ctx.lam)


def gather_material(scene: scene_mod.CompiledScene, mat_id: Array, lam: Array,
                    mat_all: Array | None = None, uv: Array | None = None,
                    u_mix: Array | None = None,
                    foot_log2: Array | None = None) -> MaterialCtx:
    """Fetch + spectrally expand per-lane material params (ONE gather).

    When uv is given and the scene carries textures, materials with a texture
    id (mat_params[5]) read their base color from the per-texel spectral-
    coefficient stack (the TextureEvaluator analog; nearest filtering).

    MixMaterial is resolved here exactly like the reference's wavefront path
    resolves it *before* material evaluation (MixMaterial::ChooseMaterial,
    materials.h:293): u < amount picks materials[1], so amount=0 selects the
    FIRST named material."""
    from ..core import rgb2spec

    if mat_all is None:
        mat_all = material_records(scene)
    rec = mat_all[jnp.maximum(mat_id, 0)]
    if has_mix(scene) and u_mix is not None:
        is_mix = rec[..., 0].astype(jnp.int32) == scene_mod.MAT_MIX
        sub_a = rec[..., 11].astype(jnp.int32)
        sub_b = rec[..., 12].astype(jnp.int32)
        amount = rec[..., 13]
        has_tex_stack = (scene.tex_atlas is not None
                         and scene.tex_atlas.size > 4)
        if has_tex_stack and uv is not None:
            # texture-driven mix amount (MixMaterial "texture amount",
            # crown.pbrt mask mixes): amount < 0 encodes -(tex_id+1)
            from ..geometry import texture as texture_mod

            amt_tex = (-amount - 1.0).astype(jnp.int32)
            texel0 = texture_mod.lookup(scene.tex_atlas, scene.tex_desc,
                                        amt_tex, uv, foot_log2=foot_log2)
            tval = jnp.clip(
                rgb2spec.eval_sigmoid_poly(texel0[..., 0:3],
                                           jnp.full_like(uv[..., :1], 550.0)
                                           )[..., 0] * texel0[..., 3],
                0.0, 1.0)
            amount = jnp.where(amount < 0, tval, amount)
        resolved = jnp.where(is_mix,
                             jnp.where(u_mix < amount, sub_b, sub_a), mat_id)
        rec = jnp.where(is_mix[..., None],
                        mat_all[jnp.maximum(resolved, 0)], rec)
    coeffs = rec[..., 1:4]
    scale = rec[..., 4:5]
    has_textures = scene.tex_atlas is not None and scene.tex_atlas.size > 4
    if has_textures and uv is not None:
        from ..geometry import texture as texture_mod

        tex_id = rec[..., 10].astype(jnp.int32)
        # filtered native-res fetch (mipmap.h trilinear analog);
        # foot_log2=None reads level 0 bilinearly
        texel = texture_mod.lookup(scene.tex_atlas, scene.tex_desc,
                                   tex_id, uv, foot_log2=foot_log2)
        use = (tex_id >= 0)[..., None]
        coeffs = jnp.where(use, texel[..., 0:3], coeffs)
        scale = jnp.where(use, texel[..., 3:4], scale)
    refl = rgb2spec.eval_sigmoid_poly(coeffs, lam) * scale
    mat_type = rec[..., 0].astype(jnp.int32)
    ax = roughness_to_alpha(rec[..., 5])
    ay = roughness_to_alpha(rec[..., 6])
    h = None
    if has_hair(scene):
        # hair stores raw beta_m/beta_n in the roughness slots (no GGX alpha
        # remap) and derives the fiber offset h from the cross-width v coord
        is_hair = mat_type == scene_mod.MAT_HAIR
        ax = jnp.where(is_hair, jnp.clip(rec[..., 5], 0.02, 1.0), ax)
        ay = jnp.where(is_hair, jnp.clip(rec[..., 6], 0.02, 1.0), ay)
        if uv is not None:
            hv = 2.0 * (uv[..., 1] - jnp.floor(uv[..., 1])) - 1.0
        else:
            hv = jnp.zeros(rec.shape[:-1], jnp.float32)
        h = jnp.clip(hv, -0.9995, 0.9995)
    meas_tab = meas_id = meas_alpha = lam_ctx = None
    if has_measured(scene):
        meas_tab = scene.measured_coeffs
        meas_id = rec[..., 8].astype(jnp.int32)  # k slot carries the table id
        if getattr(scene, "measured_alpha", None) is not None:
            meas_alpha = scene.measured_alpha[
                jnp.clip(meas_id, 0, scene.measured_alpha.shape[0] - 1)]
        lam_ctx = lam
    eta_s = k_s = None
    if has_spectral(scene) and lam is not None:
        eta_tab = rec[..., 15].astype(jnp.int32)
        k_tab = rec[..., 16].astype(jnp.int32)
        eta_s = jnp.where(
            (eta_tab >= 0)[..., None],
            sample_spec_table(scene.spec_tables, eta_tab, lam),
            rec[..., 7:8])
        k_s = jnp.where(
            (k_tab >= 0)[..., None],
            sample_spec_table(scene.spec_tables, k_tab, lam),
            rec[..., 8:9])
    return MaterialCtx(
        mat_type=mat_type,
        refl=jnp.clip(refl, 0.0, None),
        ax=ax,
        ay=ay,
        eta=rec[..., 7],
        k=rec[..., 8],
        coat_ax=(roughness_to_alpha(rec[..., 14])
                 if has_coated(scene) else None),
        h=h,
        meas_tab=meas_tab,
        meas_id=meas_id,
        meas_alpha=meas_alpha,
        lam=lam_ctx,
        eta_s=eta_s,
        k_s=k_s,
    )


def evaluate(ctx: MaterialCtx, wo: Array, wi: Array):
    """f(wo, wi) and pdf(wo, wi) for the non-delta components.

    Returns (f (...,4), pdf (...,)). Smooth conductor/dielectric are delta
    distributions: f = 0, pdf = 0 here (reference convention).
    """
    t = ctx.mat_type
    up_o = wo[..., 2] > 0
    refl_side = vm.same_hemisphere(wo, wi)
    abs_ci = vm.abs_cos_theta(wi)

    # diffuse
    f_diff = jnp.where(refl_side[..., None], ctx.refl * INV_PI, 0.0)
    pdf_diff = jnp.where(refl_side, sampling.cosine_hemisphere_pdf(abs_ci), 0.0)

    # rough conductor
    smooth = effectively_smooth(ctx.ax, ctx.ay)
    wm = wi + wo
    wm_len2 = vm.length_squared(wm)
    wm_n = vm.normalize(wm)
    wm_n = jnp.where(wm_n[..., 2:3] < 0, -wm_n, wm_n)
    valid_m = (wm_len2 > 1e-12) & refl_side & ~smooth
    if ctx.eta_s is not None:
        # per-wavelength complex Fresnel (FrComplex over SampledSpectrum)
        fr_s = fr_complex(vm.absdot(wo, wm_n)[..., None], ctx.eta_s, ctx.k_s)
    else:
        fr_s = fr_complex(vm.absdot(wo, wm_n), ctx.eta, ctx.k)[..., None]
    d_ggx = tr_d(wm_n, ctx.ax, ctx.ay)
    g_ggx = tr_g(wo, wi, ctx.ax, ctx.ay)
    denom = jnp.maximum(4.0 * vm.abs_cos_theta(wo) * abs_ci, 1e-9)
    f_cond = jnp.where(
        valid_m[..., None],
        ctx.refl * fr_s * (d_ggx * g_ggx / denom)[..., None], 0.0
    )
    pdf_cond = jnp.where(
        valid_m,
        tr_pdf(wo, wm_n, ctx.ax, ctx.ay) / jnp.maximum(4.0 * vm.absdot(wo, wm_n), 1e-9),
        0.0,
    )

    # rough dielectric, reflection AND transmission (bxdfs.h DielectricBxDF
    # rough f()/PDF(): generalized half vector wm = wi*etap + wo, backfacing
    # microfacets rejected, transmission Jacobian dwm/dwi = |wi.wm| / denom^2,
    # radiance transport 1/etap^2)
    f_diel_r, pdf_diel_r = _rough_dielectric_eval(ctx, wo, wi, smooth)
    f_diel_r = jnp.broadcast_to(f_diel_r[..., None], f_cond.shape)

    # coated diffuse / coated conductor: stochastic LayeredBxDF estimate
    # (layered.py — the reference's bxdfs.h:432 random walk, lane-vectorized).
    # Traced only when the scene has coated materials (coat_ax gate).
    if ctx.coat_ax is not None:
        from . import layered

        cc_mask = t == scene_mod.MAT_COATED_CONDUCTOR
        is_coat = cc_mask | (t == scene_mod.MAT_COATED_DIFFUSE)
        # the walk runs on EVERY lane (masked select); non-coated lanes must
        # feed it benign parameters — e.g. a smooth conductor's eta=0.23 as
        # a "coat IOR" produces inf intermediates whose VJP is 0*inf = NaN
        # (the crown-grad NaN of r4)
        lctx = ctx._replace(
            eta=jnp.where(is_coat | cc_mask, ctx.eta, 1.5),
            ax=jnp.where(is_coat, ctx.ax, 0.3),
            ay=jnp.where(is_coat, ctx.ay, 0.3),
            coat_ax=jnp.where(is_coat, ctx.coat_ax, 0.1))
        f_lay = layered.coated_f(lctx, wo, wi, cc_mask)
        pdf_lay = layered.coated_pdf(lctx, wo, wi, cc_mask)
        f_cdiff = f_ccond = f_lay
        pdf_cdiff = pdf_ccond = pdf_lay
    else:
        f_cdiff = f_ccond = jnp.zeros_like(f_diff)
        pdf_cdiff = pdf_ccond = jnp.zeros_like(pdf_diff)

    f_sw = jnp.where(refl_side[..., None],
                     jnp.broadcast_to(sss_exit_f(ctx.eta, abs_ci)[..., None],
                                      f_diff.shape), 0.0)
    conds = [
        t == scene_mod.MAT_DIFFUSE,
        t == scene_mod.MAT_CONDUCTOR,
        t == scene_mod.MAT_DIELECTRIC,
        t == scene_mod.MAT_COATED_DIFFUSE,
        t == scene_mod.MAT_COATED_CONDUCTOR,
        t == scene_mod.MAT_SSS_EXIT,
    ]
    fs = [f_diff, f_cond, f_diel_r, f_cdiff, f_ccond, f_sw]
    pdfs = [pdf_diff, pdf_cond, pdf_diel_r, pdf_cdiff, pdf_ccond, pdf_diff]
    if ctx.h is not None:
        from . import hair as hair_mod

        sigma_a = hair_mod.sigma_a_from_reflectance(ctx.refl, ctx.ay)
        conds.append(t == scene_mod.MAT_HAIR)
        fs.append(hair_mod.f(wo, wi, ctx.h, ctx.eta, sigma_a, ctx.ax, ctx.ay))
        pdfs.append(hair_mod.pdf(wo, wi, ctx.h, ctx.eta, sigma_a,
                                 ctx.ax, ctx.ay))
    if ctx.meas_tab is not None:
        from . import measured as meas_mod

        conds.append(t == scene_mod.MAT_MEASURED)
        fs.append(meas_mod.f(ctx.meas_tab, ctx.meas_id, wo, wi, ctx.lam))
        pdfs.append(meas_mod.pdf(wo, wi, ctx.meas_alpha))
    f = jnp.select([c[..., None] for c in conds], fs,
                   default=jnp.zeros_like(f_diff))
    pdf = jnp.select(conds, pdfs, default=jnp.zeros_like(pdf_diff))
    return f, pdf


def _rough_dielectric_eval(ctx: MaterialCtx, wo: Array, wi: Array,
                           smooth: Array, mode: str = "radiance"):
    """f and pdf of the rough dielectric for an arbitrary (wo, wi) pair —
    reflection or transmission decided by the hemisphere relation
    (bxdfs.h DielectricBxDF::f / ::PDF, rough branch). Returns
    (f (...,), pdf (...,)); zero on effectively-smooth lanes (delta).

    mode: "radiance" applies the 1/etap^2 non-symmetry factor on
    transmission; "importance" (photon/light transport) omits it, matching
    the reference's TransportMode handling (bxdfs.h: `if (mode ==
    TransportMode::Radiance) ft /= Sqr(etap)`)."""
    cos_o = vm.cos_theta(wo)
    cos_i = vm.cos_theta(wi)
    is_refl = cos_i * cos_o > 0
    # etap: relative IOR of the crossing for transmission, 1 for reflection
    etap = jnp.where(is_refl, 1.0, jnp.where(cos_o > 0, ctx.eta, 1.0 / ctx.eta))
    wm = wi * etap[..., None] + wo
    wm_len2 = vm.length_squared(wm)
    degenerate = (cos_i == 0) | (cos_o == 0) | (wm_len2 < 1e-16)
    wm = vm.normalize(jnp.where(degenerate[..., None], wo, wm))
    wm = jnp.where(wm[..., 2:3] < 0, -wm, wm)
    # reject backfacing microfacets
    back = (vm.dot(wm, wi) * cos_i < 0) | (vm.dot(wm, wo) * cos_o < 0)
    fr = fr_dielectric(vm.dot(wo, wm), ctx.eta)
    d = tr_d(wm, ctx.ax, ctx.ay)
    g = tr_g(wo, wi, ctx.ax, ctx.ay)
    pdf_wm = tr_pdf(wo, wm, ctx.ax, ctx.ay)
    # reflection
    f_r = d * fr * g / jnp.maximum(4.0 * jnp.abs(cos_i * cos_o), 1e-12)
    pdf_r = pdf_wm / jnp.maximum(4.0 * vm.absdot(wo, wm), 1e-9) * fr
    # transmission
    denom = (vm.dot(wi, wm) + vm.dot(wo, wm) / etap) ** 2
    f_t = (d * (1.0 - fr) * g
           * jnp.abs(vm.dot(wi, wm) * vm.dot(wo, wm))
           / jnp.maximum(jnp.abs(cos_i * cos_o) * denom, 1e-12))
    if mode == "radiance":
        f_t = f_t / (etap * etap)
    dwm_dwi = vm.absdot(wi, wm) / jnp.maximum(denom, 1e-12)
    pdf_t = pdf_wm * dwm_dwi * (1.0 - fr)
    ok = ~degenerate & ~back & ~smooth
    f = jnp.where(ok, jnp.where(is_refl, f_r, f_t), 0.0)
    pdf = jnp.where(ok, jnp.where(is_refl, pdf_r, pdf_t), 0.0)
    return f, pdf



def sample(ctx: MaterialCtx, wo: Array, uc: Array, u2: Array,
           mode: str = "radiance") -> BSDFSample:
    """Sample_f over lane-tagged materials. uc: (...,), u2: (...,2).

    mode: "radiance" for camera paths (default), "importance" for photon /
    light-subpath transport — drops the 1/eta^2 radiance-transport factor on
    dielectric transmission (reference TransportMode, bxdfs.h)."""
    t = ctx.mat_type
    smooth = effectively_smooth(ctx.ax, ctx.ay)

    # ---- diffuse: cosine hemisphere -------------------------------------
    wi_diff = sampling.sample_cosine_hemisphere(u2)
    wi_diff = jnp.where(wo[..., 2:3] < 0, wi_diff * jnp.array([1.0, 1.0, -1.0]), wi_diff)
    pdf_diff = sampling.cosine_hemisphere_pdf(vm.abs_cos_theta(wi_diff))
    f_diff = ctx.refl * INV_PI

    # ---- conductor -------------------------------------------------------
    # smooth: perfect mirror
    wi_mirror = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
    if ctx.eta_s is not None:
        fr_smooth_s = fr_complex(vm.abs_cos_theta(wo)[..., None],
                                 ctx.eta_s, ctx.k_s)
    else:
        fr_smooth_s = fr_complex(vm.abs_cos_theta(wo), ctx.eta, ctx.k)[..., None]
    f_mirror = ctx.refl * fr_smooth_s \
        / jnp.maximum(vm.abs_cos_theta(wi_mirror), 1e-9)[..., None]
    # rough: sample visible normal
    wo_up = jnp.where(wo[..., 2:3] < 0, -wo, wo)
    wm = tr_sample_wm(wo_up, u2, ctx.ax, ctx.ay)
    wm = jnp.where(wo[..., 2:3] < 0, -wm, wm)
    wi_rough = vm.reflect(wo, wm)
    refl_ok = vm.same_hemisphere(wo, wi_rough)
    f_rough, pdf_rough = evaluate(
        ctx._replace(mat_type=jnp.full_like(t, scene_mod.MAT_CONDUCTOR)), wo, wi_rough
    )
    wi_cond = jnp.where(smooth[..., None], wi_mirror, wi_rough)
    f_cond = jnp.where(smooth[..., None], f_mirror, f_rough)
    pdf_cond = jnp.where(smooth, 1.0, pdf_rough)
    valid_cond = smooth | refl_ok

    # ---- dielectric (smooth): Fresnel-weighted reflect/refract ----------
    ci = vm.cos_theta(wo)
    frd = fr_dielectric(ci, ctx.eta)
    reflect_choice = uc < frd
    n_local = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), wo.shape)
    ok_t, eta_used, wt = vm.refract(wo, n_local, ctx.eta)
    f_refl = (frd / jnp.maximum(vm.abs_cos_theta(wi_mirror), 1e-9))[..., None]
    # radiance transport: divide by eta^2 for transmission (bxdfs.h
    # DielectricBxDF); importance (photon) transport omits the factor
    f_tran = ((1.0 - frd) / jnp.maximum(vm.abs_cos_theta(wt), 1e-9))[..., None]
    if mode == "radiance":
        f_tran = f_tran / (eta_used * eta_used)[..., None]
    wi_diel_s = jnp.where(reflect_choice[..., None], wi_mirror, wt)
    f_diel_s = jnp.where(reflect_choice[..., None], f_refl, f_tran)
    pdf_diel_s = jnp.where(reflect_choice, frd, 1.0 - frd)
    valid_diel_s = reflect_choice | ok_t
    trans_diel_s = ~reflect_choice

    # ---- dielectric (rough): microfacet reflect/refract against a sampled
    # visible normal (bxdfs.h DielectricBxDF::Sample_f rough branch). wm stays
    # in the +z hemisphere; fr_dielectric/refract handle wo below the surface.
    wm_d = tr_sample_wm(wo_up, u2, ctx.ax, ctx.ay)
    fr_m = fr_dielectric(vm.dot(wo, wm_d), ctx.eta)
    r_choice = uc < fr_m  # TIR => fr_m == 1 => always reflect
    wi_dr = vm.reflect(wo, wm_d)
    ok_rt, eta_rough, wi_dt2 = vm.refract(wo, wm_d, ctx.eta)
    wi_diel_r = jnp.where(r_choice[..., None], wi_dr, wi_dt2)
    f_rd, pdf_rd = _rough_dielectric_eval(
        ctx, wo, wi_diel_r, jnp.zeros_like(smooth), mode=mode)
    valid_diel_r = jnp.where(
        r_choice, vm.same_hemisphere(wo, wi_dr),
        ok_rt & ~vm.same_hemisphere(wo, wi_dt2))

    sm1 = smooth[..., None]
    wi_diel = jnp.where(sm1, wi_diel_s, wi_diel_r)
    f_diel = jnp.broadcast_to(
        jnp.where(sm1, f_diel_s, f_rd[..., None]), f_diff.shape)
    pdf_diel = jnp.where(smooth, pdf_diel_s, pdf_rd)
    valid_diel = jnp.where(smooth, valid_diel_s, valid_diel_r)
    trans_diel = jnp.where(smooth, trans_diel_s, ~r_choice & valid_diel_r)
    eta_used = jnp.where(smooth, eta_used, eta_rough)

    # ---- thin dielectric -------------------------------------------------
    frt = fr_dielectric(jnp.abs(ci), ctx.eta)
    # double reflection inside the slab (bxdfs ThinDielectricBxDF)
    frt = jnp.where(frt < 1.0, frt + (1.0 - frt) ** 2 * frt / jnp.maximum(1.0 - frt * frt, 1e-9), frt)
    thin_refl = uc < frt
    wi_thin = jnp.where(thin_refl[..., None], wi_mirror, -wo)
    f_thin_r = (frt / jnp.maximum(vm.abs_cos_theta(wi_mirror), 1e-9))[..., None]
    f_thin_t = ((1.0 - frt) / jnp.maximum(vm.abs_cos_theta(wo), 1e-9))[..., None]
    f_thin = jnp.broadcast_to(jnp.where(thin_refl[..., None], f_thin_r, f_thin_t), f_diff.shape)
    pdf_thin = jnp.where(thin_refl, frt, 1.0 - frt)

    # ---- diffuse transmission -------------------------------------------
    flip = uc < 0.5
    wi_dt = jnp.where(flip[..., None], wi_diff, wi_diff * jnp.array([1.0, 1.0, -1.0]))
    pdf_dt = 0.5 * sampling.cosine_hemisphere_pdf(vm.abs_cos_theta(wi_dt))
    f_dt = ctx.refl * INV_PI  # same refl for R and T in this first cut
    trans_dt = ~vm.same_hemisphere(wo, wi_dt)

    # ---- coated diffuse / coated conductor --------------------------------
    # stochastic LayeredBxDF random walk (layered.py / bxdfs.h:432). The
    # walk's pdf is only proportional; like the reference's BSDF wrapper
    # (pdfIsProportional), f is rescaled by the stochastic PDF estimate so
    # beta (f/pdf) is preserved and the reported pdf is MIS-consistent.
    if ctx.coat_ax is not None:
        from . import layered

        cc_mask = t == scene_mod.MAT_COATED_CONDUCTOR
        is_coat = cc_mask | (t == scene_mod.MAT_COATED_DIFFUSE)
        # see evaluate(): benign params on non-coated lanes (NaN-VJP hygiene)
        lctx = ctx._replace(
            eta=jnp.where(is_coat | cc_mask, ctx.eta, 1.5),
            ax=jnp.where(is_coat, ctx.ax, 0.3),
            ay=jnp.where(is_coat, ctx.ay, 0.3),
            coat_ax=jnp.where(is_coat, ctx.coat_ax, 0.1))
        wi_lay, f_walk, pdf_walk, valid_lay, spec_lay = layered.coated_sample(
            lctx, wo, uc, u2, cc_mask, mode=mode)
        pdf_lay = layered.coated_pdf(lctx, wo, wi_lay, cc_mask, mode=mode)
        f_lay = f_walk * (pdf_lay / jnp.maximum(pdf_walk, 1e-12))[..., None]
        # fully specular walks (smooth coat + smooth/specular exits) keep the
        # walk pdf and f (delta transport: MIS never applies)
        f_lay = jnp.where(spec_lay[..., None], f_walk, f_lay)
        pdf_lay = jnp.where(spec_lay, pdf_walk, pdf_lay)
        wi_cd = wi_cc = wi_lay
        f_cd = f_cc = jnp.broadcast_to(f_lay, f_diff.shape)
        pdf_cd = pdf_cc = pdf_lay
        valid_cd = valid_cc = valid_lay
        spec_cd = spec_lay
    else:
        wi_cd = wi_cc = wi_diff
        f_cd = f_cc = jnp.zeros_like(f_diff)
        pdf_cd = pdf_cc = jnp.zeros_like(pdf_diff)
        valid_cd = valid_cc = jnp.zeros(t.shape, bool)
        spec_cd = jnp.zeros(t.shape, bool)

    # ---- subsurface exit lobe (NormalizedFresnel Sw, cosine-sampled) ----
    f_swx = jnp.broadcast_to(
        sss_exit_f(ctx.eta, vm.abs_cos_theta(wi_diff))[..., None],
        f_diff.shape)

    conds = [
        t == scene_mod.MAT_DIFFUSE,
        t == scene_mod.MAT_CONDUCTOR,
        t == scene_mod.MAT_DIELECTRIC,
        t == scene_mod.MAT_THIN_DIELECTRIC,
        t == scene_mod.MAT_DIFFUSE_TRANSMISSION,
        t == scene_mod.MAT_COATED_DIFFUSE,
        t == scene_mod.MAT_COATED_CONDUCTOR,
        t == scene_mod.MAT_SSS_EXIT,
    ]
    zeros_b = jnp.zeros_like(smooth)
    ones_b = jnp.ones_like(smooth)
    wis = [wi_diff, wi_cond, wi_diel, wi_thin, wi_dt, wi_cd, wi_cc, wi_diff]
    fss = [f_diff, f_cond, f_diel, f_thin, f_dt, f_cd, f_cc, f_swx]
    pdfs = [pdf_diff, pdf_cond, pdf_diel, pdf_thin, pdf_dt, pdf_cd, pdf_cc,
            pdf_diff]
    specs = [zeros_b, smooth, smooth, ones_b, zeros_b, spec_cd, spec_cd,
             zeros_b]
    transs = [zeros_b, zeros_b, trans_diel, ~thin_refl, trans_dt,
              zeros_b, zeros_b, zeros_b]
    valids = [ones_b, valid_cond, valid_diel, ones_b, ones_b,
              valid_cd, valid_cc, ones_b]
    if ctx.h is not None:
        from . import hair as hair_mod

        sigma_a = hair_mod.sigma_a_from_reflectance(ctx.refl, ctx.ay)
        wi_h, f_h, pdf_h = hair_mod.sample_f(wo, ctx.h, ctx.eta, sigma_a,
                                             ctx.ax, ctx.ay, uc, u2)
        conds.append(t == scene_mod.MAT_HAIR)
        wis.append(wi_h)
        fss.append(jnp.broadcast_to(f_h, f_diff.shape))
        pdfs.append(pdf_h)
        specs.append(zeros_b)
        transs.append(zeros_b)
        valids.append(pdf_h > 0)
    if ctx.meas_tab is not None:
        from . import measured as meas_mod

        wi_m, f_m, pdf_m = meas_mod.sample_f(ctx.meas_tab, ctx.meas_id, wo,
                                             ctx.lam, u2, uc=uc,
                                             alpha=ctx.meas_alpha)
        conds.append(t == scene_mod.MAT_MEASURED)
        wis.append(wi_m)
        fss.append(jnp.broadcast_to(f_m, f_diff.shape))
        pdfs.append(pdf_m)
        specs.append(zeros_b)
        transs.append(zeros_b)
        valids.append(pdf_m > 0)
    conds1 = [c[..., None] for c in conds]
    wi = jnp.select(conds1, wis, wi_diff)
    f = jnp.select(conds1, fss, jnp.zeros_like(f_diff))
    pdf = jnp.select(conds, pdfs, jnp.zeros_like(pdf_diff))
    specular = jnp.select(conds, specs, zeros_b)
    transmission = jnp.select(conds, transs, zeros_b)
    eta_out = jnp.where((t == scene_mod.MAT_DIELECTRIC) & trans_diel, eta_used, 1.0)
    valid = jnp.select(conds, valids, zeros_b)
    valid = valid & (pdf > 0) & (t >= 0)
    return BSDFSample(wi=wi, f=f, pdf=pdf, specular=specular,
                      transmission=transmission, eta=eta_out, valid=valid)
