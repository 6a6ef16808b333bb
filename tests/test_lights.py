"""Spot/projection/goniometric/portal lights + BVH light-sampler tests."""

import numpy as np
import jax.numpy as jnp

from nn_bvh_tpu import accel
from nn_bvh_tpu.geometry import scene as scene_mod, transform as xf
from nn_bvh_tpu.scatter import lights, lightsamplers
from nn_bvh_tpu.wavefront import camera as camera_mod, integrator


def _li_at(sc, light_id, p, u=(0.3, 0.7)):
    la = lights.light_records(sc)
    lam = jnp.full((1, 4), 550.0)
    return lights.sample_li(
        sc, jnp.asarray(la), jnp.asarray([light_id]),
        jnp.asarray([p], jnp.float32), lam,
        jnp.asarray([u], jnp.float32))


def test_spot_falloff():
    b = scene_mod.SceneBuilder()
    m = b.add_material("diffuse")
    b.add_quad((-1, -1, -5), (1, -1, -5), (1, 1, -5), (-1, 1, -5), m)
    sid = b.add_spot_light((0, 0, 0), (0, 0, 1), scale=1.0,
                           cone_angle=30.0, cone_delta=10.0)
    sc = b.build()
    on_axis = _li_at(sc, sid, (0, 0, 3))
    assert float(jnp.mean(on_axis.li)) > 0
    # 45 degrees off axis: outside the cone -> zero
    off = _li_at(sc, sid, (3, 0, 3))
    assert float(jnp.mean(off.li)) == 0.0
    # between falloff start (20deg) and total (30deg): partial
    import math
    ang = math.radians(25.0)
    mid = _li_at(sc, sid, (3 * math.tan(ang), 0, 3))
    full = float(jnp.mean(on_axis.li))
    part = float(jnp.mean(mid.li))
    assert 0 < part < full


def test_projection_light_frustum():
    img = np.zeros((8, 8, 3), np.float32)
    img[:, :4] = (1, 0, 0)  # left half red
    img[:, 4:] = (0, 1, 0)
    b = scene_mod.SceneBuilder()
    m = b.add_material("diffuse")
    b.add_quad((-1, -1, -5), (1, -1, -5), (1, 1, -5), (-1, 1, -5), m)
    pid = b.add_projection_light((0, 0, 0), (0, 0, 1), img, fov=60.0)
    sc = b.build()
    inside = _li_at(sc, pid, (0, 0, 3))
    assert float(jnp.mean(inside.li)) > 0
    outside = _li_at(sc, pid, (10, 0, 1))  # far outside the frustum
    assert float(jnp.mean(outside.li)) == 0.0


def test_goniometric_uniform_map_matches_point():
    uni = np.ones((8, 8, 3), np.float32)
    b = scene_mod.SceneBuilder()
    m = b.add_material("diffuse")
    b.add_quad((-1, -1, -5), (1, -1, -5), (1, 1, -5), (-1, 1, -5), m)
    gid = b.add_goniometric_light((0, 0, 0), uni, scale=2.0)
    kid = b.add_point_light((0, 0, 0), scale=2.0)
    sc = b.build()
    a = np.asarray(_li_at(sc, gid, (1, 2, 3)).li)
    c = np.asarray(_li_at(sc, kid, (1, 2, 3)).li)
    assert np.allclose(a, c, rtol=0.02), (a, c)


def test_portal_sampling_integrates_solid_angle():
    """E[Le/pdf] over portal samples = Le * (portal solid angle) for a
    uniform env map."""
    env = np.full((32, 32, 3), 1.0, np.float32)
    b = scene_mod.SceneBuilder()
    m = b.add_material("diffuse")
    b.add_quad((-1, -1, -5), (1, -1, -5), (1, 1, -5), (-1, 1, -5), m)
    b.set_environment_map(env, scale=1.0)
    lid = b.add_portal((-1, -1, 4), (1, -1, 4), (1, 1, 4), (-1, 1, 4))
    sc = b.build()
    la = jnp.asarray(lights.light_records(sc))
    n = 4096
    rs = np.random.RandomState(0)
    u2 = jnp.asarray(rs.rand(n, 2), jnp.float32)
    lam = jnp.full((n, 4), 550.0)
    p = jnp.zeros((n, 3), jnp.float32)
    ls = lights.sample_li(sc, la, jnp.full((n,), lid, jnp.int32), p, lam, u2)
    est = np.asarray(jnp.mean(ls.li / ls.pdf[..., None], axis=0)).mean()
    # analytic solid angle of the 2x2 quad at distance 4 (numeric quad)
    xs = np.linspace(-1, 1, 200)
    X, Y = np.meshgrid(xs, xs)
    dA = (xs[1] - xs[0]) ** 2
    omega = np.sum(4.0 / (X**2 + Y**2 + 16.0) ** 1.5) * dA
    le = np.asarray(lights.env_le(sc, jnp.asarray([[0.0, 0, 1]]), lam[:1]))[0].mean()
    assert abs(est / (le * omega) - 1.0) < 0.02, (est, le * omega)
    # pdf_dir consistency: through-portal direction has positive pdf that
    # integrates to 1 over the window: MC-check 1 = E_uniform[pdf * dw]
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    pd = np.asarray(lights.portal_pdf_dir(sc, la, jnp.zeros((1, 3)), d))[0]
    assert pd > 0
    # integral of pdf over all sampled directions ~ 1 (importance identity):
    # E[pdf(dir)/pdf(dir)] = 1 trivially; instead check the sampler's own
    # pdf agrees with portal_pdf_dir on its samples
    pd_s = np.asarray(lights.portal_pdf_dir(
        sc, la, jnp.zeros((n, 3)), ls.wi))
    ok = np.asarray(ls.valid)
    rel = np.abs(pd_s[ok] - np.asarray(ls.pdf)[ok]) / np.maximum(
        np.asarray(ls.pdf)[ok], 1e-9)
    assert np.median(rel) < 0.02, np.median(rel)
    # direction missing the portal: pdf 0
    d2 = jnp.asarray([[0.0, 0.0, -1.0]])
    assert np.asarray(lights.portal_pdf_dir(sc, la, jnp.zeros((1, 3)), d2))[0] == 0


def _many_light_scene():
    b = scene_mod.SceneBuilder()
    m = b.add_material("diffuse", reflectance=(0.6, 0.6, 0.6))
    b.add_quad((-10, 0, -10), (10, 0, -10), (10, 0, 10), (-10, 0, 10), m)
    rs = np.random.RandomState(7)
    for i in range(20):
        c = rs.rand(3) * np.array([16, 0, 16]) + np.array([-8, 3.0, -8])
        s = 0.3
        b.add_quad(c + (-s, 0, -s), c + (s, 0, -s), c + (s, 0, s), c + (-s, 0, s),
                   m, emission_rgb=rs.rand(3) * 0.9 + 0.1,
                   emission_scale=float(rs.rand() * 12 + 1), two_sided=False)
    b.add_point_light((0, 5, 0), scale=3.0)
    b.add_uniform_infinite_light((1, 1, 1), scale=0.2)
    sc = b.build()
    return accel.build_scene_bvh(sc)


def test_bvh_light_sampler_pmf_consistency():
    """Histogram of sample_ctx choices matches pmf_ctx, and pmf sums to 1."""
    sc, dbvh, _ = _many_light_scene()
    t = lightsamplers.build(sc, "bvh")
    assert t.has_bvh
    p = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 2.0]), (8192, 3))
    rs = np.random.RandomState(3)
    u = jnp.asarray(rs.rand(8192), jnp.float32)
    lid, pmf_s, _ = lightsamplers.sample_ctx(t, p, u)
    lid = np.asarray(lid)
    assert np.all(lid >= 0)
    L = sc.n_lights
    # pmf_ctx sums to ~1 over all lights at a point
    ids = jnp.arange(L, dtype=jnp.int32)
    pp = jnp.broadcast_to(jnp.asarray([1.0, 0.5, 2.0]), (L, 3))
    pmfs = np.asarray(lightsamplers.pmf_ctx(t, pp, ids))
    assert abs(pmfs.sum() - 1.0) < 1e-3, pmfs.sum()
    # sampled frequency ~ pmf (reference lightsamplers_test.cpp:353 idiom)
    hist = np.bincount(lid, minlength=L) / len(lid)
    err = np.abs(hist - pmfs)
    assert err.max() < 0.03, err.max()
    # reported pmf at sample time matches pmf_ctx
    pmfs_at = np.asarray(lightsamplers.pmf_ctx(
        t, jnp.broadcast_to(jnp.asarray([1.0, 0.5, 2.0]), (8192, 3)),
        jnp.asarray(lid)))
    assert np.allclose(np.asarray(pmf_s), pmfs_at, rtol=1e-3, atol=1e-5)


def test_bvh_sampler_render_matches_power():
    sc, dbvh, _ = _many_light_scene()
    cam = camera_mod.make_perspective(
        xf.look_at((0, 6, -14), (0, 0, 0), (0, 1, 0)), fov=50.0,
        width=20, height=20)
    imgs = {}
    for ls in ("power", "bvh"):
        cfg = integrator.IntegratorConfig(max_depth=3, light_sampler=ls,
                                          use_pallas=False)
        imgs[ls] = float(np.mean(np.asarray(integrator.render(
            sc, dbvh, cam, spp=24, sampler="independent", cfg=cfg))))
    assert abs(imgs["bvh"] / imgs["power"] - 1.0) < 0.05, imgs


def test_sphere_area_light_analytic_irradiance():
    """Emissive sphere: ONE light record per shape (reference
    'AreaLights 1' on killeroo-simple) and cone sampling whose Monte-Carlo
    estimate of irradiance at a point matches the analytic
    E = L * pi * r^2 / d^2 (sphere fully visible above the horizon)."""
    b = scene_mod.SceneBuilder()
    m = b.add_material("diffuse", reflectance=(1.0, 1.0, 1.0))
    em = b.add_material("diffuse", reflectance=(0, 0, 0))
    b.add_quad((-50, 0, -50), (50, 0, -50), (50, 0, 50), (-50, 0, 50), m)
    b.add_sphere((0, 10.0, 0), 1.0, em, n_theta=12, n_phi=24,
                 emission_rgb=(1, 1, 1), emission_scale=1.0)
    sc = b.build()
    assert sc.n_lights == 1, sc.n_lights  # one shape = one light
    assert int(np.asarray(sc.light_type)[0]) == scene_mod.LIGHT_SPHERE_AREA

    # MC estimate of E = int Li cos dw at the origin via sample_li
    la = jnp.asarray(lights.light_records(sc))
    n = 4096
    rs = np.random.RandomState(0)
    u2 = jnp.asarray(rs.rand(n, 2), jnp.float32)
    p = jnp.zeros((n, 3), jnp.float32)
    lam = jnp.full((n, 4), 550.0)
    ls = lights.sample_li(sc, la, jnp.zeros(n, jnp.int32), p, lam, u2)
    cos_up = jnp.clip(ls.wi[..., 1], 0.0, None)
    est = np.asarray(jnp.mean(
        jnp.where(ls.valid[..., None], ls.li, 0.0).mean(-1)
        * cos_up / jnp.maximum(ls.pdf, 1e-9)))
    # emission_scale=1 with normalized chroma: Le at 550nm from the record
    le = float(np.asarray(lights.record_spectrum(la[0], lam[0])).mean())
    want = le * np.pi * 1.0 / 10.0**2
    assert abs(est - want) / want < 0.03, (est, want)
    # shadow distances lie on the near side of the analytic sphere, from
    # d - r (axis) up to sqrt(d^2 - r^2) (silhouette), minus the sag margin
    dists = np.asarray(ls.dist)
    assert dists.max() < np.sqrt(10.0**2 - 1.0) + 1e-3, dists.max()
    assert dists.min() > 10.0 - 1.0 - 0.2, dists.min()

    # MIS pdf: cone pdf for directions toward the sphere
    pdfs = np.asarray(lights.sphere_pdf_li(la[0], np.zeros(3, np.float32)))
    cos_max = np.sqrt(1 - (1.0 / 10.0) ** 2)
    assert abs(pdfs - 1.0 / (2 * np.pi * (1 - cos_max))) < 1e-3


def test_sphere_light_render_vs_tri_lights():
    """A render lit by the analytic sphere light matches one lit by the
    same sphere expanded to per-triangle lights (ground truth), and the
    variance is much lower at equal spp."""
    def build(analytic):
        b = scene_mod.SceneBuilder()
        m = b.add_material("diffuse", reflectance=(0.7, 0.7, 0.7))
        em = b.add_material("diffuse", reflectance=(0, 0, 0))
        b.add_quad((-20, 0, -20), (20, 0, -20), (20, 0, 20), (-20, 0, 20), m)
        if analytic:
            b.add_sphere((0, 6, 0), 1.5, em, n_theta=12, n_phi=24,
                         emission_rgb=(1, 1, 1), emission_scale=8.0)
        else:
            # bypass the analytic light: per-triangle lights like round 1
            b.add_sphere((0, 6, 0), 1.5, em, n_theta=12, n_phi=24)
            b._tri_emit[-1] = (np.ones(3, np.float32), 8.0, False)
        sc = b.build()
        sc, dbvh, _ = accel.build_scene_bvh(sc)
        cam = camera_mod.make_perspective(
            xf.look_at((0, 4, -12), (0, 1, 0), (0, 1, 0)), fov=45.0,
            width=24, height=24)
        cfg = integrator.IntegratorConfig(max_depth=2, use_pallas=False)
        return np.asarray(integrator.render(sc, dbvh, cam, spp=48,
                                            sampler="halton", cfg=cfg))

    img_sphere = build(True)
    img_tris = build(False)
    # means agree (both unbiased estimators of the same scene)
    ms, mt = img_sphere.mean(), img_tris.mean()
    assert abs(ms - mt) / mt < 0.08, (ms, mt)


def test_portal_sat_variance_below_uniform():
    """The SAT image warp (scatter/portal.py) must cut estimator variance
    vs the legacy uniform-area portal sampling on a peaked env map
    (lights.h:631 WindowedPiecewiseConstant2D rationale)."""
    # env with a small bright spot INSIDE the portal window (placed at the
    # equal-area uv of the portal-center direction): uniform-area sampling
    # rarely lands on it
    from nn_bvh_tpu.core import vecmath as vmx
    env = np.full((64, 64, 3), 0.01, np.float32)
    uv_c = np.asarray(vmx.equal_area_sphere_to_square(
        jnp.asarray([[0.05, 0.05, 1.0]]) / np.linalg.norm([0.05, 0.05, 1.0])))[0]
    cy, cx = int(uv_c[1] * 64), int(uv_c[0] * 64)
    env[max(cy - 1, 0):cy + 1, max(cx - 1, 0):cx + 1] = 200.0
    b = scene_mod.SceneBuilder()
    m = b.add_material("diffuse")
    b.add_quad((-1, -1, -5), (1, -1, -5), (1, 1, -5), (-1, 1, -5), m)
    b.set_environment_map(env, scale=1.0)
    lid = b.add_portal((-1, -1, 4), (1, -1, 4), (1, 1, 4), (-1, 1, 4))
    sc = b.build()
    la = jnp.asarray(lights.light_records(sc))
    n = 20000
    rs = np.random.RandomState(3)
    u2 = jnp.asarray(rs.rand(n, 2), jnp.float32)
    lam = jnp.full((n, 4), 550.0)
    p = jnp.zeros((n, 3), jnp.float32)
    ids = jnp.full((n,), lid, jnp.int32)

    ls_sat = lights.sample_li(sc, la, ids, p, lam, u2)
    sc_uni = sc.replace(portal_sat=None, portal_img_coeffs=None,
                        portal_frame=None)
    ls_uni = lights.sample_li(sc_uni, la, ids, p, lam, u2)

    def est(ls):
        x = np.asarray(ls.li[..., 0] / jnp.maximum(ls.pdf, 1e-12))
        x = np.where(np.asarray(ls.valid), x, 0.0)
        return x

    e_sat, e_uni = est(ls_sat), est(ls_uni)
    # unbiasedness: both estimate the same integral
    assert abs(e_sat.mean() / max(e_uni.mean(), 1e-9) - 1.0) < 0.15, (
        e_sat.mean(), e_uni.mean())
    # the quoted-MSE gate: SAT variance at least 5x below uniform-area
    v_sat, v_uni = e_sat.var(), e_uni.var()
    assert v_sat * 5.0 < v_uni, (v_sat, v_uni)


def test_exhaustive_sampler_pmf_consistency_and_vs_bvh():
    """Exhaustive (lightsamplers.cpp:268-312) is the ground truth the BVH
    sampler approximates: its pmf must sum to 1, match its own sample
    histogram, and correlate with the BVH sampler's choices."""
    sc, dbvh, _ = _many_light_scene()
    t = lightsamplers.build(sc, "exhaustive")
    assert t.kind == lightsamplers.EXHAUSTIVE and t.has_bvh
    L = sc.n_lights
    pt = jnp.asarray([1.0, 0.5, 2.0])
    ids = jnp.arange(L, dtype=jnp.int32)
    pp = jnp.broadcast_to(pt, (L, 3))
    pmfs = np.asarray(lightsamplers.pmf_ctx(t, pp, ids))
    assert abs(pmfs.sum() - 1.0) < 1e-3, pmfs.sum()
    # histogram of samples matches pmf
    n = 16384
    rs = np.random.RandomState(11)
    u = jnp.asarray(rs.rand(n), jnp.float32)
    p = jnp.broadcast_to(pt, (n, 3))
    lid, pmf_s, u2 = lightsamplers.sample_ctx(t, p, u)
    lid = np.asarray(lid)
    assert np.all(lid >= 0)
    hist = np.bincount(lid, minlength=L) / n
    assert np.abs(hist - pmfs).max() < 0.03
    # reported pmf at sample time matches pmf_ctx
    pmfs_at = np.asarray(lightsamplers.pmf_ctx(t, p, jnp.asarray(lid)))
    assert np.allclose(np.asarray(pmf_s), pmfs_at, rtol=1e-3, atol=1e-5)
    assert np.all((np.asarray(u2) >= 0) & (np.asarray(u2) < 1))
    # BVH sampler PMF vs exhaustive ground truth: same support, and the
    # stochastic-descent pmf should be within ~4x of exhaustive everywhere
    # (the tree loses per-light resolution but must not starve a light)
    tb = lightsamplers.build(sc, "bvh")
    pmfs_bvh = np.asarray(lightsamplers.pmf_ctx(tb, pp, ids))
    live = pmfs > 1e-5
    ratio = pmfs_bvh[live] / pmfs[live]
    assert ratio.min() > 0.05 and ratio.max() < 20.0, (ratio.min(), ratio.max())


def test_exhaustive_contextfree_uniform():
    sc, dbvh, _ = _many_light_scene()
    t = lightsamplers.build(sc, "exhaustive")
    u = jnp.asarray([0.1, 0.6, 0.95], jnp.float32)
    lid, pmf_s, _ = lightsamplers.sample(t, u)
    assert np.allclose(np.asarray(pmf_s), 1.0 / sc.n_lights)
