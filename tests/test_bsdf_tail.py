"""Round-5 BSDF tail: roughdiffuse (Oren-Nayar), coating, roughcoating
(src/bsdfs/roughdiffuse.cpp, coating.cpp, roughcoating.cpp).

House-style sample/eval/pdf consistency checks (the same invariants the
reference's chi-square harness enforces, test_chisquare.cpp:30-37):
E[sample weight restricted to non-delta lobes] == MC integral of eval."""
import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.models import bsdf as bsdf_m
from mitsubaer_tpu.scene import types as T


def _table(rows):
    """Build a BSDFs table from a list of per-row dict overrides."""
    nb = len(rows)
    d = dict(
        kind=[T.BSDF_DIFFUSE] * nb,
        reflectance=[(0.5, 0.5, 0.5)] * nb,
        specular_r=[(1.0, 1.0, 1.0)] * nb,
        specular_t=[(1.0, 1.0, 1.0)] * nb,
        eta=[1.5] * nb, cond_eta=[(0.0,) * 3] * nb, cond_k=[(1.0,) * 3] * nb,
        alpha=[0.2] * nb, exponent=[30.0] * nb, alpha_v=[0.1] * nb,
        opacity=[1.0] * nb, texture=[-1] * nb,
        twosided=[False] * nb, child0=[-1] * nb, child1=[-1] * nb,
        mix_w=[0.5] * nb,
    )
    for i, r in enumerate(rows):
        for k, v in r.items():
            d[k][i] = v
    casts = dict(kind=jnp.int32, texture=jnp.int32, child0=jnp.int32,
                 child1=jnp.int32, twosided=bool)
    return T.BSDFs(**{k: jnp.asarray(np.array(v), casts.get(k, jnp.float32))
                      for k, v in d.items()})


def _consistency(bs, row=0, n=300000, seed=0, wi=(0.4, 0.2, 0.89)):
    rng = np.random.default_rng(seed)
    idx = jnp.full((n,), row, jnp.int32)
    wi = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    smp = bsdf_m.sample(bs, idx, wi,
                        jnp.asarray(rng.random((n, 2)), jnp.float32),
                        jnp.asarray(rng.random(n), jnp.float32))
    w = np.asarray(jnp.where(smp.delta[..., None], 0.0, smp.weight))
    mean_w = w.mean(axis=0)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    f = np.asarray(bsdf_m.eval(bs, idx, wi, jnp.asarray(d, jnp.float32)))
    integral = f.mean(axis=0) * 4 * np.pi
    return mean_w, integral, smp


def test_roughdiffuse_consistent():
    bs = _table([dict(kind=T.BSDF_ROUGHDIFFUSE, alpha=0.35)])
    w, i, _ = _consistency(bs)
    np.testing.assert_allclose(w, i, rtol=0.05)


def test_roughdiffuse_sigma0_is_diffuse():
    bs = _table([dict(kind=T.BSDF_ROUGHDIFFUSE, alpha=0.0),
                 dict(kind=T.BSDF_DIFFUSE)])
    n = 5000
    rng = np.random.default_rng(4)
    wi = jnp.broadcast_to(jnp.asarray([0.3, -0.1, 0.95]), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    wo = rng.normal(size=(n, 3))
    wo[:, 2] = np.abs(wo[:, 2])
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wo = jnp.asarray(wo, jnp.float32)
    f0 = bsdf_m.eval(bs, jnp.zeros((n,), jnp.int32), wi, wo)
    f1 = bsdf_m.eval(bs, jnp.ones((n,), jnp.int32), wi, wo)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f1), atol=1e-6)


def test_roughdiffuse_darkens_at_normal_view():
    """Oren-Nayar at normal incidence+exit is darker than Lambert (A<1)."""
    bs = _table([dict(kind=T.BSDF_ROUGHDIFFUSE, alpha=0.5),
                 dict(kind=T.BSDF_DIFFUSE)])
    wi = jnp.asarray([[0.0, 0.0, 1.0]])
    wo = jnp.asarray([[0.0, 0.0, 1.0]])
    f_on = np.asarray(bsdf_m.eval(bs, jnp.zeros((1,), jnp.int32), wi, wo))
    f_lam = np.asarray(bsdf_m.eval(bs, jnp.ones((1,), jnp.int32), wi, wo))
    assert (f_on < f_lam).all()


def _coat_table(kind, sig=(0.0, 0.0, 0.0), alpha=0.15):
    return _table([
        dict(kind=kind, child0=1, eta=1.5, specular_t=sig, alpha=alpha,
             specular_r=(1.0, 1.0, 1.0)),
        dict(kind=T.BSDF_DIFFUSE, reflectance=(0.6, 0.3, 0.2)),
    ])


def test_coating_consistent():
    bs = _coat_table(T.BSDF_COATING)
    w, i, smp = _consistency(bs, n=400000)
    np.testing.assert_allclose(w, i, rtol=0.06)
    # the delta lobe exists (specular reflection off the coat)
    assert 0.01 < float(np.asarray(smp.delta).mean()) < 0.5


def test_coating_absorption_darkens():
    clear = _coat_table(T.BSDF_COATING, sig=(0.0, 0.0, 0.0))
    tinted = _coat_table(T.BSDF_COATING, sig=(0.5, 0.5, 0.5))
    n = 1000
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    wo = jnp.broadcast_to(
        jnp.asarray([0.3, 0.0, 0.954]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    f_c = np.asarray(bsdf_m.eval(clear, jnp.zeros((n,), jnp.int32), wi, wo))
    f_t = np.asarray(bsdf_m.eval(tinted, jnp.zeros((n,), jnp.int32), wi, wo))
    assert (f_t < f_c).all() and (f_t > 0).all()


def test_coating_near_normal_value():
    """At near-normal angles the coated value is (1-F)^2 invEta^2
    cos(wo)/cos(wo') of bare Lambert (coating.cpp eval) ~= 0.41x for
    eta=1.5 — the invEta^2 solid-angle compression is reclaimed by the
    eta^2 refraction Jacobian under the albedo integral, which the
    sample/eval consistency test covers."""
    bs = _coat_table(T.BSDF_COATING)
    n = 1000
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.3, 0.954]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    f_coat = np.asarray(bsdf_m.eval(bs, jnp.zeros((n,), jnp.int32), wi, wo))
    f_bare = np.asarray(bsdf_m.eval(bs, jnp.ones((n,), jnp.int32), wi, wo))
    np.testing.assert_allclose(f_coat, f_bare * 0.41, rtol=0.05)


def test_roughcoating_consistent():
    bs = _coat_table(T.BSDF_ROUGHCOATING, alpha=0.25)
    w, i, smp = _consistency(bs, n=400000)
    np.testing.assert_allclose(w, i, rtol=0.08)
    assert not bool(np.asarray(smp.delta).any())  # rough coat: no delta


def test_coating_pdf_matches_sample_histogram():
    """Coarse sample-vs-pdf agreement: cos-theta histogram of non-delta
    samples vs pdf-weighted integral over the same bins."""
    bs = _coat_table(T.BSDF_COATING)
    n = 200000
    rng = np.random.default_rng(7)
    idx = jnp.zeros((n,), jnp.int32)
    wi = jnp.broadcast_to(jnp.asarray([0.2, 0.1, 0.97]), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    smp = bsdf_m.sample(bs, idx, wi,
                        jnp.asarray(rng.random((n, 2)), jnp.float32),
                        jnp.asarray(rng.random(n), jnp.float32))
    keep = ~np.asarray(smp.delta)
    ct = np.asarray(smp.wo)[:, 2][keep]
    hist, edges = np.histogram(ct, bins=8, range=(0, 1))
    hist = hist / n
    # pdf integral per bin via MC over the upper hemisphere
    m = 400000
    d = rng.normal(size=(m, 3))
    d[:, 2] = np.abs(d[:, 2])
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p = np.asarray(bsdf_m.pdf(
        bs, jnp.zeros((m,), jnp.int32),
        jnp.broadcast_to(wi[:1], (m, 3)), jnp.asarray(d, jnp.float32)))
    which = np.clip((d[:, 2] * 8).astype(int), 0, 7)
    expect = np.zeros(8)
    np.add.at(expect, which, p)
    expect *= 2 * np.pi / m
    mask = expect > 0.01
    np.testing.assert_allclose(hist[mask], expect[mask], rtol=0.15)


def _quad_scene(normal_rgb=None, kind=None):
    from mitsubaer_tpu.core import transform as tf
    from mitsubaer_tpu.scene.build import SceneBuilder

    b = SceneBuilder()
    mat = b.add_bsdf(T.BSDF_DIFFUSE, reflectance=(0.6, 0.6, 0.6))
    if normal_rgb is not None:
        img = np.broadcast_to(np.asarray(normal_rgb, np.float32), (8, 8, 3))
        tid = b.add_texture(kind=kind or T.TEX_NORMALMAP, bitmap=img,
                            color0=(1.0, 1.0, 1.0))
        b._bsdfs[mat].normal_tex = tid
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                 np.float32)
    f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    b.add_mesh(v, f, bsdf=mat, uv=uv)
    b.add_emitter(T.EM_POINT, radiance=(8.0, 8.0, 8.0),
                  position=(2.0, 0.0, -2.0))
    b.set_perspective_sensor(
        to_world=tf.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]), fov_deg=40.0)
    b.config = b.config._replace(width=24, height=24, spp=16, max_depth=2,
                                 integrator="path", engine="loop")
    return b.build(), b.config


def test_normalmap_flat_matches_unmapped():
    from mitsubaer_tpu.integrators import render as render_m
    s0, c0 = _quad_scene()
    s1, c1 = _quad_scene(normal_rgb=(0.5, 0.5, 1.0))
    a = np.asarray(render_m.render(s0, c0, seed=0))
    b = np.asarray(render_m.render(s1, c1, seed=0))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_normalmap_tilt_changes_shading():
    from mitsubaer_tpu.integrators import render as render_m
    s0, c0 = _quad_scene(normal_rgb=(0.5, 0.5, 1.0))
    # mild ~23 degree tilt toward +x (the light side): brighter lambertian
    s1, c1 = _quad_scene(normal_rgb=(0.65, 0.5, 0.85))
    a = np.asarray(render_m.render(s0, c0, seed=0)).mean()
    b = np.asarray(render_m.render(s1, c1, seed=0)).mean()
    assert np.isfinite(b)
    assert b > a * 1.02  # normals lean toward the light


def test_bumpmap_flat_matches_unmapped():
    from mitsubaer_tpu.integrators import render as render_m
    s0, c0 = _quad_scene()
    s1, c1 = _quad_scene(normal_rgb=(0.7, 0.7, 0.7), kind=T.TEX_BUMPMAP)
    a = np.asarray(render_m.render(s0, c0, seed=0))
    b = np.asarray(render_m.render(s1, c1, seed=0))
    np.testing.assert_allclose(a, b, atol=2e-3)
