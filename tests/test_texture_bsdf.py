"""Textures (src/textures/*) + new BSDF lobes (roughdielectric, ward,
difftrans, roughplastic, mask) + envmap emitter."""
import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.core import transform as tf
from mitsubaer_tpu.models import bsdf as bsdf_m
from mitsubaer_tpu.models import texture as texture_m
from mitsubaer_tpu.models import emitter as emitter_m
from mitsubaer_tpu.scene import types as T
from mitsubaer_tpu.scene.build import SceneBuilder


def _bsdf_table(kind, **kw):
    nb = 1
    d = dict(
        kind=jnp.asarray([kind], jnp.int32),
        reflectance=jnp.full((nb, 3), 0.5),
        specular_r=jnp.ones((nb, 3)), specular_t=jnp.ones((nb, 3)),
        eta=jnp.full((nb,), 1.5), cond_eta=jnp.zeros((nb, 3)),
        cond_k=jnp.ones((nb, 3)), alpha=jnp.full((nb,), 0.2),
        exponent=jnp.full((nb,), 30.0), alpha_v=jnp.full((nb,), 0.1),
        opacity=jnp.ones((nb,)), texture=jnp.full((nb,), -1, jnp.int32),
        twosided=jnp.zeros((nb,), bool),
        child0=jnp.full((nb,), -1, jnp.int32),
        child1=jnp.full((nb,), -1, jnp.int32),
        mix_w=jnp.full((nb,), 0.5),
    )
    for k, v in kw.items():
        d[k] = v
    return T.BSDFs(**d)


def _consistency(kind, n=200000, seed=0, **kw):
    """E[weight] from sample() must equal MC integral of eval() (f/p match)."""
    bs = _bsdf_table(kind, **kw)
    rng = np.random.default_rng(seed)
    idx = jnp.zeros((n,), jnp.int32)
    wi = jnp.broadcast_to(jnp.asarray([0.4, 0.2, 0.89]), (n, 3))
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
    smp = bsdf_m.sample(bs, idx, wi,
                        jnp.asarray(rng.random((n, 2)), jnp.float32),
                        jnp.asarray(rng.random(n), jnp.float32))
    mean_w = np.asarray(smp.weight).mean(axis=0)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    f = np.asarray(bsdf_m.eval(bs, idx, wi, jnp.asarray(d, jnp.float32)))
    integral = f.mean(axis=0) * 4 * np.pi
    return mean_w, integral


class TestNewLobes:
    def test_ward_consistent(self):
        w, i = _consistency(T.BSDF_WARD,
                            specular_r=jnp.full((1, 3), 0.4))
        np.testing.assert_allclose(w, i, rtol=0.05)

    def test_roughplastic_consistent(self):
        w, i = _consistency(T.BSDF_ROUGHPLASTIC)
        np.testing.assert_allclose(w, i, rtol=0.08)

    def test_difftrans_consistent(self):
        w, i = _consistency(T.BSDF_DIFFTRANS)
        np.testing.assert_allclose(w, i, rtol=0.05)
        # all sampled directions on the far side
        bs = _bsdf_table(T.BSDF_DIFFTRANS)
        n = 1000
        rng = np.random.default_rng(1)
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        smp = bsdf_m.sample(bs, jnp.zeros((n,), jnp.int32), wi,
                            jnp.asarray(rng.random((n, 2)), jnp.float32),
                            jnp.asarray(rng.random(n), jnp.float32))
        assert (np.asarray(smp.wo)[:, 2] < 0).all()

    def test_roughdielectric_energy(self):
        # spec_r = spec_t = 1: Walter sampling weight = G_2/G_1-ish <= ~1 and
        # eval/pdf consistent within MC error
        w, i = _consistency(T.BSDF_ROUGHDIELECTRIC, n=400000)
        np.testing.assert_allclose(w, i, rtol=0.1)

    def test_mask_passthrough(self):
        bs = _bsdf_table(T.BSDF_DIFFUSE, opacity=jnp.full((1,), 0.25))
        n = 100000
        rng = np.random.default_rng(2)
        wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
        smp = bsdf_m.sample(bs, jnp.zeros((n,), jnp.int32), wi,
                            jnp.asarray(rng.random((n, 2)), jnp.float32),
                            jnp.asarray(rng.random(n), jnp.float32))
        frac = float(np.asarray(smp.null_passthrough).mean())
        assert abs(frac - 0.75) < 0.02  # 1 - opacity

    def test_active_filtering_matches_full(self):
        bs = _bsdf_table(T.BSDF_ROUGHCONDUCTOR)
        n = 1000
        rng = np.random.default_rng(3)
        wi = jnp.broadcast_to(jnp.asarray([0.3, 0.0, 0.95]), (n, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        u2 = jnp.asarray(rng.random((n, 2)), jnp.float32)
        u1 = jnp.asarray(rng.random(n), jnp.float32)
        full = bsdf_m.sample(bs, jnp.zeros((n,), jnp.int32), wi, u2, u1)
        filt = bsdf_m.sample(bs, jnp.zeros((n,), jnp.int32), wi, u2, u1,
                             active=(T.BSDF_ROUGHCONDUCTOR,))
        np.testing.assert_allclose(np.asarray(full.weight),
                                   np.asarray(filt.weight), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(full.wo), np.asarray(filt.wo),
                                   rtol=1e-6)


class TestTextures:
    def _tex_table(self, kind, **kw):
        d = dict(
            kind=jnp.asarray([kind], jnp.int32),
            color0=jnp.asarray([[1.0, 0.0, 0.0]]),
            color1=jnp.asarray([[0.0, 1.0, 0.0]]),
            uv_scale=jnp.ones((1, 2)), uv_offset=jnp.zeros((1, 2)),
            line_width=jnp.full((1,), 0.1),
            use_bitmap=jnp.zeros((1,), bool),
            bitmap=jnp.ones((1, 1, 3)),
        )
        d.update(kw)
        return T.Textures(**d)

    def test_checkerboard(self):
        tex = self._tex_table(T.TEX_CHECKERBOARD)
        uv = jnp.asarray([[0.25, 0.25], [1.25, 0.25], [1.25, 1.25]])
        v = np.asarray(texture_m.eval_texture(tex, jnp.zeros(3, jnp.int32), uv))
        np.testing.assert_allclose(v[0], [1, 0, 0])
        np.testing.assert_allclose(v[1], [0, 1, 0])
        np.testing.assert_allclose(v[2], [1, 0, 0])

    def test_bitmap_bilinear(self):
        img = np.zeros((2, 2, 3), np.float32)
        img[0, 0] = 1.0
        tex = self._tex_table(T.TEX_BITMAP, use_bitmap=jnp.ones((1,), bool),
                              bitmap=jnp.asarray(img))
        uv = jnp.asarray([[0.25, 0.25]])  # texel (0,0) center
        v = np.asarray(texture_m.eval_texture(tex, jnp.zeros(1, jnp.int32), uv))
        np.testing.assert_allclose(v[0], [1, 1, 1], atol=1e-5)

    def test_no_texture_is_identity(self):
        tex = self._tex_table(T.TEX_CHECKERBOARD)
        uv = jnp.asarray([[0.3, 0.8]])
        v = np.asarray(texture_m.eval_texture(
            tex, jnp.full((1,), -1, jnp.int32), uv))
        np.testing.assert_allclose(v[0], [1, 1, 1])

    def test_textured_render(self):
        # checkerboard floor lit by constant env: image shows both colors
        b = SceneBuilder()
        t = b.add_texture(T.TEX_CHECKERBOARD, color0=(1, 1, 1),
                          color1=(0.1, 0.1, 0.1), uv_scale=(4.0, 4.0))
        mat = b.add_bsdf(T.BSDF_DIFFUSE, reflectance=(0.8, 0.8, 0.8),
                         texture=t)
        v = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], np.float32)
        f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        b.add_mesh(v, f, bsdf=mat, uv=uv)
        b.add_emitter(T.EM_CONSTANT, radiance=(1.0, 1.0, 1.0))
        b.set_perspective_sensor(
            to_world=tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]), fov_deg=60)
        b.config = b.config._replace(width=32, height=32, spp=16, max_depth=3,
                                     integrator="path")
        scene = b.build()
        assert b.config.has_textures
        from mitsubaer_tpu.integrators import render
        img = np.asarray(render.render(scene, b.config, seed=0))
        lum = img.mean(axis=-1)
        # both bright and dark checker cells visible
        assert lum.max() > 2.5 * max(lum.min(), 1e-3)
        assert np.isfinite(img).all()


class TestEnvmap:
    def test_importance_sampling_integral(self):
        rng = np.random.default_rng(0)
        img = (rng.random((16, 32, 3)) ** 2).astype(np.float32) * 3.0
        b = SceneBuilder()
        b.add_emitter(T.EM_ENVMAP, envmap=img)
        b.set_perspective_sensor(np.eye(4, dtype=np.float32), 45.0)
        scene = b.build()
        u2 = jnp.asarray(rng.random((50000, 2)), jnp.float32)
        d, pdf, val = emitter_m.sample_env_direction(scene, u2)
        lum = np.asarray(val) @ np.array([0.2126, 0.7152, 0.0722])
        est = (lum / np.maximum(np.asarray(pdf), 1e-9)).mean()
        H, W = img.shape[:2]
        th = (np.arange(H) + 0.5) / H * np.pi
        w = np.sin(th)[:, None] * (np.pi / H) * (2 * np.pi / W)
        ref = (img @ np.array([0.2126, 0.7152, 0.0722]) * w).sum()
        np.testing.assert_allclose(est, ref, rtol=0.05)

    def test_pdf_matches_sampling(self):
        rng = np.random.default_rng(1)
        img = (rng.random((8, 16, 3))).astype(np.float32)
        b = SceneBuilder()
        b.add_emitter(T.EM_ENVMAP, envmap=img)
        b.set_perspective_sensor(np.eye(4, dtype=np.float32), 45.0)
        scene = b.build()
        u2 = jnp.asarray(rng.random((20000, 2)), jnp.float32)
        d, pdf, _ = emitter_m.sample_env_direction(scene, u2)
        pdf2 = emitter_m.env_pdf_direction(scene, d)
        a, b2 = np.asarray(pdf), np.asarray(pdf2)
        rel = np.abs(a - b2) / np.maximum(np.abs(a), 1e-5)
        # texel-edge samples round-trip into the neighboring texel (float32
        # atan2/arccos); allow that sub-0.5% tail
        assert (rel < 1e-3).mean() > 0.995

    def test_sky_is_blueish(self):
        img = emitter_m.make_sky_envmap([0.4, 0.0, 0.7], turbidity=2.5,
                                        res=32, with_sun=False)
        upper = img[:14]  # sky region away from horizon/sun: B >= R
        mask = upper.sum(-1) > 1e-3
        assert (upper[..., 2][mask] >= upper[..., 0][mask] * 0.8).mean() > 0.7


class TestWrapperBSDFs:
    """twosided.cpp + mixturebsdf.cpp/blendbsdf.cpp wrapper kinds."""

    def _table3(self):
        nb = 3
        d = dict(
            kind=jnp.asarray([T.BSDF_DIFFUSE, T.BSDF_ROUGHCONDUCTOR,
                              T.BSDF_MIXTURE], jnp.int32),
            reflectance=jnp.full((nb, 3), 0.6),
            specular_r=jnp.ones((nb, 3)), specular_t=jnp.ones((nb, 3)),
            eta=jnp.full((nb,), 1.5), cond_eta=jnp.zeros((nb, 3)),
            cond_k=jnp.ones((nb, 3)), alpha=jnp.full((nb,), 0.3),
            exponent=jnp.full((nb,), 30.0), alpha_v=jnp.full((nb,), 0.1),
            opacity=jnp.ones((nb,)), texture=jnp.full((nb,), -1, jnp.int32),
            twosided=jnp.zeros((nb,), bool),
            child0=jnp.asarray([-1, -1, 0], jnp.int32),
            child1=jnp.asarray([-1, -1, 1], jnp.int32),
            mix_w=jnp.asarray([0.5, 0.5, 0.35]),
        )
        return T.BSDFs(**d)

    def test_mixture_eval_is_convex_combo(self):
        bs = self._table3()
        n = 1024
        rng = np.random.default_rng(1)
        wi = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        wi = wi.at[:, 2].set(jnp.abs(wi[:, 2]) + 0.1)
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        wo = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        wo = wo.at[:, 2].set(jnp.abs(wo[:, 2]) + 0.1)
        wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
        i0 = jnp.zeros((n,), jnp.int32)
        f0 = bsdf_m.eval(bs, i0, wi, wo)
        f1 = bsdf_m.eval(bs, i0 + 1, wi, wo)
        fm = bsdf_m.eval(bs, i0 + 2, wi, wo)
        assert np.allclose(np.asarray(fm),
                           0.35 * np.asarray(f0) + 0.65 * np.asarray(f1),
                           atol=1e-5)
        p0 = bsdf_m.pdf(bs, i0, wi, wo)
        p1 = bsdf_m.pdf(bs, i0 + 1, wi, wo)
        pm = bsdf_m.pdf(bs, i0 + 2, wi, wo)
        assert np.allclose(np.asarray(pm),
                           0.35 * np.asarray(p0) + 0.65 * np.asarray(p1),
                           atol=1e-5)

    def test_mixture_sample_consistency(self):
        """E[sample weight] == MC integral of eval over the sphere."""
        bs = self._table3()
        n = 200000
        rng = np.random.default_rng(2)
        idx = jnp.full((n,), 2, jnp.int32)
        wi = jnp.broadcast_to(jnp.asarray([0.3, -0.1, 0.95]), (n, 3))
        wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
        smp = bsdf_m.sample(bs, idx, wi,
                            jnp.asarray(rng.random((n, 2)), jnp.float32),
                            jnp.asarray(rng.random(n), jnp.float32))
        mean_w = np.asarray(smp.weight).mean(axis=0)
        # MC reference: uniform sphere integral of eval
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        f = np.asarray(bsdf_m.eval(bs, idx, wi, jnp.asarray(d)))
        ref = f.mean(axis=0) * 4.0 * np.pi
        assert np.allclose(mean_w, ref, rtol=0.05), (mean_w, ref)

    def test_twosided_backface(self):
        nb = 2
        bs = T.BSDFs(
            kind=jnp.asarray([T.BSDF_DIFFUSE, T.BSDF_TWOSIDED], jnp.int32),
            reflectance=jnp.full((nb, 3), 0.7),
            specular_r=jnp.ones((nb, 3)), specular_t=jnp.ones((nb, 3)),
            eta=jnp.full((nb,), 1.5), cond_eta=jnp.zeros((nb, 3)),
            cond_k=jnp.ones((nb, 3)), alpha=jnp.full((nb,), 0.2),
            exponent=jnp.full((nb,), 30.0), alpha_v=jnp.full((nb,), 0.1),
            opacity=jnp.ones((nb,)), texture=jnp.full((nb,), -1, jnp.int32),
            twosided=jnp.zeros((nb,), bool),
            child0=jnp.asarray([-1, 0], jnp.int32),
            child1=jnp.asarray([-1, -1], jnp.int32),
            mix_w=jnp.full((nb,), 0.5),
        )
        n = 16
        wi_back = jnp.broadcast_to(jnp.asarray([0.2, 0.1, -0.97]), (n, 3))
        wi_back = wi_back / jnp.linalg.norm(wi_back, axis=-1, keepdims=True)
        wo_back = jnp.broadcast_to(jnp.asarray([-0.3, 0.2, -0.93]), (n, 3))
        wo_back = wo_back / jnp.linalg.norm(wo_back, axis=-1, keepdims=True)
        i0, i1 = jnp.zeros((n,), jnp.int32), jnp.ones((n,), jnp.int32)
        # plain diffuse: black from behind; twosided: mirrored-front value
        f_plain = np.asarray(bsdf_m.eval(bs, i0, wi_back, wo_back))
        f_ts = np.asarray(bsdf_m.eval(bs, i1, wi_back, wo_back))
        f_front = np.asarray(bsdf_m.eval(
            bs, i0, wi_back * jnp.asarray([1., 1., -1.]),
            wo_back * jnp.asarray([1., 1., -1.])))
        assert np.all(f_plain == 0)
        assert np.allclose(f_ts, f_front, atol=1e-6)
        # sampling from the back returns a back-hemisphere direction
        rng = np.random.default_rng(3)
        smp = bsdf_m.sample(bs, i1, wi_back,
                            jnp.asarray(rng.random((n, 2)), jnp.float32),
                            jnp.asarray(rng.random(n), jnp.float32))
        assert np.all(np.asarray(smp.wo[:, 2]) < 0)
