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
