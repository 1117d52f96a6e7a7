import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsubaer_tpu.core import math as m
from mitsubaer_tpu.core import warp


def rand(shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(lo, hi, shape).astype(np.float32))


class TestVectors:
    def test_normalize(self):
        v = rand((128, 3), lo=-1, hi=1)
        n = m.normalize(v)
        np.testing.assert_allclose(m.length(n), 1.0, atol=1e-5)

    def test_normalize_zero_safe(self):
        n = m.normalize(jnp.zeros((4, 3)))
        assert np.all(np.isfinite(np.asarray(n)))

    def test_coordinate_system_orthonormal(self):
        n = m.normalize(rand((256, 3), lo=-1, hi=1))
        s, t = m.coordinate_system(n)
        np.testing.assert_allclose(m.dot(s, t), 0.0, atol=1e-5)
        np.testing.assert_allclose(m.dot(s, n), 0.0, atol=1e-5)
        np.testing.assert_allclose(m.dot(t, n), 0.0, atol=1e-5)
        np.testing.assert_allclose(m.length(s), 1.0, atol=1e-5)
        # right-handed: s x t == n
        np.testing.assert_allclose(np.asarray(m.cross(s, t)), np.asarray(n), atol=1e-5)

    def test_frame_roundtrip(self):
        n = m.normalize(rand((64, 3), seed=1, lo=-1, hi=1))
        f = m.Frame.from_normal(n)
        v = m.normalize(rand((64, 3), seed=2, lo=-1, hi=1))
        v2 = f.to_world(f.to_local(v))
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


class TestFresnel:
    def test_normal_incidence(self):
        F, _ = m.fresnel_dielectric(jnp.float32(1.0), jnp.float32(1.5))
        np.testing.assert_allclose(float(F), ((0.5 / 2.5) ** 2), atol=1e-6)

    def test_tir(self):
        # exiting at grazing angle beyond critical -> F = 1
        F, ct = m.fresnel_dielectric(jnp.float32(-0.1), jnp.float32(1.5))
        assert float(F) == 1.0

    def test_refract_snell(self):
        n = jnp.array([0.0, 0.0, 1.0])
        wi = m.normalize(jnp.array([0.5, 0.0, 0.8]))
        wt, tir = m.refract(wi, n, jnp.float32(1.5))
        assert not bool(tir)
        sin_i = float(m.length(wi[:2] - 0))  # sin of incident
        sin_i = float(np.sqrt(wi[0] ** 2 + wi[1] ** 2))
        sin_t = float(np.sqrt(wt[0] ** 2 + wt[1] ** 2))
        np.testing.assert_allclose(sin_i, 1.5 * sin_t, atol=1e-5)
        assert float(wt[2]) < 0  # goes into the surface

    def test_reflect(self):
        n = jnp.array([0.0, 0.0, 1.0])
        wi = m.normalize(jnp.array([1.0, 0.0, 1.0]))
        r = m.reflect(wi, n)
        np.testing.assert_allclose(np.asarray(r), [-wi[0], 0.0, wi[2]], atol=1e-6)


class TestWarp:
    def check_unit(self, d):
        np.testing.assert_allclose(np.asarray(m.length(d)), 1.0, atol=1e-4)

    def test_sphere_uniform(self):
        s = rand((200000, 2))
        d = warp.square_to_uniform_sphere(s)
        self.check_unit(d)
        # each octant should get ~1/8
        octant = (np.asarray(d) > 0).astype(int)
        codes = octant[:, 0] * 4 + octant[:, 1] * 2 + octant[:, 2]
        counts = np.bincount(codes, minlength=8) / len(codes)
        np.testing.assert_allclose(counts, 1 / 8, atol=0.01)

    def test_cosine_hemisphere_mean(self):
        s = rand((200000, 2), seed=3)
        d = warp.square_to_cosine_hemisphere(s)
        self.check_unit(d)
        assert np.all(np.asarray(d[:, 2]) >= 0)
        # E[cos theta] under pdf cos/pi is 2/3
        np.testing.assert_allclose(float(jnp.mean(d[:, 2])), 2 / 3, atol=0.01)

    def test_hg_mean_cosine(self):
        for g in [-0.5, 0.0, 0.3, 0.7]:
            s = rand((400000, 2), seed=int(g * 10) + 7)
            d = warp.square_to_hg(jnp.float32(g), s)
            self.check_unit(d)
            np.testing.assert_allclose(float(jnp.mean(d[:, 2])), g, atol=5e-3)

    def test_hg_pdf_normalized(self):
        # deterministic quadrature: 2*pi * int_{-1}^{1} pdf(c) dc == 1
        c = jnp.linspace(-1.0, 1.0, 20001)
        for g in [0.0, 0.7, -0.3]:
            pdf = warp.hg_pdf(jnp.float32(g), c)
            integral = float(jnp.trapezoid(pdf, c) * 2 * np.pi)
            np.testing.assert_allclose(integral, 1.0, atol=1e-4)

    def test_concentric_disk_in_unit(self):
        s = rand((100000, 2), seed=5)
        p = warp.square_to_uniform_disk_concentric(s)
        r2 = np.asarray(p[:, 0] ** 2 + p[:, 1] ** 2)
        assert r2.max() <= 1.0 + 1e-6
        # uniform: E[r^2] = 1/2
        np.testing.assert_allclose(r2.mean(), 0.5, atol=0.01)


class TestMIS:
    def test_power_heuristic(self):
        w = m.mis_weight_power(jnp.float32(1.0), jnp.float32(1.0))
        np.testing.assert_allclose(float(w), 0.5)
        w = m.mis_weight_power(jnp.float32(0.0), jnp.float32(0.0))
        assert float(w) == 0.0
