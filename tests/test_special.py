"""Tests for core/special.py (quad/brent/vMF/SH/chi2 — reference
src/libcore/{quad,brent,vmf,shvector}.cpp + chisquare.h)."""
import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.core import special


class TestQuadrature:
    def test_gauss_lobatto_poly_exact(self):
        # degree-9 exactness of the 7-point rule
        val = special.gauss_lobatto(lambda x: 10 * x ** 9, jnp.float32(0.0),
                                    jnp.float32(1.0), n_intervals=1)
        np.testing.assert_allclose(float(val), 1.0, rtol=1e-5)

    def test_gauss_lobatto_transcendental(self):
        val = special.gauss_lobatto(jnp.sin, jnp.float32(0.0),
                                    jnp.float32(np.pi), n_intervals=8)
        np.testing.assert_allclose(float(val), 2.0, rtol=1e-6)

    def test_gauss_lobatto_batched(self):
        b = jnp.array([1.0, 2.0, 3.0])
        val = special.gauss_lobatto(lambda x: x * x, jnp.zeros(3), b)
        np.testing.assert_allclose(np.asarray(val), np.asarray(b) ** 3 / 3,
                                   rtol=1e-5)

    def test_simpson(self):
        val = special.simpson(jnp.exp, jnp.float32(0.0), jnp.float32(1.0),
                              n_intervals=16)
        np.testing.assert_allclose(float(val), np.e - 1.0, rtol=1e-6)


class TestBrent:
    def test_scalar_roots(self):
        f = lambda x: x * x * x - 2.0 * x - 5.0
        root, ok = special.brent(f, jnp.float32(2.0), jnp.float32(3.0))
        assert bool(ok)
        np.testing.assert_allclose(float(root), 2.0945515, atol=1e-5)

    def test_vector_roots(self):
        targets = jnp.array([0.25, 0.5, 0.9], jnp.float32)
        f = lambda x: 1.0 - jnp.exp(-x) - targets  # root: -log(1-t)
        root, ok = special.brent(f, jnp.zeros(3), jnp.full((3,), 10.0))
        assert bool(ok.all())
        np.testing.assert_allclose(np.asarray(root),
                                   -np.log1p(-np.asarray(targets)), atol=1e-5)


class TestVMF:
    def test_pdf_normalized(self):
        for kappa in [0.5, 4.0, 50.0]:
            ct = np.linspace(-1, 1, 20001)
            pdf = np.asarray(special.vmf_pdf(jnp.asarray(ct, jnp.float32), kappa))
            integral = 2 * np.pi * np.trapezoid(pdf, ct)
            np.testing.assert_allclose(integral, 1.0, rtol=2e-3)

    def test_sample_mean_cosine(self):
        n = 200000
        rng = np.random.default_rng(0)
        u1 = jnp.asarray(rng.random(n), jnp.float32)
        u2 = jnp.asarray(rng.random(n), jnp.float32)
        kappa = 5.0
        d = np.asarray(special.vmf_sample(u1, u2, kappa))
        # mean cosine = coth(k) - 1/k
        expect = 1.0 / np.tanh(kappa) - 1.0 / kappa
        np.testing.assert_allclose(d[:, 2].mean(), expect, atol=5e-3)
        # kappa recovery
        k2 = float(special.vmf_kappa_for_mean_cosine(jnp.float32(expect)))
        np.testing.assert_allclose(k2, kappa, rtol=0.05)


class TestSH:
    def test_orthonormal(self):
        # project each basis function onto the basis: identity matrix
        for idx in range(9):
            coeff = np.asarray(special.sh_project(
                lambda d: special.sh_eval(d, 3)[..., idx], order=3, res=64))
            expect = np.zeros(9)
            expect[idx] = 1.0
            np.testing.assert_allclose(coeff, expect, atol=2e-3)

    def test_constant_projection(self):
        coeff = np.asarray(special.sh_project(
            lambda d: jnp.ones(d.shape[:-1]), order=2, res=32))
        # <1, Y00> = 0.28209479 * 4pi = sqrt(4pi)
        np.testing.assert_allclose(coeff[0], np.sqrt(4 * np.pi), rtol=1e-3)
        np.testing.assert_allclose(coeff[1:], 0.0, atol=1e-3)


class TestChi2:
    def test_uniform_passes(self):
        rng = np.random.default_rng(1)
        n = 100000
        counts = np.bincount(rng.integers(0, 64, n), minlength=64)
        chi2, dof = special.chi2_test(counts, np.full(64, 1 / 64), n)
        assert chi2 < special.chi2_threshold(dof)

    def test_biased_fails(self):
        n = 100000
        rng = np.random.default_rng(2)
        x = (rng.random(n) ** 1.3 * 64).astype(int).clip(0, 63)
        counts = np.bincount(x, minlength=64)
        chi2, dof = special.chi2_test(counts, np.full(64, 1 / 64), n)
        assert chi2 > special.chi2_threshold(dof)

    def test_threshold_sane(self):
        # chi2 0.9975 quantile for dof=50 is ~83.7
        assert abs(special.chi2_threshold(50) - 83.66) < 1.5


class TestPathLengthSampler:
    def test_importance_matches_correlation(self):
        import jax.numpy as jnp
        from mitsubaer_tpu.models import tof
        from mitsubaer_tpu.scene.types import RenderConfig

        cfg = RenderConfig(modulation="sine", lambda_=2.0,
                           min_bound=0.0, max_bound=4.0)
        u = jnp.asarray(np.random.default_rng(0).random(100000), jnp.float32)
        t, pdf = tof.sample_path_length(cfg, u)
        h, be = np.histogram(np.asarray(t), bins=64, range=(0, 4), density=True)
        mids = 0.5 * (be[:-1] + be[1:])
        ref = np.abs(np.cos(mids * np.pi))
        ref = ref / (ref.sum() * (be[1] - be[0]))
        assert np.corrcoef(h, ref)[0, 1] > 0.99
        np.testing.assert_allclose(float((1 / np.asarray(pdf)).mean()), 4.0,
                                   rtol=0.02)

    def test_area_under_correlation(self):
        import jax.numpy as jnp
        from mitsubaer_tpu.models import tof
        from mitsubaer_tpu.scene.types import RenderConfig

        cfg = RenderConfig(modulation="sine", lambda_=2.0,
                           min_bound=0.0, max_bound=2.0)
        # ∫|cos(pi t)| over one period of length 2 = 4/pi
        a = float(tof.area_under_correlation(cfg))
        np.testing.assert_allclose(a, 4 / np.pi, rtol=1e-2)
