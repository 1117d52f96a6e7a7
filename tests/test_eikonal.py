"""Eikonal core validation: curved-ray marching, refraction, BVP solves.

Reference behavior: heterogeneousrefractive.cpp (er_step :653, trace :671,
boundaryVelocity :1036, makeDirectConnections :1087)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsubaer_tpu.models import eikonal as ek


def const_rif(n0=1.4):
    return ek.RifField(
        kind=jnp.asarray(ek.RIF_CONST, jnp.int32),
        params=jnp.asarray([n0, 0, 0, 0, 0, 0, 0, 0], jnp.float32),
        coeff=jnp.ones((1, 1, 1), jnp.float32),
        aabb_min=jnp.zeros(3), aabb_max=jnp.ones(3),
    )


def linear_rif(n0=1.3, g=(0.0, 0.15, 0.0)):
    return ek.RifField(
        kind=jnp.asarray(ek.RIF_LINEAR, jnp.int32),
        params=jnp.asarray([n0, *g, 0, 0, 0, 0], jnp.float32),
        coeff=jnp.ones((1, 1, 1), jnp.float32),
        aabb_min=jnp.zeros(3), aabb_max=jnp.ones(3),
    )


def radial_rif(n0=1.33, amp=0.2, w=0.6, c=(0, 0, 0)):
    return ek.RifField(
        kind=jnp.asarray(ek.RIF_RADIAL, jnp.int32),
        params=jnp.asarray([n0, amp, w, *c, 0, 0], jnp.float32),
        coeff=jnp.ones((1, 1, 1), jnp.float32),
        aabb_min=jnp.zeros(3), aabb_max=jnp.ones(3),
    )


def sphere_sdf(c=(0, 0, 0), r=1.0):
    return ek.SdfField(
        kind=jnp.asarray(ek.SDF_SPHERE, jnp.int32),
        params=jnp.asarray([*c, r, 0, 0, 0, 0], jnp.float32),
        coeff=jnp.ones((1, 1, 1), jnp.float32),
        aabb_min=jnp.zeros(3), aabb_max=jnp.ones(3),
    )


class TestRifFields:
    def test_gradients_match_autodiff(self):
        for rif in [linear_rif(), radial_rif()]:
            p = jnp.asarray(
                np.random.default_rng(0).uniform(-0.5, 0.5, (20, 3)), jnp.float32
            )
            v, g = ek.rif_value_grad(rif, p)
            g_ad = jax.vmap(jax.grad(lambda q: ek.rif_value(rif, q[None])[0]))(p)
            np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-4)

    def test_hessian_matches_autodiff(self):
        rif = radial_rif()
        p = jnp.asarray(
            np.random.default_rng(1).uniform(-0.5, 0.5, (10, 3)), jnp.float32
        )
        _, _, H = ek.rif_value_grad_hess(rif, p)
        H_ad = jax.vmap(jax.hessian(lambda q: ek.rif_value(rif, q[None])[0]))(p)
        np.testing.assert_allclose(np.asarray(H), np.asarray(H_ad), atol=1e-3)

    def test_bessel_vs_scipy(self):
        from scipy.special import j0, j1

        x = np.linspace(0.0, 25.0, 200)
        np.testing.assert_allclose(
            np.asarray(ek.bessel_j0(jnp.asarray(x, jnp.float32))), j0(x), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(ek.bessel_j1(jnp.asarray(x, jnp.float32))), j1(x), atol=3e-4
        )

    def test_acoustic_gradient_matches_autodiff(self):
        rif = ek.RifField(
            kind=jnp.asarray(ek.RIF_ACOUSTIC, jnp.int32),
            params=jnp.asarray([1.3333, 0.04, 8.0, 0, 0, 0, 0, 0], jnp.float32),
            coeff=jnp.ones((1, 1, 1), jnp.float32),
            aabb_min=jnp.zeros(3), aabb_max=jnp.ones(3),
        )
        p = jnp.asarray(
            np.random.default_rng(2).uniform(-0.5, 0.5, (20, 3)), jnp.float32
        )
        _, g = ek.rif_value_grad(rif, p)
        g_ad = jax.vmap(jax.grad(lambda q: ek.rif_value(rif, q[None])[0]))(p)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ad), atol=1e-3)


class TestMarching:
    def test_straight_in_constant_rif(self):
        rif = const_rif(1.5)
        sdf = sphere_sdf(r=10.0)
        p = jnp.zeros((4, 3))
        d = jnp.asarray(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0.6, 0.8, 0.0]], jnp.float32
        )
        v = d * 1.5
        pf, vf, opt, marched, exited, _ = ek.trace_curved(
            rif, sdf, p, v, jnp.full((4,), 2.0), 0.01, 1000,
            jnp.ones((4,), bool),
        )
        np.testing.assert_allclose(np.asarray(pf), np.asarray(d) * 2.0, atol=1e-3)
        np.testing.assert_allclose(np.asarray(opt), 3.0, atol=1e-3)  # 2.0 * 1.5
        assert not np.any(np.asarray(exited))

    def test_bends_toward_higher_index(self):
        # n increases with +y: rays moving in +x curve upward (+y)
        rif = linear_rif(1.3, (0.0, 0.15, 0.0))
        sdf = sphere_sdf(r=50.0)
        p = jnp.zeros((1, 3))
        v = jnp.asarray([[1.3, 0.0, 0.0]])
        pf, vf, opt, _, _, _ = ek.trace_curved(
            rif, sdf, p, v, jnp.full((1,), 2.0), 0.005, 2000, jnp.ones((1,), bool)
        )
        assert float(pf[0, 1]) > 0.01
        assert float(vf[0, 1]) > 0.0

    def test_step_size_convergence(self):
        rif = radial_rif()
        sdf = sphere_sdf(r=50.0)
        p = jnp.asarray([[-1.5, 0.3, 0.0]])
        v = jnp.asarray([[1.0, 0.0, 0.0]]) * ek.rif_value(rif, p)[0]

        def end_at(h, steps):
            pf, _, _, _, _, _ = ek.trace_curved(
                rif, sdf, p, v, jnp.full((1,), 3.0), h, steps, jnp.ones((1,), bool)
            )
            return np.asarray(pf[0])

        e1 = end_at(0.02, 400)
        e2 = end_at(0.005, 1200)
        e3 = end_at(0.00125, 4000)
        # second-order integrator: error ratio ~16
        err12 = np.linalg.norm(e1 - e3)
        err23 = np.linalg.norm(e2 - e3)
        assert err23 < err12 / 4, (err12, err23)

    def test_optical_length_fermat_consistency(self):
        # optical length of traced ray ~ integral n ds along the path
        rif = linear_rif(1.3, (0.0, 0.2, 0.0))
        sdf = sphere_sdf(r=50.0)
        p = jnp.zeros((1, 3))
        v = jnp.asarray([[1.0, 0.0, 0.0]]) * 1.3
        pf, vf, opt, marched, _, _ = ek.trace_curved(
            rif, sdf, p, v, jnp.full((1,), 1.0), 0.002, 1000, jnp.ones((1,), bool)
        )
        # n along path in [1.3, 1.3 + 0.2*y_end]; opt must lie between
        y_end = float(pf[0, 1])
        assert 1.3 * 1.0 <= float(opt[0]) <= (1.3 + 0.2 * y_end) * 1.02

    def test_exits_at_boundary(self):
        rif = const_rif(1.4)
        sdf = sphere_sdf(r=1.0)
        p = jnp.zeros((1, 3))
        v = jnp.asarray([[1.4, 0.0, 0.0]])
        pf, vf, opt, marched, exited, _ = ek.trace_curved(
            rif, sdf, p, v, jnp.full((1,), 5.0), 0.01, 1000, jnp.ones((1,), bool)
        )
        assert bool(exited[0])
        assert 0.97 <= float(marched[0]) <= 1.0


class TestBoundary:
    def test_snell_scaled_velocity(self):
        # velocity magnitude n_in refracting into n_out: tangential preserved
        v = jnp.asarray([[0.6, 0.0, -1.2]])  # |v| = n_in where needed
        N = jnp.asarray([[0.0, 0.0, 1.0]])
        n_in = jnp.asarray([jnp.sqrt(0.36 + 1.44)])
        v2, tir = ek.boundary_velocity(v, N, n_in, jnp.ones(1))
        assert not bool(tir[0])
        # tangential component unchanged
        np.testing.assert_allclose(float(v2[0, 0]), 0.6, atol=1e-6)
        # |v_out| = n_out = 1
        np.testing.assert_allclose(
            float(jnp.linalg.norm(v2[0])), 1.0, atol=1e-5
        )

    def test_tir(self):
        # grazing exit from dense medium: TIR reflects
        v = jnp.asarray([[2.0, 0.0, -0.1]])
        N = jnp.asarray([[0.0, 0.0, 1.0]])
        n_in = jnp.asarray([float(jnp.linalg.norm(v[0]))])
        v2, tir = ek.boundary_velocity(v, N, n_in, jnp.ones(1))
        assert bool(tir[0])
        np.testing.assert_allclose(float(v2[0, 2]), 0.1, atol=1e-5)  # flipped


class TestBVP:
    def test_constant_rif_connects_chord(self):
        rif = const_rif(1.4)
        sdf = sphere_sdf(r=10.0)
        p1 = jnp.zeros((8, 3))
        rng = np.random.default_rng(3)
        p2 = jnp.asarray(rng.uniform(-1, 1, (8, 3)), jnp.float32)
        chord = p2 - p1
        # start from a perturbed direction
        init = np.asarray(chord)
        init = init + rng.normal(0, 0.25, init.shape)
        init = init / np.linalg.norm(init, axis=-1, keepdims=True)
        res = ek.solve_bvp(
            rif, sdf, p1, p2, jnp.asarray(init, jnp.float32), 0.01, 1000,
            jnp.ones((8,), bool), tol2=1e-5,
        )
        assert np.asarray(res.converged).all()
        d_expect = np.asarray(chord) / np.linalg.norm(np.asarray(chord), axis=-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(res.dir_to_target), d_expect, atol=5e-3
        )
        # optical length = n * |chord|
        np.testing.assert_allclose(
            np.asarray(res.opt_len),
            1.4 * np.linalg.norm(np.asarray(chord), axis=-1), rtol=0.02
        )

    def test_radial_rif_converges(self):
        rif = radial_rif(1.33, 0.15, 0.7)
        sdf = sphere_sdf(r=10.0)
        n = 8
        rng = np.random.default_rng(4)
        p1 = jnp.asarray(rng.uniform(-0.8, -0.3, (n, 3)), jnp.float32)
        p2 = jnp.asarray(rng.uniform(0.3, 0.8, (n, 3)), jnp.float32)
        chord = np.asarray(p2 - p1)
        init = chord / np.linalg.norm(chord, axis=-1, keepdims=True)
        res = ek.solve_bvp(
            rif, sdf, p1, p2, jnp.asarray(init, jnp.float32), 0.005, 2000,
            jnp.ones((n,), bool), tol2=1e-4, newton_iters=16,
        )
        # most connections should converge in a smooth lens field
        assert np.asarray(res.converged).mean() >= 0.75
        # verify by re-tracing the solved direction
        v0 = res.dir_to_target * ek.rif_value(rif, p1)[..., None]
        err, _, _, _, _, _, _ = ek.integrate_with_sensitivities(
            rif, sdf, p1, v0, p2, 0.005, 2000, jnp.ones((n,), bool)
        )
        conv = np.asarray(res.converged)
        e = np.linalg.norm(np.asarray(err), axis=-1)
        assert (e[conv] < 0.02).all(), e


class TestF64Core:
    """er_f64 option: the reference runs its eikonal math in double
    (FLOATDEBUG, fwd.h:174-184, config_release.py:7). The f64 path must (a)
    be self-convergent at the reference step size h=1e-3 through a spline
    RIF, and (b) reach BVP tol2=1e-6 at rates matching the f64 truth."""

    def _spline_fields(self, res=48):
        import numpy as onp
        from mitsubaer_tpu.core import spline as spl

        zs = onp.linspace(-1, 1, res)
        Z, Y, X = onp.meshgrid(zs, zs, zs, indexing="ij")
        n_field = 1.33 + 0.15 * onp.exp(-2.0 * (X**2 + Y**2 + Z**2))
        coeff = onp.asarray(spl.prefilter(jnp.asarray(n_field, jnp.float32)))
        rif = ek.RifField(kind=jnp.int32(ek.RIF_SPLINE),
                          params=jnp.zeros(8, jnp.float32),
                          coeff=jnp.asarray(coeff),
                          aabb_min=jnp.array([-1.0, -1, -1]),
                          aabb_max=jnp.array([1.0, 1, 1]))
        sdf = ek.SdfField(kind=jnp.int32(ek.SDF_SPHERE),
                          params=jnp.array([0, 0, 0, 0.95, 0, 0, 0, 0],
                                           jnp.float32),
                          coeff=jnp.zeros((1,)), aabb_min=jnp.zeros(3),
                          aabb_max=jnp.ones(3))
        return rif, sdf

    @pytest.mark.slow
    def test_f64_marching_convergence_and_f32_error(self):
        import jax
        from contextlib import contextmanager

        @contextmanager
        def enable_x64():
            jax.config.update("jax_enable_x64", True)
            try:
                yield
            finally:
                jax.config.update("jax_enable_x64", False)

        rif, sdf = self._spline_fields()
        n = 8
        th = np.linspace(0, 1.5, n, dtype=np.float32)
        p0 = np.stack([-0.8 * np.ones(n), 0.2 * np.sin(th),
                       0.2 * np.cos(th)], -1)
        v0 = np.tile(np.array([[1.0, 0.05, -0.02]], np.float32), (n, 1))
        v0 /= np.linalg.norm(v0, axis=-1, keepdims=True)
        act = jnp.ones(n, bool)

        def march(p, v, h, steps, dtype):
            pj = jnp.asarray(p, dtype)
            nj = ek.rif_value(rif, pj)
            vj = jnp.asarray(v, dtype) * nj[..., None]
            out = ek.trace_curved(rif, sdf, pj, vj, jnp.full((n,), 1.4,
                                                            dtype), h,
                                  steps, act)
            return np.asarray(out[2])  # optical length

        with enable_x64():
            o64 = march(p0, v0, 1e-3, 2000, jnp.float64)
            o64_fine = march(p0, v0, 2.5e-4, 8000, jnp.float64)
            o32 = march(p0, v0, 1e-3, 2000, jnp.float32)
        # f64 marching is step-converged at the reference h (O(h^2) leapfrog)
        assert np.max(np.abs(o64 - o64_fine) / np.abs(o64_fine)) < 2e-5, (
            o64, o64_fine)
        # f32 drifts measurably more than the f64-vs-fine discrepancy
        err32 = np.max(np.abs(o32 - o64) / np.abs(o64))
        assert err32 < 5e-3  # still usable for rendering
        # and the f64 option buys at least as tight a result
        assert np.max(np.abs(o64 - o64_fine)) <= np.max(np.abs(o32 - o64_fine)) + 1e-9

    @pytest.mark.slow
    def test_f64_bvp_convergence_rate(self):
        import jax
        from contextlib import contextmanager

        @contextmanager
        def enable_x64():
            jax.config.update("jax_enable_x64", True)
            try:
                yield
            finally:
                jax.config.update("jax_enable_x64", False)

        rif, sdf = self._spline_fields()
        n = 24
        th = np.linspace(0, 2 * np.pi, n, endpoint=False)
        p1 = np.stack([-0.6 * np.ones(n), 0.25 * np.sin(th),
                       0.25 * np.cos(th)], -1).astype(np.float32)
        p2 = np.stack([0.6 * np.ones(n), -0.15 * np.sin(th),
                       0.2 * np.cos(th)], -1).astype(np.float32)
        chord = p2 - p1
        chord /= np.linalg.norm(chord, axis=-1, keepdims=True)
        act = jnp.ones(n, bool)
        with enable_x64():
            r64 = ek.solve_bvp(rif, sdf, jnp.asarray(p1, jnp.float64),
                               jnp.asarray(p2, jnp.float64),
                               jnp.asarray(chord, jnp.float64), 2e-3, 1500,
                               act, tol2=1e-6)
            r32 = ek.solve_bvp(rif, sdf, jnp.asarray(p1), jnp.asarray(p2),
                               jnp.asarray(chord), 2e-3, 1500, act,
                               tol2=1e-6)
            c64 = np.asarray(r64.converged).mean()
            c32 = np.asarray(r32.converged).mean()
        assert c64 > 0.9, c64
        # f32 must be within reach of the f64 truth rate (documented margin)
        assert c32 >= c64 - 0.15, (c32, c64)


class TestAcousticModes:
    """Arbitrary Bessel-mode ultrasound RIF (acousticrifvolume.cpp:240-330:
    n = n0 + nmax J_mode(kr r) cos(mode phi)) — modes > 0 have azimuthal
    structure; gradient and Hessian must match finite differences."""

    def test_mode2_gradient_hessian_fd(self):
        rng = np.random.RandomState(3)
        prm = jnp.array([1.333, 0.05, 30.0, 2.0, 0, 0, 0, 0], jnp.float32)
        kind = jnp.int32(ek.RIF_ACOUSTIC)
        p = jnp.asarray(rng.uniform(-0.3, 0.3, (48, 3)).astype(np.float32))
        v, g, H = ek._rif_analytic(kind, prm, p, True)
        h = 1e-3
        for a in range(3):
            dp = np.zeros(3, np.float32)
            dp[a] = h
            vp, _, _ = ek._rif_analytic(kind, prm, p + dp, False)
            vm, _, _ = ek._rif_analytic(kind, prm, p - dp, False)
            fd = np.asarray((vp - vm) / (2 * h))
            assert np.abs(np.asarray(g[:, a]) - fd).max() < 2e-3 * (
                np.abs(fd).max() + 1), a
        for a in range(3):
            dp = np.zeros(3, np.float32)
            dp[a] = h
            _, gp, _ = ek._rif_analytic(kind, prm, p + dp, False)
            _, gm, _ = ek._rif_analytic(kind, prm, p - dp, False)
            fd = np.asarray((gp - gm) / (2 * h))
            assert np.abs(np.asarray(H[:, :, a]) - fd).max() < 5e-3 * (
                np.abs(fd).max() + 1), a

    def test_mode_azimuthal_symmetry(self):
        # mode-m field has m-fold cos symmetry: n(phi + 2pi/m) == n(phi)
        prm = jnp.array([1.3, 0.1, 12.0, 3.0, 0, 0, 0, 0], jnp.float32)
        kind = jnp.int32(ek.RIF_ACOUSTIC)
        r = 0.25
        phi = jnp.linspace(0, 2 * np.pi, 64, endpoint=False)
        p = jnp.stack([jnp.zeros_like(phi), r * jnp.sin(phi),
                       r * jnp.cos(phi)], -1)
        v, _, _ = ek._rif_analytic(kind, prm, p, False)
        v = np.asarray(v)
        shift = 64 // 3  # 2pi/3 rotation
        rolled = np.roll(v, -shift)
        # 64/3 isn't integer; use mode with divisor: recheck with m=4
        prm4 = prm.at[3].set(4.0)
        v4, _, _ = ek._rif_analytic(kind, prm4, p, False)
        v4 = np.asarray(v4)
        assert np.allclose(v4, np.roll(v4, -16), atol=2e-5)
