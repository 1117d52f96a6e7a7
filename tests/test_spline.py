import jax
import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.core import spline


def make_grid(fn, res=(24, 20, 16), lo=(-1, -1, -1), hi=(1, 1, 1)):
    nx, ny, nz = res
    xs = np.linspace(lo[0], hi[0], nx)
    ys = np.linspace(lo[1], hi[1], ny)
    zs = np.linspace(lo[2], hi[2], nz)
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    data = fn(X, Y, Z)
    return spline.SplineGrid3D.from_samples(data, lo, hi)


def interior_points(n=500, seed=0, lim=0.7):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-lim, lim, (n, 3)).astype(np.float32))


class TestSpline:
    def test_interpolates_linear_exactly(self):
        # cubic B-spline reproduces polynomials up to degree 3
        g = make_grid(lambda x, y, z: 1.3 + 0.1 * x + 0.2 * y - 0.05 * z)
        p = interior_points()
        v = spline.value(g, p)
        ref = 1.3 + 0.1 * p[:, 0] + 0.2 * p[:, 1] - 0.05 * p[:, 2]
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref), atol=5e-4)

    def test_gradient_linear(self):
        g = make_grid(lambda x, y, z: 1.3 + 0.1 * x + 0.2 * y - 0.05 * z)
        p = interior_points(200)
        v, grad = spline.value_gradient(g, p)
        np.testing.assert_allclose(
            np.asarray(grad), np.tile([0.1, 0.2, -0.05], (200, 1)), atol=5e-3
        )

    def test_value_grad_hessian_quadratic(self):
        g = make_grid(
            lambda x, y, z: x * x + 0.5 * y * y - 0.2 * z * z + 0.3 * x * y,
            res=(32, 32, 32),
        )
        p = interior_points(200, seed=1, lim=0.6)
        v, grad, H = spline.value_gradient_hessian(g, p)
        x, y, z = np.asarray(p).T
        ref_v = x * x + 0.5 * y * y - 0.2 * z * z + 0.3 * x * y
        np.testing.assert_allclose(np.asarray(v), ref_v, atol=2e-3)
        ref_g = np.stack([2 * x + 0.3 * y, y + 0.3 * x, -0.4 * z], axis=-1)
        np.testing.assert_allclose(np.asarray(grad), ref_g, atol=1e-2)
        H = np.asarray(H)
        np.testing.assert_allclose(H[:, 0, 0], 2.0, atol=5e-2)
        np.testing.assert_allclose(H[:, 1, 1], 1.0, atol=5e-2)
        np.testing.assert_allclose(H[:, 2, 2], -0.4, atol=5e-2)
        np.testing.assert_allclose(H[:, 0, 1], 0.3, atol=5e-2)
        np.testing.assert_allclose(H[:, 0, 2], 0.0, atol=5e-2)

    def test_gradient_matches_jax_autodiff(self):
        g = make_grid(
            lambda x, y, z: np.sin(2 * x) * np.cos(1.5 * y) + 0.3 * z,
            res=(40, 40, 40),
        )
        p = interior_points(50, seed=2, lim=0.5)
        _, grad = spline.value_gradient(g, p)
        ad_grad = jax.vmap(jax.grad(lambda q: spline.value(g, q)))(p)
        np.testing.assert_allclose(np.asarray(grad), np.asarray(ad_grad), atol=1e-4)

    def test_smooth_function_accuracy(self):
        g = make_grid(
            lambda x, y, z: np.sin(2 * x) * np.cos(1.5 * y) * np.exp(0.2 * z),
            res=(48, 48, 48),
        )
        p = interior_points(300, seed=3, lim=0.6)
        v = spline.value(g, p)
        x, y, z = np.asarray(p).T
        ref = np.sin(2 * x) * np.cos(1.5 * y) * np.exp(0.2 * z)
        np.testing.assert_allclose(np.asarray(v), ref, atol=2e-4)


class TestTrilinear:
    def test_linear_exact(self):
        nx, ny, nz = 16, 16, 16
        xs = np.linspace(0, 1, nx)
        ys = np.linspace(0, 1, ny)
        zs = np.linspace(0, 1, nz)
        Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
        data = jnp.asarray((2 * X + 3 * Y + Z).astype(np.float32))
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.uniform(0.05, 0.95, (200, 3)).astype(np.float32))
        v = spline.trilinear(data, jnp.zeros(3), jnp.ones(3), p)
        ref = 2 * p[:, 0] + 3 * p[:, 1] + p[:, 2]
        np.testing.assert_allclose(np.asarray(v), np.asarray(ref), atol=1e-5)

    def test_outside_is_zero(self):
        data = jnp.ones((8, 8, 8))
        p = jnp.array([[2.0, 0.5, 0.5], [-1.0, 0.5, 0.5]])
        v = spline.trilinear(data, jnp.zeros(3), jnp.ones(3), p)
        np.testing.assert_allclose(np.asarray(v), 0.0)
