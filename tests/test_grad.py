"""Gradient correctness: AD of the differentiable renderer vs closed forms
and finite differences (pattern: the reference's cerescheckgradients option,
heterogeneousrefractive.cpp:215, generalized to medium parameters)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsubaer_tpu.core import transform as tf
from mitsubaer_tpu.diff import render as diff_render
from mitsubaer_tpu.scene import types as T
from mitsubaer_tpu.scene.build import SceneBuilder

# minutes-long FD/chain validations (VERDICT r2: >9 min individually)
pytestmark = pytest.mark.slow


def absorbing_slab(sigma_a=0.5, res=6):
    b = SceneBuilder()
    med = b.add_medium(kind=T.MED_HOMOGENEOUS, sigma_a=(sigma_a,) * 3,
                       sigma_s=(0.0, 0.0, 0.0))
    b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=med)
    v = np.array([[-9, -9, 5], [9, -9, 5], [9, 9, 5], [-9, 9, 5]], np.float32)
    f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    b.add_mesh(v, f, bsdf=b.add_bsdf(), emitter_radiance=(2.0, 2.0, 2.0))
    b.set_perspective_sensor(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 8)
    b.config = b.config._replace(width=res, height=res, spp=1, max_depth=6,
                                 integrator="volpath")
    return b.build(), b.config


def scattering_box(sigma_s=0.8, sigma_a=0.2, g=0.3, heterogeneous=False, res=6):
    b = SceneBuilder()
    if heterogeneous:
        n = 8
        zs = np.linspace(-1, 1, n)
        Z, Y, X = np.meshgrid(zs, zs, zs, indexing="ij")
        dens = (0.5 + 0.5 * np.exp(-(X**2 + Y**2 + Z**2))).astype(np.float32)
        med = b.add_medium(kind=T.MED_HETEROGENEOUS, sigma_a=(sigma_a,) * 3,
                           sigma_s=(sigma_s,) * 3, phase_kind=T.PH_HG, g=g,
                           density=dens, density_aabb=((-1,) * 3, (1,) * 3))
    else:
        med = b.add_medium(kind=T.MED_HOMOGENEOUS, sigma_a=(sigma_a,) * 3,
                           sigma_s=(sigma_s,) * 3, phase_kind=T.PH_HG, g=g)
    b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=med)
    b.add_emitter(T.EM_POINT, radiance=(20.0,) * 3, position=(0, 0.5, -3))
    b.set_perspective_sensor(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 30)
    b.config = b.config._replace(width=res, height=res, spp=1, max_depth=8,
                                 integrator="volpath")
    return b.build(), b.config


def mean_image(scene, cfg, sppc, n_passes=1, seed=0):
    params = diff_render.get_params(scene)
    imgs = []
    for i in range(n_passes):
        imgs.append(diff_render.render_diff(
            scene, params, cfg, sppc, jnp.asarray(seed, jnp.uint32),
            jnp.asarray(i, jnp.uint32)))
    return np.mean([np.asarray(i) for i in imgs], axis=0)


def mean_grad(scene, cfg, sppc, n_passes=1, seed=0):
    params = diff_render.get_params(scene)

    def scalar(p, pi):
        img = diff_render.render_diff(scene, p, cfg, sppc,
                                      jnp.asarray(seed, jnp.uint32), pi)
        return jnp.mean(img)

    gf = jax.jit(jax.grad(scalar), static_argnames=())
    gs = [gf(params, jnp.asarray(i, jnp.uint32)) for i in range(n_passes)]
    return jax.tree.map(lambda *x: np.mean([np.asarray(v) for v in x], axis=0), *gs)


class TestAnalyticGradients:
    def test_beer_lambert_gradient(self):
        """Pixel = 2 exp(-2 sigma_a) => d(mean image)/d(sigma_a_c) =
        -2 * pixel / 3 (mean over channels)."""
        scene, cfg = absorbing_slab(sigma_a=0.5)
        img = mean_image(scene, cfg, sppc=16)
        g = mean_grad(scene, cfg, sppc=16)
        expected = -2.0 * img.mean() / 3.0
        got = np.asarray(g.sigma_a)[0]  # (3,) — each channel independent
        np.testing.assert_allclose(got, expected, rtol=0.05)

    def test_furnace_zero_gradient(self):
        """Albedo-1 medium in constant env: image == env for ANY sigma_s, so
        the expected gradient w.r.t. sigma_s is exactly zero. A pathwise-only
        (score-less) estimator fails this badly."""
        b = SceneBuilder()
        med = b.add_medium(kind=T.MED_HOMOGENEOUS, sigma_a=(0, 0, 0),
                           sigma_s=(1.0, 1.0, 1.0))
        b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=med)
        b.add_emitter(T.EM_CONSTANT, radiance=(1.0, 1.0, 1.0))
        b.set_perspective_sensor(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 25)
        b.config = b.config._replace(width=6, height=6, spp=1, max_depth=32,
                                     rr_depth=32, integrator="volpath")
        scene = b.build()
        g = mean_grad(scene, b.config, sppc=256, n_passes=4)
        # gradient magnitude should be noise around zero; compare against the
        # scale of the naive pathwise gradient (~O(path_length) ~ 2)
        assert np.abs(np.asarray(g.sigma_s)).max() < 0.15, g.sigma_s


class TestFiniteDifference:
    @pytest.mark.parametrize("heterogeneous", [False, True])
    def test_sigma_s_fd(self, heterogeneous):
        """Mean-image gradient w.r.t. uniform sigma_s scale vs central FD of
        the mean over many passes (same estimator family, different seeds)."""
        scene, cfg = scattering_box(heterogeneous=heterogeneous)
        sppc, n_passes = 128, 3

        g = mean_grad(scene, cfg, sppc, n_passes)
        g_ss = np.asarray(g.sigma_s).sum()  # d/d(all sigma_s entries together)

        eps = 0.05
        p0 = diff_render.get_params(scene)

        def img_at(delta, seed):
            p = p0._replace(sigma_s=p0.sigma_s + delta)
            vals = []
            for i in range(n_passes):
                vals.append(np.asarray(diff_render.render_diff(
                    scene, p, cfg, sppc, jnp.asarray(seed, jnp.uint32),
                    jnp.asarray(i, jnp.uint32))).mean())
            return np.mean(vals)

        fd = (img_at(eps, 0) - img_at(-eps, 0)) / (2 * eps)
        # fd differentiates the estimator at FIXED seeds => low-noise because
        # of common random numbers
        np.testing.assert_allclose(g_ss, fd, rtol=0.25, atol=0.01)

    def test_density_grid_fd(self):
        """Spot-check a single voxel gradient of the density grid by FD."""
        scene, cfg = scattering_box(heterogeneous=True)
        sppc, n_passes = 128, 2
        g = mean_grad(scene, cfg, sppc, n_passes)
        gd = np.asarray(g.density)
        # pick the voxel with the largest |gradient|
        idx = np.unravel_index(np.argmax(np.abs(gd)), gd.shape)
        p0 = diff_render.get_params(scene)
        eps = 0.2

        def img_at(delta):
            d = np.asarray(p0.density).copy()
            d[idx] += delta
            p = p0._replace(density=jnp.asarray(d))
            vals = []
            for i in range(n_passes):
                vals.append(np.asarray(diff_render.render_diff(
                    scene, p, cfg, sppc, jnp.asarray(0, jnp.uint32),
                    jnp.asarray(i, jnp.uint32))).mean())
            return np.mean(vals)

        fd = (img_at(eps) - img_at(-eps)) / (2 * eps)
        np.testing.assert_allclose(gd[idx], fd, rtol=0.35, atol=0.005)
