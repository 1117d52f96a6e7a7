"""Inverse rendering: end-to-end parameter recovery and RIF-voxel gradients
(the north star's new capability: d(image)/d(sigma, albedo, RIF grid))."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mitsubaer_tpu.core import transform as tf
from mitsubaer_tpu.diff import render as diff_render
from mitsubaer_tpu.models import eikonal as ek
from mitsubaer_tpu.scene import presets

# minutes-long FD/chain validations (VERDICT r2: >9 min individually)
pytestmark = pytest.mark.slow
from mitsubaer_tpu.scene import types as T
from mitsubaer_tpu.scene.build import SceneBuilder


def small_volume_scene(sigma_s=0.8, res=8):
    b = SceneBuilder()
    med = b.add_medium(kind=T.MED_HOMOGENEOUS, sigma_a=(0.1,) * 3,
                       sigma_s=(sigma_s,) * 3)
    b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=med)
    b.add_emitter(T.EM_POINT, radiance=(20.0,) * 3, position=(0, 0.5, -3))
    b.set_perspective_sensor(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 30)
    b.config = b.config._replace(width=res, height=res, spp=1, max_depth=6,
                                 integrator="volpath")
    return b.build(), b.config


class TestSigmaRecovery:
    def test_gradient_descent_recovers_sigma_s(self):
        """Render a target with sigma_s = 0.8, start from 0.3, and check that
        Adam on the MC loss moves sigma_s toward the truth."""
        scene_t, cfg = small_volume_scene(0.8)
        target = diff_render.render_diff(
            scene_t, diff_render.get_params(scene_t), cfg, 64,
            jnp.asarray(123, jnp.uint32), jnp.asarray(0, jnp.uint32),
        )
        scene_0, _ = small_volume_scene(0.3)
        params = diff_render.get_params(scene_0)
        opt = optax.adam(5e-2)
        opt_state = opt.init(params)
        sppc = 32
        for i in range(12):
            loss, g = diff_render.loss_and_grad(
                scene_0, params, cfg, sppc, jnp.asarray(7, jnp.uint32),
                jnp.asarray(i, jnp.uint32), target,
            )
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
        final = float(np.asarray(params.sigma_s).mean())
        assert 0.40 < final <= 1.2, final  # moved decisively toward 0.8
        assert np.isfinite(float(loss))


def spline_rif_sphere(res=8, amp=0.15):
    """Refractive sphere whose RIF is a SPLINE grid (differentiable) sampled
    from the radial-Gaussian profile."""
    n = 12
    zs = np.linspace(-1.2, 1.2, n)
    Z, Y, X = np.meshgrid(zs, zs, zs, indexing="ij")
    rif = (1.33 + amp * np.exp(-(X**2 + Y**2 + Z**2) / 0.36)).astype(np.float32)

    b = SceneBuilder()
    med = b.add_medium(
        kind=T.MED_REFRACTIVE, sigma_a=(0.02,) * 3, sigma_s=(0.4,) * 3,
        rif_kind=ek.RIF_SPLINE, rif=rif, rif_aabb=((-1.2,) * 3, (1.2,) * 3),
        sdf_kind=ek.SDF_SPHERE, sdf_params=(0.0, 0.0, 0.0, 1.0),
    )
    b.add_sphere([0, 0, 0], 1.0, bsdf=-1, interior=med)
    b.add_emitter(T.EM_POINT, radiance=(40.0,) * 3, position=(2.0, 2.0, -2.0))
    b.set_perspective_sensor(tf.look_at([0, 0, -3.5], [0, 0, 0], [0, 1, 0]), 40)
    b.config = b.config._replace(
        width=res, height=res, spp=1, max_depth=4, integrator="volpath_er",
        er_stepsize=0.05, er_maxsteps=96,
    )
    return b.build(), b.config


def render_er_diff(scene, params, cfg, sppc, seed, pass_idx):
    """Differentiable forward for the ER integrator (mean image)."""
    from mitsubaer_tpu.core import rng as rng_m
    from mitsubaer_tpu.integrators import volpath_er
    from mitsubaer_tpu.models import sensor as sensor_m

    scene = diff_render.put_params(scene, params)
    H, W = cfg.height, cfg.width
    npix = H * W
    pixel = jnp.tile(jnp.arange(npix, dtype=jnp.uint32), (sppc,))
    sample_index = jnp.repeat(
        pass_idx * sppc + jnp.arange(sppc, dtype=jnp.uint32), npix
    )
    smp = rng_m.make_sampler(seed, pixel, sample_index)
    jitter, smp = rng_m.next_2d(smp)
    px = (pixel % W).astype(jnp.float32) + jitter[:, 0]
    py = (pixel // W).astype(jnp.float32) + jitter[:, 1]
    rays = sensor_m.sample_rays(scene.sensor, px, py, W, H)
    sink, _ = volpath_er.li(scene, cfg, rays.o, rays.d, smp, pixel=pixel,
                            differentiable=True)
    return sink.steady.reshape(sppc, H, W, 3).mean(axis=0)


class TestRifGradients:
    def test_rif_voxel_gradient_nonzero_and_finite(self):
        """d(mean image)/d(RIF spline coefficients) exists, is finite, and
        concentrates inside the sphere region of the grid."""
        scene, cfg = spline_rif_sphere()
        params = diff_render.get_params(scene)

        f = jax.jit(
            lambda p: jnp.mean(render_er_diff(
                scene, p, cfg, 2, jnp.uint32(0), jnp.uint32(0))),
            static_argnames=(),
        )
        g = jax.grad(lambda p: f(p))(params)
        gr = np.asarray(g.rif)
        assert np.isfinite(gr).all()
        assert np.abs(gr).max() > 0, "RIF gradient is identically zero"
        # interior voxels should carry most of the gradient mass
        interior = np.abs(gr[3:-3, 3:-3, 3:-3]).sum()
        assert interior > 0.3 * np.abs(gr).sum()

    def test_rif_gradient_finite_difference(self):
        """Directional FD check: perturb the whole RIF grid by a smooth bump
        and compare <grad, bump> against central differences (common random
        numbers)."""
        scene, cfg = spline_rif_sphere()
        params = diff_render.get_params(scene)
        rng = np.random.default_rng(0)
        n = params.rif.shape[0]
        zs = np.linspace(-1, 1, n)
        Z, Y, X = np.meshgrid(zs, zs, zs, indexing="ij")
        bump = np.exp(-(X**2 + Y**2 + Z**2) / 0.5).astype(np.float32)
        bump_j = jnp.asarray(bump)

        def f(p):
            return jnp.mean(render_er_diff(
                scene, p, cfg, 4, jnp.uint32(3), jnp.uint32(0)))

        fj = jax.jit(f)
        g = jax.grad(f)(params)
        directional = float(jnp.sum(g.rif * bump_j))
        eps = 0.01
        fp = float(fj(params._replace(rif=params.rif + eps * bump_j)))
        fm = float(fj(params._replace(rif=params.rif - eps * bump_j)))
        fd = (fp - fm) / (2 * eps)
        # curved-ray pathwise gradients: FD at fixed seeds tracks the AD
        # derivative up to discrete-event flips (boundary/scatter changes)
        assert np.isfinite(directional) and np.isfinite(fd)
        assert np.sign(directional) == np.sign(fd) or abs(fd) < 1e-4, (directional, fd)
        np.testing.assert_allclose(directional, fd, rtol=0.5, atol=5e-3)
