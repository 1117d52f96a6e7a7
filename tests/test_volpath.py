"""Volumetric path tracer validation against analytic results."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsubaer_tpu.core import rng, transform as tf
from mitsubaer_tpu.integrators import render
from mitsubaer_tpu.models import medium as medium_m
from mitsubaer_tpu.scene import presets
from mitsubaer_tpu.scene import types as T
from mitsubaer_tpu.scene.build import SceneBuilder


def absorbing_slab_scene(sigma_a, res=8):
    """Camera -> [cube medium] -> area light. Pure absorption: the pixel
    value equals Le * exp(-sigma_a * chord_length)."""
    b = SceneBuilder()
    med = b.add_medium(kind=T.MED_HOMOGENEOUS, sigma_a=tuple(sigma_a),
                       sigma_s=(0.0, 0.0, 0.0))
    b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=med)
    # big area light behind the cube at z=+5 facing -z
    v = np.array([[-9, -9, 5], [9, -9, 5], [9, 9, 5], [-9, 9, 5]], np.float32)
    f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    b.add_mesh(v, f, bsdf=b.add_bsdf(), emitter_radiance=(2.0, 2.0, 2.0))
    b.set_perspective_sensor(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 10)
    b.config = b.config._replace(width=res, height=res, spp=32, max_depth=8)
    return b.build(), b.config


class TestAbsorption:
    def test_beer_lambert(self):
        sigma = (0.3, 0.7, 1.2)
        scene, cfg = absorbing_slab_scene(sigma)
        cfg = cfg._replace(integrator="volpath")
        img = np.asarray(render.render(scene, cfg))
        center = img[3:5, 3:5].mean(axis=(0, 1))
        expected = 2.0 * np.exp(-np.array(sigma) * 2.0)  # chord length 2
        np.testing.assert_allclose(center, expected, rtol=0.02)

    def test_no_medium_matches_le(self):
        scene, cfg = absorbing_slab_scene((0.0, 0.0, 0.0))
        cfg = cfg._replace(integrator="volpath")
        img = np.asarray(render.render(scene, cfg))
        np.testing.assert_allclose(img[3:5, 3:5].mean(axis=(0, 1)), 2.0, rtol=0.01)


def volumetric_furnace(g=0.0, heterogeneous=False, res=12, spp=48):
    """Scattering-only medium (albedo 1) in a constant environment: energy
    conservation demands the image equal the environment radiance exactly,
    for any phase function and any density distribution."""
    b = SceneBuilder()
    if heterogeneous:
        n = 24
        zs = np.linspace(-1, 1, n)
        Z, Y, X = np.meshgrid(zs, zs, zs, indexing="ij")
        dens = (0.3 + np.exp(-2 * (X**2 + Y**2 + Z**2))).astype(np.float32)
        med = b.add_medium(kind=T.MED_HETEROGENEOUS, sigma_a=(0, 0, 0),
                           sigma_s=(1.5, 1.5, 1.5),
                           phase_kind=T.PH_HG if g else T.PH_ISOTROPIC, g=g,
                           density=dens, density_aabb=((-1, -1, -1), (1, 1, 1)))
    else:
        med = b.add_medium(kind=T.MED_HOMOGENEOUS, sigma_a=(0, 0, 0),
                           sigma_s=(1.0, 1.0, 1.0),
                           phase_kind=T.PH_HG if g else T.PH_ISOTROPIC, g=g)
    b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=med)
    b.add_emitter(T.EM_CONSTANT, radiance=(1.0, 1.0, 1.0))
    b.set_perspective_sensor(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 30)
    b.config = b.config._replace(width=res, height=res, spp=spp,
                                 max_depth=64, rr_depth=64, integrator="volpath")
    return b.build(), b.config


class TestVolumetricFurnace:
    @pytest.mark.parametrize("g", [0.0, 0.7])
    def test_homogeneous(self, g):
        scene, cfg = volumetric_furnace(g=g)
        img = np.asarray(render.render(scene, cfg))
        np.testing.assert_allclose(img.mean(axis=(0, 1)), 1.0, rtol=0.03)

    def test_heterogeneous_woodcock(self):
        scene, cfg = volumetric_furnace(heterogeneous=True)
        img = np.asarray(render.render(scene, cfg))
        np.testing.assert_allclose(img.mean(axis=(0, 1)), 1.0, rtol=0.04)


class TestWoodcockVsAnalytic:
    def test_constant_grid_matches_homogeneous(self):
        """A constant density grid must statistically match the analytic
        homogeneous medium."""
        def make(heterogeneous):
            b = SceneBuilder()
            if heterogeneous:
                dens = np.ones((4, 4, 4), np.float32)
                med = b.add_medium(kind=T.MED_HETEROGENEOUS, sigma_a=(0.1,) * 3,
                                   sigma_s=(0.9,) * 3, density=dens,
                                   density_aabb=((-1,) * 3, (1,) * 3))
            else:
                med = b.add_medium(kind=T.MED_HOMOGENEOUS, sigma_a=(0.1,) * 3,
                                   sigma_s=(0.9,) * 3)
            b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=med)
            b.add_emitter(T.EM_POINT, radiance=(20.0,) * 3, position=(0, 0, -3))
            b.set_perspective_sensor(tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), 30)
            b.config = b.config._replace(width=12, height=12, spp=64,
                                         max_depth=16, integrator="volpath")
            return b.build(), b.config

        sa, ca = make(False)
        sb, cb = make(True)
        ia = np.asarray(render.render(sa, ca))
        ib = np.asarray(render.render(sb, cb))
        np.testing.assert_allclose(ia.mean(), ib.mean(), rtol=0.05)


class TestDistanceSampling:
    def test_homogeneous_unbiased_transmittance(self):
        """E[weight * indicator(fail)] over the gated estimator equals the
        true transmittance, and E[success weight scatter estimate] integrates
        the source term — here check the partition: failure branch alone must
        average to Tr/pdfFail * pdfFail = Tr."""
        n = 200000
        u = np.random.default_rng(0).uniform(size=n).astype(np.float32)
        uc = np.random.default_rng(1).uniform(size=n).astype(np.float32)
        sa = jnp.tile(jnp.array([[0.2, 0.4, 0.8]]), (n, 1)) * 0.1
        ss = jnp.tile(jnp.array([[1.0, 2.0, 3.0]]), (n, 1)) * 0.1
        w = jnp.full((n,), 0.8)
        t_max = jnp.full((n,), 2.0)
        succ, dist, weight, _logp = medium_m.sample_distance_homogeneous(
            sa, ss, w, t_max, jnp.asarray(u), jnp.asarray(uc)
        )
        succ = np.asarray(succ)
        weight = np.asarray(weight)
        sigma_t = np.array([0.12, 0.24, 0.38])
        # failure branch estimates Tr(t_max) when weighted by its probability
        est_tr = np.where(~succ[:, None], weight, 0.0).mean(axis=0)
        np.testing.assert_allclose(est_tr, np.exp(-sigma_t * 2.0), rtol=0.02)

    def test_woodcock_expected_collision_rate(self):
        """Collision probability within the slab equals 1 - Tr for a constant
        grid."""
        from mitsubaer_tpu.scene.build import SceneBuilder as SB

        b = SB()
        med = b.add_medium(kind=T.MED_HETEROGENEOUS, sigma_a=(0.25,) * 3,
                           sigma_s=(0.25,) * 3, density=np.ones((2, 2, 2), np.float32),
                           density_aabb=((-1,) * 3, (1,) * 3))
        b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=med)
        scene = b.build()
        n = 100000
        o = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
        smp = rng.make_sampler(0, jnp.arange(n), 0)
        kind, sa, ss, sw, scale = medium_m.params(
            scene.media, jnp.zeros((n,), jnp.int32)
        )
        hit, dist, wgt, p, smp, _lp = medium_m.sample_distance_woodcock(
            scene.media, sa, ss, scale, o, d, jnp.full((n,), 2.0), smp,
            jnp.ones((n,), bool),
        )
        p_col = np.asarray(hit).mean()
        np.testing.assert_allclose(p_col, 1.0 - np.exp(-0.5 * 2.0), atol=0.01)


class TestBeamScene:
    def test_renders_finite_nonzero(self):
        scene, cfg = presets.volumetric_box(res=24, spp=8)
        img = np.asarray(render.render(scene, cfg))
        assert np.isfinite(img).all()
        assert img.mean() > 0.01
        # beam enters lower-left of frame: that quadrant dominates
        q = img.reshape(2, 12, 2, 12, 3).mean(axis=(1, 3, 4))
        assert q[1, 0] == q.max()

    def test_heterogeneous_beam(self):
        scene, cfg = presets.volumetric_box(res=16, spp=8, heterogeneous=True)
        img = np.asarray(render.render(scene, cfg))
        assert np.isfinite(img).all()
        assert img.mean() > 0.001


class TestOrientationField:
    """Per-voxel flake/fiber orientation (heterogeneous.cpp:164 'orientation'
    VolumeDataSource): phase lobes must follow the LOCAL axis."""

    def test_orientation_axis_lookup(self):
        import jax.numpy as jnp
        from mitsubaer_tpu.models import medium as medium_m
        from mitsubaer_tpu.scene.build import SceneBuilder
        from mitsubaer_tpu.scene import types as T

        n = 8
        orient = np.zeros((n, n, n, 3), np.float32)
        orient[..., 0] = 1.0          # +x in the lower half (z index)
        orient[n // 2:, :, :, :] = [0.0, 1.0, 0.0]   # +y in the upper half
        b = SceneBuilder()
        b.add_medium(kind=T.MED_HETEROGENEOUS, sigma_a=(0.1,) * 3,
                     sigma_s=(1.0,) * 3, phase_kind=T.PH_MICROFLAKE,
                     kappa=8.0, density=np.ones((n, n, n), np.float32),
                     density_aabb=((-1, -1, -1), (1, 1, 1)),
                     orientation=orient)
        b.add_sphere([0, 0, 0], 1.0, bsdf=-1, interior=0)
        b.add_emitter(T.EM_POINT, radiance=(1.0,) * 3, position=(2, 2, 2))
        b.set_perspective_sensor(
            to_world=tf.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]),
            fov_deg=45)
        scene = b.build()
        assert b.config.phase_orient
        p = jnp.asarray([[0.0, 0.0, -0.7], [0.0, 0.0, 0.7]], jnp.float32)
        idx = jnp.zeros((2,), jnp.int32)
        ax = np.asarray(medium_m.orientation_axis(scene.media, idx, p))
        np.testing.assert_allclose(ax[0], [1, 0, 0], atol=1e-5)
        np.testing.assert_allclose(ax[1], [0, 1, 0], atol=1e-5)
        # phase eval differs between the two regions for identical wi/wo
        from mitsubaer_tpu.models import phase as phase_m
        wi = jnp.asarray([[0.6, 0.0, 0.8]] * 2, jnp.float32)
        wo = jnp.asarray([[0.8, 0.0, -0.6]] * 2, jnp.float32)
        v = np.asarray(phase_m.eval(scene.media.phase, idx, wi, wo,
                                    axis_override=jnp.asarray(ax)))
        assert abs(v[0] - v[1]) > 1e-4, v

    def test_oriented_render_runs(self):
        n = 8
        orient = np.zeros((n, n, n, 3), np.float32)
        orient[..., 2] = 1.0
        from mitsubaer_tpu.scene.build import SceneBuilder
        from mitsubaer_tpu.scene import types as T
        from mitsubaer_tpu.integrators import render as rm

        b = SceneBuilder()
        m = b.add_medium(kind=T.MED_HETEROGENEOUS, sigma_a=(0.05,) * 3,
                         sigma_s=(2.0,) * 3, phase_kind=T.PH_MICROFLAKE,
                         kappa=6.0, density=np.ones((n, n, n), np.float32),
                         density_aabb=((-1, -1, -1), (1, 1, 1)),
                         orientation=orient)
        b.add_cube(to_world=np.eye(4, dtype=np.float32), bsdf=-1, interior=m)
        b.add_emitter(T.EM_POINT, radiance=(30.0,) * 3,
                      position=(1.5, 1.5, -1.5))
        b.set_perspective_sensor(
            to_world=tf.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]),
            fov_deg=45)
        b.config = b.config._replace(width=16, height=16, spp=8,
                                     integrator="volpath", max_depth=4,
                                     filter="box")
        img = np.asarray(rm.render(b.build(), b.config, seed=0))
        assert np.isfinite(img).all() and img.mean() > 0
