"""Refractive-transfer integrator validation: equivalence against the plain
volumetric path tracer in limits where curved rays degenerate to straight
ones (the reference's own validation strategy — the 'Hack to match BDPT
homogeneous case', heterogeneousrefractive.cpp:1105-1107)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsubaer_tpu.core import transform as tf
from mitsubaer_tpu.integrators import render
from mitsubaer_tpu.models import eikonal as ek
from mitsubaer_tpu.scene import presets
from mitsubaer_tpu.scene import types as T
from mitsubaer_tpu.scene.build import SceneBuilder


def straight_reference_scene(res=24, spp=32, eta=1.0, sigma_s=(0.4,) * 3,
                             sigma_a=(0.02,) * 3, emitter="point"):
    """The same sphere scene built for the plain volpath integrator:
    homogeneous medium inside the sphere; null boundary when eta == 1
    (index-matched), dielectric otherwise."""
    b = SceneBuilder()
    med = b.add_medium(kind=T.MED_HOMOGENEOUS, sigma_a=tuple(sigma_a),
                       sigma_s=tuple(sigma_s))
    bsdf = -1 if eta == 1.0 else b.add_bsdf(T.BSDF_DIELECTRIC, eta=eta)
    b.add_sphere([0, 0, 0], 1.0, bsdf=bsdf, interior=med)
    if emitter == "point":
        b.add_emitter(T.EM_POINT, radiance=(40.0, 40.0, 40.0), position=(2.0, 2.0, -2.0))
    else:
        lb = b.add_bsdf(T.BSDF_DIFFUSE, reflectance=(0.0, 0.0, 0.0))
        v = np.array([[-3, -3, 3.0], [3, -3, 3.0], [3, 3, 3.0], [-3, 3, 3.0]], np.float32)
        f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
        b.add_mesh(v, f, bsdf=lb, emitter_radiance=(4.0, 4.0, 4.0))
    b.set_perspective_sensor(
        to_world=tf.look_at([0, 0, -3.5], [0, 0, 0], [0, 1, 0]), fov_deg=45.0,
    )
    b.config = b.config._replace(width=res, height=res, spp=spp, max_depth=8,
                                 integrator="volpath")
    return b.build(), b.config


class TestStraightLimit:
    def test_index_matched_matches_volpath(self):
        """Constant RIF n=1, no backdrop: the only transport is in-medium
        scattering + connections to the point light; the ER estimator's BVP
        connections degenerate to the straight attenuated NEE of volpath."""
        s_er, c_er = presets.refractive_sphere(
            res=20, spp=48, max_depth=8, rif_params=(1.0,), er_stepsize=0.02,
            backdrop=False,
        )
        s_vp, c_vp = straight_reference_scene(res=20, spp=48, eta=1.0)
        img_er = np.asarray(render.render(s_er, c_er))
        img_vp = np.asarray(render.render(s_vp, c_vp))
        assert np.isfinite(img_er).all()
        np.testing.assert_allclose(img_er.mean(), img_vp.mean(), rtol=0.08)
        # sphere region agreement
        ce, cv = img_er[6:14, 6:14].mean(), img_vp[6:14, 6:14].mean()
        np.testing.assert_allclose(ce, cv, rtol=0.1)

    def test_ball_lens_matches_dielectric_volpath(self):
        """Absorbing (sigma_s = 0) constant-RIF n=1.33 sphere in front of an
        area light: pure refraction + Beer-Lambert. Both integrators sample
        the identical family (refract-refract-hit), so images must agree."""
        s_er, c_er = presets.refractive_sphere(
            res=20, spp=48, max_depth=8, rif_params=(1.33,), er_stepsize=0.02,
            backdrop=False, emitter="area_behind",
            sigma_s=(0.0, 0.0, 0.0), sigma_a=(0.3, 0.3, 0.3),
        )
        s_vp, c_vp = straight_reference_scene(
            res=20, spp=48, eta=1.33, emitter="area",
            sigma_s=(0.0, 0.0, 0.0), sigma_a=(0.3, 0.3, 0.3),
        )
        img_er = np.asarray(render.render(s_er, c_er))
        img_vp = np.asarray(render.render(s_vp, c_vp))
        assert np.isfinite(img_er).all()
        np.testing.assert_allclose(img_er.mean(), img_vp.mean(), rtol=0.1)
        # the refracted image of the light through the ball lens
        ce, cv = img_er[7:13, 7:13].mean(), img_vp[7:13, 7:13].mean()
        np.testing.assert_allclose(ce, cv, rtol=0.15)


@pytest.mark.slow
class TestCurvedRendering:
    # each test is a distinct static shape -> its own ~5 min ER-engine
    # compile on the 2-core host; the physics they exercise is covered by
    # the fast eikonal unit tests + TestStraightLimit
    def test_radial_lens_renders(self):
        s, c = presets.refractive_sphere(
            res=20, spp=8, max_depth=6, rif_kind=ek.RIF_RADIAL,
            rif_params=(1.33, 0.15, 0.7, 0.0, 0.0, 0.0), er_stepsize=0.02,
        )
        img = np.asarray(render.render(s, c))
        assert np.isfinite(img).all()
        assert img.mean() > 0.01

    def test_acoustic_rif_renders(self):
        s, c = presets.refractive_sphere(
            res=16, spp=4, max_depth=5, rif_kind=ek.RIF_ACOUSTIC,
            rif_params=(1.3333, 0.03, 6.0, 0.0), er_stepsize=0.02,
        )
        img = np.asarray(render.render(s, c))
        assert np.isfinite(img).all()
        assert img.mean() > 0.001

    def test_lensing_changes_image(self):
        """A strong radial RIF must visibly redistribute light vs const."""
        s0, c0 = presets.refractive_sphere(res=32, spp=8, max_depth=5,
                                           rif_params=(1.33,), er_stepsize=0.03)
        s1, c1 = presets.refractive_sphere(
            res=32, spp=8, max_depth=5, rif_kind=ek.RIF_RADIAL,
            rif_params=(1.33, 0.25, 0.5, 0.0, 0.0, 0.0), er_stepsize=0.03,
        )
        a = np.asarray(render.render(s0, c0, seed=7))
        b = np.asarray(render.render(s1, c1, seed=7))
        # compare the through-sphere image center, where lensing acts
        # (measured rel ~0.20: the GRIN ball focuses the backdrop)
        ca, cb = a[10:22, 10:22], b[10:22, 10:22]
        rel = np.abs(ca - cb).mean() / (ca.mean() + 1e-9)
        assert rel > 0.05, rel

    def test_transient_er(self):
        """Optical path length drives transient bins: a refractive sphere in
        transient mode produces energy across multiple bins."""
        s, c = presets.refractive_sphere(
            res=12, spp=8, max_depth=5, rif_params=(1.33,), er_stepsize=0.02,
            decomposition="transient", min_bound=2.0, max_bound=14.0,
            bin_width=1.0,
        )
        img = np.asarray(render.render(s, c))
        F = c.n_frames
        assert img.shape[-1] == 3 * F
        per_bin = img.reshape(12, 12, F, 3).sum(axis=(0, 1, 3))
        assert (per_bin > 0).sum() >= 3  # energy spread over several bins


class TestBVPMultiplicity:
    """The curved-NEE restart machinery (makeDirectConnections,
    heterogeneousrefractive.cpp:1087-1163): uniform-hemisphere restarts,
    RR'd failures, Zeltner re-find check and Booth multiplicity weighting.
    A strong radial-Gaussian lens with a near-axis source/target pair has
    three distinct connecting rays (near-chord + over/under the core) —
    an unbiased estimator of the summed connection must report
    E[weight] == #solutions, where the old single-retry weight-1 scheme
    reports P(converge) <= 1."""

    def _fields(self):
        rif = ek.RifField(
            kind=jnp.int32(ek.RIF_RADIAL),
            params=jnp.array([1.0, 0.8, 0.35, 0, 0, 0, 0, 0], jnp.float32),
            coeff=jnp.zeros((1,)), aabb_min=jnp.zeros(3),
            aabb_max=jnp.ones(3))
        sdf = ek.SdfField(
            kind=jnp.int32(ek.SDF_SPHERE),
            params=jnp.array([0, 0, 0, 1.0, 0, 0, 0, 0], jnp.float32),
            coeff=jnp.zeros((1,)), aabb_min=jnp.zeros(3),
            aabb_max=jnp.ones(3))
        return rif, sdf

    @pytest.mark.slow
    def test_multi_solution_weight_unbiased(self):
        import jax
        from mitsubaer_tpu.core import rng

        rif, sdf = self._fields()
        n = 1024
        p1 = jnp.tile(jnp.array([[-0.7, 0.02, 0.0]], jnp.float32), (n, 1))
        p2 = jnp.tile(jnp.array([[0.7, 0.02, 0.0]], jnp.float32), (n, 1))
        chord = (p2 - p1) / jnp.linalg.norm(p2 - p1, axis=-1, keepdims=True)
        act = jnp.ones(n, bool)
        seed_bits = rng._hash_u32(
            jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
            + jnp.uint32(13))
        r = jax.jit(lambda: ek.solve_bvp(
            rif, sdf, p1, p2, chord, 0.01, 3000, act, tol2=1e-6,
            rr_weight=0.9, seed_bits=seed_bits, max_restarts=64))()
        w_eff = np.where(np.asarray(r.converged), np.asarray(r.weight), 0.0)
        mean, sem = w_eff.mean(), w_eff.std() / np.sqrt(n)
        # 3 solutions; allow truncation slack + 3 sigma
        assert 3.0 - 3.5 * sem - 0.45 < mean < 3.0 + 3.5 * sem + 0.45, (mean, sem)
        # the legacy weight-1 scheme measurably underestimates (<= 1)
        r0 = jax.jit(lambda: ek.solve_bvp(
            rif, sdf, p1, p2, chord, 0.01, 3000, act, tol2=1e-6))()
        w0 = np.where(np.asarray(r0.converged), np.asarray(r0.weight), 0.0)
        assert w0.mean() <= 1.0 + 1e-6

    def test_single_solution_weight_one(self):
        import jax
        from mitsubaer_tpu.core import rng

        rif, sdf = self._fields()
        # weak lens: unique connection
        rif = rif._replace(
            params=jnp.array([1.3, 0.1, 0.5, 0, 0, 0, 0, 0], jnp.float32))
        n = 128
        p1 = jnp.tile(jnp.array([[-0.5, 0.2, 0.1]], jnp.float32), (n, 1))
        p2 = jnp.tile(jnp.array([[0.6, -0.1, 0.0]], jnp.float32), (n, 1))
        chord = (p2 - p1) / jnp.linalg.norm(p2 - p1, axis=-1, keepdims=True)
        act = jnp.ones(n, bool)
        seed_bits = rng._hash_u32(
            jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(40503) + jnp.uint32(5))
        # rr_weight=1: failed solves always retry with no weight scaling, so
        # the returned weight isolates the multiplicity factor
        r = jax.jit(lambda: ek.solve_bvp(
            rif, sdf, p1, p2, chord, 0.01, 2000, act, tol2=1e-6,
            rr_weight=1.0, seed_bits=seed_bits, max_restarts=32))()
        conv = np.asarray(r.converged)
        assert conv.mean() > 0.9
        w = np.asarray(r.weight)[conv]
        assert np.all(np.abs(w - 1.0) < 1e-6), np.unique(w)


@pytest.mark.slow
class TestSensorSideConnections:
    """Sensor-side curved connections (makeSensorDirectConnections,
    heterogeneousrefractive.cpp:960-992): light particles inside the
    refractive body splat to the camera through the solved BVP + one
    boundary refraction."""

    def _scene(self, a):
        scene, cfg = presets.refractive_sphere(
            res=24, spp=1, max_depth=4, rif_kind=ek.RIF_RADIAL,
            rif_params=(1.33, a, 0.5, 0.0, 0.0, 0.0), er_stepsize=0.02,
            emitter="point", filter="box")
        return scene, cfg._replace(er_maxsteps=256, bvp_restarts=4)

    def test_light_image_renders_and_responds_to_rif(self):
        from mitsubaer_tpu.integrators import volpath_er as er

        scene, cfg = self._scene(0.0)
        img = np.asarray(er.render_er_light_image(scene, cfg, seed=0,
                                                  n_passes=3))
        assert np.isfinite(img).all()
        assert img.sum() > 0
        # a strong lens redistributes the splats
        scene2, cfg2 = self._scene(0.5)
        img2 = np.asarray(er.render_er_light_image(scene2, cfg2, seed=0,
                                                   n_passes=3))
        assert np.isfinite(img2).all() and img2.sum() > 0
        a = img.sum(-1).ravel(); b = img2.sum(-1).ravel()
        a = a / max(a.sum(), 1e-9); b = b / max(b.sum(), 1e-9)
        assert np.abs(a - b).sum() > 0.05, np.abs(a - b).sum()
