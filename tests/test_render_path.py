"""End-to-end path tracer tests: furnace test, cbox statistics, sampler/filter
variants. All at tiny resolution to keep CI fast."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsubaer_tpu.core import transform as tf
from mitsubaer_tpu.integrators import render
from mitsubaer_tpu.scene import presets
from mitsubaer_tpu.scene import types as T
from mitsubaer_tpu.scene.build import SceneBuilder


def furnace_scene(albedo=0.6, res=16):
    """Furnace test: a convex diffuse sphere under a constant environment L.
    A convex body never sees itself, so every surface point receives exactly
    L over the full hemisphere and reflects albedo * L — the image of the
    sphere must equal albedo * L, and the background equals L."""
    b = SceneBuilder()
    m = b.add_bsdf(T.BSDF_DIFFUSE, reflectance=(albedo, albedo, albedo))
    b.add_sphere([0, 0, 3], 1.0, bsdf=m)
    b.add_emitter(T.EM_CONSTANT, radiance=(1.0, 1.0, 1.0))
    b.set_perspective_sensor(tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), 40)
    b.config = b.config._replace(width=res, height=res, spp=64, max_depth=64, rr_depth=64)
    return b.build(), b.config


class TestFurnace:
    def test_energy_conservation(self):
        albedo = 0.6
        scene, cfg = furnace_scene(albedo)
        img = np.asarray(render.render(scene, cfg))
        center = img[6:10, 6:10].mean()
        np.testing.assert_allclose(center, albedo, rtol=0.03)

    def test_background_sees_env(self):
        scene, cfg = furnace_scene(0.5)
        img = np.asarray(render.render(scene, cfg))
        corner = img[0, 0]
        np.testing.assert_allclose(corner, 1.0, rtol=0.02)


class TestCbox:
    @pytest.fixture(scope="class")
    def cbox_img(self):
        scene, cfg = presets.cornell_box(res=32, spp=32, max_depth=4)
        return np.asarray(render.render(scene, cfg))

    def test_walls_tinted(self, cbox_img):
        left = cbox_img[8:24, :4].mean(axis=(0, 1))
        right = cbox_img[8:24, -4:].mean(axis=(0, 1))
        assert left[0] > 2 * left[1], f"left wall should be red: {left}"
        assert right[1] > right[0], f"right wall should be green: {right}"

    def test_light_brightest(self, cbox_img):
        light_region = cbox_img[:6, 12:20].max()
        assert light_region > 5.0  # direct radiance ~20

    def test_no_nans_negatives(self, cbox_img):
        assert np.all(np.isfinite(cbox_img))
        assert np.all(cbox_img >= 0)

    def test_nonzero_everywhere_inside(self, cbox_img):
        # GI should light every visible surface
        interior = cbox_img[4:-4, 4:-4]
        assert (interior.sum(axis=-1) > 0).mean() > 0.99

    def test_lds_close_to_independent(self):
        scene, cfg = presets.cornell_box(res=16, spp=64, max_depth=3)
        a = np.asarray(render.render(scene, cfg))
        b = np.asarray(render.render(scene, cfg._replace(sampler="lds")))
        # same estimator, different sampler: means agree
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.05)

    def test_direct_leq_full(self):
        scene, cfg = presets.cornell_box(res=16, spp=32, max_depth=8)
        full = np.asarray(render.render(scene, cfg)).mean()
        direct = np.asarray(
            render.render(scene, cfg._replace(integrator="direct"))
        ).mean()
        assert direct < full
        assert direct > 0.2 * full

    def test_seeds_decorrelated_unbiased(self):
        scene, cfg = presets.cornell_box(res=16, spp=128, max_depth=3)
        a = np.asarray(render.render(scene, cfg, seed=0))
        b = np.asarray(render.render(scene, cfg, seed=1))
        assert not np.allclose(a, b)
        np.testing.assert_allclose(a.mean(), b.mean(), rtol=0.1)


class TestFilters:
    def test_filters_consistent_mean(self):
        scene, cfg = presets.cornell_box(res=16, spp=32, max_depth=2)
        means = {}
        for f in ["box", "tent", "gaussian", "mitchell"]:
            img = np.asarray(render.render(scene, cfg._replace(filter=f)))
            means[f] = img.mean()
            assert np.all(np.isfinite(img)), f
        ref = means["box"]
        for f, m in means.items():
            np.testing.assert_allclose(m, ref, rtol=0.05, err_msg=f)


class TestMirror:
    def test_mirror_reflects_env(self):
        b = SceneBuilder()
        m = b.add_bsdf(T.BSDF_MIRROR, specular_r=(1.0, 1.0, 1.0))
        b.add_sphere([0, 0, 3], 1.0, bsdf=m)
        b.add_emitter(T.EM_CONSTANT, radiance=(2.0, 2.0, 2.0))
        b.set_perspective_sensor(tf.look_at([0, 0, 0], [0, 0, 1], [0, 1, 0]), 40)
        b.config = b.config._replace(width=8, height=8, spp=16, max_depth=4)
        scene = b.build()
        img = np.asarray(render.render(scene, b.config))
        # perfect mirror of a constant env returns exactly the env radiance
        np.testing.assert_allclose(img, 2.0, rtol=0.01)
