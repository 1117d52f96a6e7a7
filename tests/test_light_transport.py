"""Cross-validation of the light-transport family: ptracer (light tracing),
photon mapping (ppm), and PSSMLT must agree with forward path tracing on the
Cornell box (the reference validates its bidirectional machinery the same
way: different estimators, same integral — verification.cpp philosophy)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsubaer_tpu.scene import presets
from mitsubaer_tpu.integrators import render

# minutes-long FD/chain validations (VERDICT r2: >9 min individually)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cbox_ref():
    scene, cfg = presets.cornell_box(res=16, spp=128, max_depth=4, boxes=False)
    cfg = cfg._replace(filter="box")
    img = np.asarray(render.render(scene, cfg._replace(engine="loop"), seed=0))
    return scene, cfg, img


class TestPtracer:
    def test_matches_path(self, cbox_ref):
        scene, cfg, ref = cbox_ref
        from mitsubaer_tpu.integrators import ptracer

        img = np.asarray(ptracer.render_ptracer(
            scene, cfg._replace(spp=800), seed=0))
        assert np.isfinite(img).all()
        assert abs(img.mean() / ref.mean() - 1.0) < 0.12
        c = np.corrcoef(ref.mean(-1).ravel(), img.mean(-1).ravel())[0, 1]
        assert c > 0.97


class TestPhotonMap:
    def test_matches_path(self, cbox_ref):
        scene, cfg, ref = cbox_ref
        from mitsubaer_tpu.integrators import photonmap

        img = np.asarray(photonmap.render_photonmap(
            scene, cfg._replace(spp=32), seed=0, n_photons=1 << 16))
        assert np.isfinite(img).all()
        # progressive photon mapping is consistent-but-biased at finite
        # iteration counts (Knaus-Zwicker); this config measures ~0.92
        assert abs(img.mean() / ref.mean() - 1.0) < 0.15
        c = np.corrcoef(ref.mean(-1).ravel(), img.mean(-1).ravel())[0, 1]
        assert c > 0.95


class TestPSSMLT:
    def test_matches_path(self, cbox_ref):
        scene, cfg, ref = cbox_ref
        from mitsubaer_tpu.integrators import pssmlt

        img = np.asarray(pssmlt.render_pssmlt(
            scene, cfg._replace(spp=96), seed=0, n_bootstrap=1 << 14))
        assert np.isfinite(img).all()
        assert abs(img.mean() / ref.mean() - 1.0) < 0.15
        c = np.corrcoef(ref.mean(-1).ravel(), img.mean(-1).ravel())[0, 1]
        assert c > 0.9
