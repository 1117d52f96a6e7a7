"""BDPT validation: per-(s,t) MIS estimator must agree with forward path
tracing (different estimator, same integral — the reference's own strategy,
verification.cpp / test_bidir fixtures), and beat it on hard indirect
scenes at equal sample count."""
import numpy as np
import pytest

from mitsubaer_tpu.integrators import render as rm
from mitsubaer_tpu.scene import presets


def _cbox(res=24, spp=32, max_depth=4):
    scene, cfg = presets.cornell_box(res=res)
    cfg = cfg._replace(spp=spp, max_depth=max_depth, filter="box",
                       sampler="independent")
    return scene, cfg


def test_bdpt_matches_path_on_cbox():
    scene, cfg = _cbox()
    img_b = np.asarray(rm.render(scene, cfg._replace(integrator="bdpt"),
                                 seed=0))
    img_p = np.asarray(rm.render(scene, cfg._replace(integrator="path"),
                                 seed=1))
    assert np.isfinite(img_b).all()
    mb, mp = img_b.mean(), img_p.mean()
    assert abs(mb - mp) / mp < 0.05, (mb, mp)
    # structural agreement
    a = img_b.reshape(-1, 3).mean(-1)
    b = img_p.reshape(-1, 3).mean(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.95, corr


@pytest.mark.slow
def test_bdpt_lower_variance_on_small_light():
    """A small bright emitter lights the box mostly indirectly: light
    subpaths find it for free, so bdpt variance at equal spp must not be
    worse than path tracing (and typically is far better)."""
    scene, cfg = _cbox(res=24, spp=16, max_depth=5)

    def var_of(integrator, seeds=4):
        imgs = [np.asarray(rm.render(
            scene, cfg._replace(integrator=integrator), seed=s))
            for s in range(seeds)]
        m = np.mean(imgs, axis=0)
        v = np.var(imgs, axis=0).mean()
        return m.mean(), v

    mb, vb = var_of("bdpt")
    mp, vp = var_of("path")
    assert abs(mb - mp) / mp < 0.08, (mb, mp)
    assert vb <= vp * 1.5, (vb, vp)
