"""Whole-path Pallas renderer (integrators/boxwalk.py) correctness.

The beam-lit volumetric scene's MEAN is dominated by a near-beam 1/h
spike that finite-spp estimators rarely sample, so parity checks use the
MEDIAN per-pixel ratio against the deterministic double-scatter beam
quadrature (utils/validate.py), which both the wavefront engine and
boxwalk must match (measured 1.02-1.03 at these settings).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mitsubaer_tpu.integrators import boxwalk
from mitsubaer_tpu.scene import presets


def _scene(res=12, density_res=16, max_depth=2):
    scene, cfg = presets.volumetric_box(
        res=res, spp=1, heterogeneous=True, density_res=density_res,
        max_depth=max_depth)
    return scene, cfg._replace(filter="box", engine="wavefront")


def test_supported_gate():
    scene, cfg = _scene()
    assert boxwalk.supported(scene, cfg)
    assert not boxwalk.supported(scene, cfg._replace(filter="gaussian"))
    assert not boxwalk.supported(scene, cfg._replace(engine="loop"))
    cb, cbc = presets.cornell_box(res=8)
    assert not boxwalk.supported(cb, cbc._replace(filter="box",
                                                  engine="wavefront"))


@pytest.mark.slow
def test_boxwalk_matches_beam_quadrature_median():
    from mitsubaer_tpu.utils.validate import beam_double_scatter_quadrature

    res = 12
    scene, cfg = _scene(res=res)
    truth = beam_double_scatter_quadrature(scene, cfg).mean(-1).ravel()
    npix = res * res
    sppc = 64
    acc = np.zeros(npix)
    P = 4
    for s in range(P):
        L, stats = boxwalk.render_boxwalk(
            scene, cfg, sppc, jnp.uint32(s + 1), jnp.uint32(s), B=144,
            interpret=True)
        acc += np.asarray(L).mean(-1) / sppc
        assert int(stats[3]) == 0          # all samples completed
    acc /= P
    assert np.isfinite(acc).all()
    sel = truth > np.percentile(truth, 30)
    ratio = np.median(acc[sel] / truth[sel])
    assert 0.85 < ratio < 1.2, ratio


@pytest.mark.slow
def test_boxwalk_matches_wavefront_pixelwise():
    from mitsubaer_tpu.integrators.render import render_pass_wavefront

    res = 12
    scene, cfg = _scene(res=res, max_depth=6)
    npix = res * res
    sppc = 64
    acc_b = np.zeros(npix)
    acc_w = np.zeros(npix)
    for s in range(3):
        L, _ = boxwalk.render_boxwalk(scene, cfg, sppc, jnp.uint32(s + 1),
                                      jnp.uint32(s), B=144, interpret=True)
        acc_b += np.asarray(L).mean(-1) / sppc
        Lw, _ = render_pass_wavefront(
            scene, jnp.zeros((npix, 3)), cfg, sppc, jnp.uint32(s + 1),
            jnp.uint32(s), has_direct=False, any_het=True)
        acc_w += np.asarray(Lw).mean(-1) / sppc
    sel = acc_w > np.percentile(acc_w, 30)
    ratio = np.median(acc_b[sel] / np.maximum(acc_w[sel], 1e-12))
    assert 0.8 < ratio < 1.25, ratio
