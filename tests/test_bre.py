"""Beam-radiance-estimate integrator (integrators/bre.py) sanity:
renders the volumetric box and lands within tolerance of volpath
(BRE is consistent-biased: fixed gather radius + quadrature beams,
so the gate is wide but catches broken photon scaling, which shifts
the mean several-fold)."""
import numpy as np
import pytest


@pytest.mark.slow
def test_bre_matches_volpath_homogeneous():
    from mitsubaer_tpu.integrators import render as render_m
    from mitsubaer_tpu.scene import presets

    scene, cfg = presets.volumetric_box(
        res=16, spp=8, heterogeneous=False, density_res=8, max_depth=6,
        emitter_kind="point")
    ref = np.asarray(render_m.render(
        scene, cfg._replace(spp=32, integrator="volpath"), seed=3))
    b = np.asarray(render_m.render(
        scene, cfg._replace(spp=8, integrator="bre"), seed=1))
    assert np.isfinite(b).all()
    assert 0.4 < b.mean() / ref.mean() < 2.2, (b.mean(), ref.mean())
