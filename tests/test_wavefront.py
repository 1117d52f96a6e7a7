"""Persistent-wavefront engine (integrators/wavefront.py) equivalence tests.

The wavefront engine must estimate the same integral as the loop engine
(integrators/volpath.py + path.py), which itself is validated against
analytic references elsewhere. We compare on LOW-VARIANCE configurations
(surface cbox, point-lit media) — beam-NEE scenes have heavy-tailed
estimators whose finite-sample means wander several percent (verified
against an independent ground-truth integrator during development).
"""
import numpy as np
import pytest

from mitsubaer_tpu.integrators import render as render_m
from mitsubaer_tpu.scene import presets


def _render(scene, cfg, spp, engine, seed):
    return np.asarray(render_m.render(
        scene, cfg._replace(spp=spp, engine=engine), seed=seed))


def _pair(scene, cfg, spp, seed_wf=1, seed_loop=2):
    return (_render(scene, cfg, spp, "wavefront", seed_wf),
            _render(scene, cfg, spp, "loop", seed_loop))


def test_wavefront_matches_loop_cbox_surface():
    scene, cfg = presets.cornell_box(res=12, spp=1, max_depth=3, boxes=False,
                                     filter="box")
    a, b = _pair(scene, cfg, spp=256)
    assert np.isfinite(a).all()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.05


def test_wavefront_matches_loop_homogeneous_point():
    scene, cfg = presets.volumetric_box(
        res=12, spp=1, max_depth=2, heterogeneous=False,
        emitter_kind="point", filter="box")
    a, b = _pair(scene, cfg, spp=256)
    assert np.isfinite(a).all()
    assert abs(a.mean() - b.mean()) / b.mean() < 0.06


def test_engines_match_single_scatter_quadrature():
    """Both engines against a DETERMINISTIC single-scatter quadrature truth
    (utils/validate.py) on the heterogeneous point-lit scene — an absolute
    anchor, unlike engine-vs-engine comparisons (the multi-bounce het
    estimators are heavy-tailed; single-seed means wander +-30%)."""
    from mitsubaer_tpu.utils.validate import single_scatter_quadrature

    scene, cfg = presets.volumetric_box(
        res=12, spp=1, max_depth=2, heterogeneous=True, density_res=32,
        emitter_kind="point", filter="box")
    truth = single_scatter_quadrature(scene, cfg).mean()
    a = np.mean([_render(scene, cfg, 256, "wavefront", s).mean()
                 for s in (1, 3)])
    b = np.mean([_render(scene, cfg, 256, "loop", s).mean()
                 for s in (2, 4)])
    # measured over 16 seeds: engines sit within 1% of truth, per-2-seed
    # sem ~0.5%; 5% band = ~8 sigma
    assert abs(a - truth) / truth < 0.05, (a, truth)
    assert abs(b - truth) / truth < 0.05, (b, truth)


def test_wavefront_beam_scene_runs_and_is_positive():
    scene, cfg = presets.volumetric_box(
        res=12, spp=1, max_depth=3, heterogeneous=True, density_res=32,
        filter="box")
    a, b = _pair(scene, cfg, spp=96)
    assert np.isfinite(a).all() and a.mean() > 0
    # beam NEE is heavy-tailed; only a coarse factor-level check here
    assert 0.3 < a.mean() / b.mean() < 3.0


def test_wavefront_every_pixel_gets_exactly_spp_samples():
    """The rotated lane->pixel assignment must keep per-pixel sample counts
    exact: a constant-radiance scene (constant emitter, direct hit) renders
    to a constant image."""
    import jax.numpy as jnp

    from mitsubaer_tpu.integrators.render import render_pass_wavefront
    from mitsubaer_tpu.scene.build import SceneBuilder
    from mitsubaer_tpu.scene import types as T

    import numpy as _np
    from mitsubaer_tpu.core import transform as tf

    b = SceneBuilder()
    # emissive wall filling the whole view: every camera ray hits it
    lb = b.add_bsdf(T.BSDF_DIFFUSE, reflectance=(0.0, 0.0, 0.0))
    v = _np.array([[-40, -40, 2.0], [40, -40, 2.0], [40, 40, 2.0],
                   [-40, 40, 2.0]], _np.float32)
    f = _np.array([[0, 2, 1], [0, 3, 2]], _np.int32)
    b.add_mesh(v, f, bsdf=lb, emitter_radiance=(0.5, 0.5, 0.5))
    b.set_perspective_sensor(
        to_world=tf.look_at([0, 0, -3], [0, 0, 0], [0, 1, 0]), fov_deg=45.0)
    b.config = b.config._replace(width=8, height=8, max_depth=2,
                                 integrator="path", filter="box")
    scene = b.build()
    cfg = b.config._replace(engine="wavefront", spp=4)
    L = jnp.zeros((64, 3), jnp.float32)
    L, stats = render_pass_wavefront(
        scene, L, cfg, 4, jnp.uint32(0), jnp.uint32(0),
        has_direct=True, any_het=False)
    img = np.asarray(L) / 4.0
    assert np.allclose(img, 0.5, atol=1e-5), (img.min(), img.max())


def test_compacted_tracking_matches_full_width():
    """The sort-compacted tracking pass (cfg.wf_track_compact) computes the
    same per-lane Woodcock/ratio-tracking algebra as the full-width pass.

    At W=n (compact=1) the scheduling is identical, so the render must match
    to float-reassociation rounding. Narrower windows only change WHICH pass
    serves a lane (and hence the sampler dims its events consume) — checked
    statistically in test_compacted_tracking_narrow_window_unbiased."""
    import jax.numpy as jnp

    from mitsubaer_tpu.integrators.render import render_pass_wavefront
    from mitsubaer_tpu.scene import presets

    res, sppc = 24, 4
    scene, cfg = presets.volumetric_box(
        res=res, spp=sppc, heterogeneous=True, density_res=16, max_depth=6)
    # wf_dda=0: the compacted pass implements the global-majorant scheme;
    # these tests check the compaction plumbing, not the majorant scheme
    # (DDA-vs-global statistical equivalence: test_dda_tracking_unbiased)
    cfg = cfg._replace(filter="box", engine="wavefront", wf_track_iters=3,
                       wf_mini_passes=1, wf_dda=0, wf_compact_k=3)
    L0 = jnp.zeros((res * res, 3), jnp.float32)
    out = {}
    for tc in (0, 1):
        L, stats = render_pass_wavefront(
            scene, L0, cfg._replace(wf_track_compact=tc), sppc,
            jnp.uint32(0), jnp.uint32(0), has_direct=False, any_het=True)
        out[tc] = (np.asarray(L), [int(x) for x in stats])
    assert out[0][1][:2] == out[1][1][:2], "segment/tap counts diverged"
    np.testing.assert_allclose(out[0][0], out[1][0], rtol=1e-4, atol=1e-4)


def test_compacted_tracking_narrow_window_unbiased():
    """compact>1 re-schedules tracking into a narrow window (here W=256 <
    n=576); delayed (overflow) lanes consume different sampler dims, so the
    comparison is statistical: a z-test on the per-pass image means (the
    beam-NEE estimator is heavy-tailed — relative SEM ~25% per pass — which
    is why a naive few-percent mean comparison is under-powered here)."""
    import jax.numpy as jnp

    from mitsubaer_tpu.integrators.render import render_pass_wavefront
    from mitsubaer_tpu.scene import presets

    res, sppc, P = 24, 8, 10
    scene, cfg = presets.volumetric_box(
        res=res, spp=sppc, heterogeneous=True, density_res=16, max_depth=6)
    # wf_dda=0: the compacted pass implements the global-majorant scheme;
    # these tests check the compaction plumbing, not the majorant scheme
    # (DDA-vs-global statistical equivalence: test_dda_tracking_unbiased)
    cfg = cfg._replace(filter="box", engine="wavefront", wf_track_iters=3,
                       wf_mini_passes=1, wf_dda=0)
    L0 = jnp.zeros((res * res, 3), jnp.float32)
    stats = {}
    for tc in (0, 4):
        per_pass = []
        prev = np.zeros((res * res, 3), np.float32)
        L = L0
        for i in range(P):
            L, _ = render_pass_wavefront(
                scene, L, cfg._replace(wf_track_compact=tc), sppc,
                jnp.uint32(0), jnp.uint32(i), has_direct=False, any_het=True)
            cur = np.asarray(L)
            per_pass.append((cur - prev).mean() / sppc)
            prev = cur
        per_pass = np.array(per_pass)
        stats[tc] = (per_pass.mean(), per_pass.std() / np.sqrt(P))
    (m0, s0), (m4, s4) = stats[0], stats[4]
    z = abs(m0 - m4) / np.sqrt(s0 ** 2 + s4 ** 2 + 1e-30)
    assert z < 4.0, (stats, z)
