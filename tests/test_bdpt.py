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


def test_bdpt_volumetric_smoke():
    """Fast smoke: bdpt with medium vertices renders the bounded-scattering
    volume (the reference's primary ER/transient integrator configuration,
    bdpt_proc.cpp with vertex.cpp medium interactions) — finite, nonzero,
    in the right brightness range. Statistical parity with volpath is the
    slow test below."""
    scene, cfg = presets.volumetric_box(
        res=8, spp=1, max_depth=3, heterogeneous=False,
        sigma_s=(0.6, 0.6, 0.6), sigma_a=(0.05, 0.05, 0.05),
        emitter_kind="point", filter="box")
    img = np.asarray(rm.render(scene, cfg._replace(spp=8, integrator="bdpt"),
                               seed=0))
    assert np.isfinite(img).all()
    assert 0.0 < img.mean() < 10.0


@pytest.mark.slow
def test_bdpt_volumetric_matches_volpath():
    """Medium-vertex bdpt vs volpath on the point-lit homogeneous box
    (measured over 2 seed pairs: ratios 1.051 / 0.965 at 96-vs-192 spp)."""
    scene, cfg = presets.volumetric_box(
        res=12, spp=1, max_depth=4, heterogeneous=False,
        sigma_s=(0.6, 0.6, 0.6), sigma_a=(0.05, 0.05, 0.05),
        emitter_kind="point", filter="box")
    a = np.mean([np.asarray(rm.render(
        scene, cfg._replace(spp=96, integrator="bdpt"), seed=s)).mean()
        for s in (1, 7)])
    b = np.mean([np.asarray(rm.render(
        scene, cfg._replace(spp=192, integrator="volpath", engine="loop"),
        seed=s)).mean() for s in (2, 8)])
    assert abs(a - b) / b < 0.08, (a, b)


@pytest.mark.slow
def test_bdpt_collimated_beam_scene():
    """The bundled volumetric scene family is beam-lit (collimated.cpp):
    bdpt light paths start from the delta emitter and must agree with
    volpath + beam splatting (measured ratio 1.089, corr 0.993)."""
    scene, cfg = presets.volumetric_box(
        res=12, spp=1, max_depth=4, heterogeneous=False,
        sigma_s=(1.0, 1.0, 1.0), sigma_a=(0.05, 0.05, 0.05),
        emitter_kind="collimated", filter="box")
    c = np.asarray(rm.render(
        scene, cfg._replace(spp=128, integrator="bdpt"), seed=1))
    d = np.asarray(rm.render(
        scene, cfg._replace(spp=128, integrator="volpath", engine="loop"),
        seed=2))
    assert np.isfinite(c).all()
    assert abs(c.mean() - d.mean()) / d.mean() < 0.15
    corr = np.corrcoef(c.reshape(-1), d.reshape(-1))[0, 1]
    assert corr > 0.95


@pytest.mark.slow
def test_bdpt_er_matches_volpath_er():
    """Curved ER connections inside bdpt (edge.cpp:473-643 analogue):
    the linear-RIF sphere scene renders through bdpt within tolerance of
    volpath_er (measured rel diff ~10% at these sample counts; both are
    noisy, so the gate is wide but catches a missing/broken curved
    connection, which changes the mean several-fold)."""
    import jax.numpy as jnp

    from mitsubaer_tpu.integrators import render as render_m
    from mitsubaer_tpu.models import eikonal as ek
    from mitsubaer_tpu.scene import presets

    scene, cfg = presets.refractive_sphere(
        res=20, spp=6, max_depth=5, rif_kind=ek.RIF_LINEAR,
        rif_params=(1.3, 0.15, 0.0, 0.0), er_stepsize=2e-2)
    a = np.asarray(render_m.render(
        scene, cfg._replace(integrator="volpath_er"), seed=1))
    b = np.asarray(render_m.render(
        scene, cfg._replace(integrator="bdpt"), seed=2))
    assert np.isfinite(b).all()
    assert abs(b.mean() / a.mean() - 1) < 0.3, (a.mean(), b.mean())


@pytest.mark.slow
def test_bdpt_transient_er():
    """Transient ER through bdpt: curved optical lengths land in
    delayed bins (bdpt_proc.cpp:396-399 pathLength correction)."""
    from mitsubaer_tpu.integrators import render as render_m
    from mitsubaer_tpu.models import eikonal as ek
    from mitsubaer_tpu.scene import presets

    scene, cfg = presets.refractive_sphere(
        res=10, spp=6, max_depth=4, rif_kind=ek.RIF_LINEAR,
        rif_params=(1.3, 0.15, 0.0, 0.0), er_stepsize=2e-2,
        decomposition="transient", min_bound=2.0, max_bound=14.0,
        bin_width=1.0)
    img = np.asarray(render_m.render(
        scene, cfg._replace(integrator="bdpt")))
    F = cfg.n_frames
    assert img.shape[-1] == 3 * F
    per_bin = img.reshape(10, 10, F, 3).sum(axis=(0, 1, 3))
    assert np.isfinite(per_bin).all()
    assert (per_bin > 0).sum() >= 3
