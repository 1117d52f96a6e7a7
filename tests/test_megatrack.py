"""Pallas tracking megapass (integrators/megatrack.py) correctness.

Fast tests drive megatrack.run directly in interpreter mode on synthetic
state rows; the slow test anchors a full wavefront render with the
megapass against the deterministic single-scatter quadrature truth (same
design as test_dda.py).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from mitsubaer_tpu.integrators import megatrack


def _mkrows(n, o, d, t, tlim, maj, stm, stc, w_real, is_sh, valid):
    z = np.zeros((n,), np.float32)
    rows = np.stack([
        o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
        t, tlim, maj, stm, stc[:, 0], stc[:, 1], stc[:, 2],
        w_real[:, 0], w_real[:, 1], w_real[:, 2],
        is_sh.astype(np.float32), valid.astype(np.float32),
        z, z, z, z, z, z,
    ], axis=0).astype(np.float32)
    return jnp.asarray(rows)


def _run(rows, ctr, d, seed=7, B=256, max_trips=64):
    nz, ny, nx = d.shape
    tab, nb = megatrack.build_table(jnp.asarray(d))
    out, ctr_out = megatrack.run(
        rows, ctr, tab, jnp.asarray(seed, jnp.uint32), B=B,
        max_trips=max_trips, res=(nx, ny, nz), nb=nb, interpret=True)
    return np.asarray(out), np.asarray(ctr_out)


def test_zero_density_escapes_with_unit_weight():
    n = 512
    rng = np.random.default_rng(0)
    d = np.zeros((8, 8, 8), np.float32)
    o = rng.random((n, 3)).astype(np.float32) * 7
    dirs = rng.standard_normal((n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    tlim = (rng.random(n) * 2 + 0.5).astype(np.float32)
    rows = _mkrows(n, o, dirs, np.zeros(n, np.float32), tlim,
                   np.full(n, 4.0, np.float32), np.full(n, 1.0, np.float32),
                   np.ones((n, 3), np.float32), np.ones((n, 3), np.float32),
                   np.zeros(n, bool), np.ones(n, bool))
    out, ctr = _run(rows, jnp.zeros((1, n), jnp.int32), d)
    assert (out[5] > 0.5).all()                      # all resolved
    assert not (out[4] > 0.5).any()                  # no scatters
    np.testing.assert_allclose(out[0], tlim, rtol=1e-5)   # t -> tlim
    np.testing.assert_allclose(out[1:4], 1.0, rtol=1e-6)  # fac = 1
    assert (ctr[0] == 5 * out[6].astype(np.int64)).all()  # ctr advance


def test_constant_density_collision_rate():
    """Free-flight through constant sigma_t: P(scatter before tlim) =
    1 - exp(-sigma * tlim); grey medium -> fac stays 1."""
    n = 4096
    rng = np.random.default_rng(1)
    d = np.full((8, 8, 8), 0.5, np.float32)
    sig = 2.0                                     # st_mean*scale via stm
    o = np.tile(np.array([[0.5, 3.5, 3.5]], np.float32), (n, 1))
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    tlim = np.full(n, 4.0, np.float32)
    maj = np.full(n, 0.5 * sig, np.float32)       # max dens * sigma
    rows = _mkrows(n, o, dirs, np.zeros(n, np.float32), tlim, maj,
                   np.full(n, sig, np.float32),
                   np.full((n, 3), sig, np.float32),
                   np.full((n, 3), 0.9, np.float32),
                   np.zeros(n, bool), np.ones(n, bool))
    out, _ = _run(rows, jnp.zeros((1, n), jnp.int32), d)
    assert (out[5] > 0.5).all()
    p_scat = (out[4] > 0.5).mean()
    p_true = 1 - np.exp(-0.5 * sig * 4.0)
    assert abs(p_scat - p_true) < 0.03, (p_scat, p_true)
    # grey: null weight == 1 exactly, real weight = packed w_real
    scat = out[4] > 0.5
    np.testing.assert_allclose(out[1][~scat], 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[1][scat], 0.9, rtol=1e-5)
    # scatter distances exponential: mean of truncated Exp(1.0)
    ts = out[0][scat]
    lam = 0.5 * sig
    m_true = 1 / lam - 4.0 * np.exp(-lam * 4.0) / (1 - np.exp(-lam * 4.0))
    assert abs(ts.mean() - m_true) < 0.08, (ts.mean(), m_true)


def test_shadow_ratio_tracking_transmittance():
    """Ratio tracking through a linear-ramp density: E[fac] = exp(-tau)."""
    n = 8192
    d = np.zeros((8, 8, 16), np.float32)
    d[:] = np.linspace(0.0, 1.0, 16)[None, None, :]   # ramp along x
    sig = 1.5
    o = np.tile(np.array([[0.0, 3.5, 3.5]], np.float32), (n, 1))
    dirs = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (n, 1))
    tlim = np.full(n, 15.0, np.float32)
    maj = np.full(n, 1.0 * sig, np.float32)
    rows = _mkrows(n, o, dirs, np.zeros(n, np.float32), tlim, maj,
                   np.full(n, sig, np.float32),
                   np.full((n, 3), sig, np.float32),
                   np.ones((n, 3), np.float32),
                   np.ones(n, bool), np.ones(n, bool))
    out, _ = _run(rows, jnp.zeros((1, n), jnp.int32), d,
                  B=1024, max_trips=128)
    assert (out[5] > 0.5).all()
    # tau = sig * integral of trilinear ramp over [0,15] = sig * 7.5
    tr_true = np.exp(-sig * 7.5)
    tr = out[1].mean()
    se = out[1].std() / np.sqrt(n)
    assert abs(tr - tr_true) < max(4 * se, 0.05 * tr_true), \
        (tr, tr_true, se)


@pytest.mark.slow
def test_mega_render_matches_quadrature_anchor():
    from mitsubaer_tpu.integrators import render as render_m
    from mitsubaer_tpu.scene import presets
    from mitsubaer_tpu.utils.validate import single_scatter_quadrature

    scene, cfg = presets.volumetric_box(
        res=12, spp=1, max_depth=2, heterogeneous=True, density_res=32,
        emitter_kind="point", filter="box")
    truth = single_scatter_quadrature(scene, cfg).mean()
    a = np.mean([np.asarray(render_m.render(
        scene, cfg._replace(spp=256, engine="wavefront", wf_track_mega=1,
                            wf_mega_block=256, wf_mega_trips=64),
        seed=s)).mean() for s in (1, 3, 5, 7)])
    assert np.isfinite(a)
    assert abs(a - truth) / truth < 0.08, (a, truth)
