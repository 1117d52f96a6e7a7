"""ERPT (erpt.cpp) + multi-vertex specular manifold chains (manifold.cpp,
mut_manifold.cpp machinery)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsubaer_tpu.core import manifold as mf
from mitsubaer_tpu.core.math import normalize as _normalize
from mitsubaer_tpu.scene import types as T
from mitsubaer_tpu.scene.build import SceneBuilder
from mitsubaer_tpu.core import transform as tf


def _refract(d, n, eta_rel):
    """Snell refraction of unit d at normal n (eta_rel = n_in/n_out of the
    side being entered, i.e. directions bend toward n for eta_rel > 1)."""
    d = d / np.linalg.norm(d)
    n = n / np.linalg.norm(n)
    ci = -np.dot(d, n)
    if ci < 0:
        n, ci = -n, -ci
    inv = 1.0 / eta_rel
    s2 = inv * inv * (1.0 - ci * ci)
    if s2 >= 1.0:
        return None
    ct = np.sqrt(1.0 - s2)
    return inv * d + (inv * ci - ct) * n


def test_chain_two_mirror_planes_image_source():
    """Two parallel mirror planes: the 2-bounce zig-zag solved by the chain
    Newton must match the image-source construction."""
    n = 8
    rng = np.random.default_rng(0)
    a = np.stack([rng.uniform(-0.5, 0.5, n), np.full(n, 1.0),
                  rng.uniform(-0.5, 0.5, n)], -1).astype(np.float32)
    b = np.stack([rng.uniform(-0.5, 0.5, n), np.full(n, 1.4),
                  rng.uniform(2.5, 3.0, n)], -1).astype(np.float32)
    # plane 0: y = 0 (normal +y); plane 1: y = 2 (normal -y)
    p0 = np.tile(np.array([0, 0, 0, 0, 1, 0], np.float32), (n, 1))
    p1 = np.tile(np.array([0, 2, 0, 0, -1, 0], np.float32), (n, 1))
    params = np.stack([p0, p1], 1)
    u0 = np.zeros((n, 2, 2), np.float32)
    u0[:, 0] = [0.0, 0.5]
    u0[:, 1] = [0.0, 1.5]
    res = mf.solve_specular_chain(
        (mf.SURF_PLANE, mf.SURF_PLANE), jnp.asarray(params),
        jnp.asarray(a), jnp.asarray(b), jnp.ones((n, 2), jnp.float32),
        jnp.asarray(u0))
    assert bool(np.asarray(res.converged).all()), np.asarray(res.resid)
    # image-source: mirror a through y=0 -> a1; mirror a1 through y=2 -> a2;
    # the straight line a2 -> b crosses y=2 at x2 and (unfolded) y=0 at x1
    a1 = a.copy(); a1[:, 1] *= -1.0
    a2 = a1.copy(); a2[:, 1] = 4.0 - a1[:, 1]
    t2 = (2.0 - a2[:, 1]) / (b[:, 1] - a2[:, 1])
    x2_ref = a2 + t2[:, None] * (b - a2)
    x = np.asarray(res.x)
    np.testing.assert_allclose(x[:, 1], x2_ref, atol=1e-4)


def test_chain_glass_sphere_two_refractions():
    """Entry+exit refraction chain through a glass sphere: the solved
    vertices must satisfy Snell under independent ray tracing."""
    n = 6
    rng = np.random.default_rng(1)
    eta_glass = 1.5
    # endpoints along +-x so the chain sits on the (theta, phi) chart's
    # equator (the chart is singular at the +-z poles — callers rotate
    # coordinates for pole-adjacent chains, manifold.py docstring)
    a = np.stack([np.full(n, -3.0), rng.uniform(-0.3, 0.3, n),
                  rng.uniform(-0.3, 0.3, n)], -1).astype(np.float32)
    b = np.stack([np.full(n, 3.0), rng.uniform(-0.3, 0.3, n),
                  rng.uniform(-0.3, 0.3, n)], -1).astype(np.float32)
    sp = np.tile(np.array([0, 0, 0, 1.0], np.float32), (n, 2, 1))
    # init: radial points toward each endpoint
    u0 = np.zeros((n, 2, 2), np.float32)
    d_a = a / np.linalg.norm(a, axis=-1, keepdims=True)
    d_b = b / np.linalg.norm(b, axis=-1, keepdims=True)
    for i, d in ((0, d_a), (1, d_b)):
        theta = np.arccos(np.clip(d[:, 2], -1, 1))
        phi = np.arctan2(d[:, 1], d[:, 0])
        u0[:, i, 0] = theta
        u0[:, i, 1] = phi
    # eta convention of _constraint (h = wa + eta*wb): eta = n_b / n_a with
    # n_a the IOR on the previous-neighbor side; entry vertex sees
    # vacuum->glass (1.5), exit vertex glass->vacuum (1/1.5)
    etas = np.tile(np.array([eta_glass, 1.0 / eta_glass], np.float32),
                   (n, 1))
    res = mf.solve_specular_chain(
        (mf.SURF_SPHERE, mf.SURF_SPHERE), jnp.asarray(sp),
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(etas),
        jnp.asarray(u0))
    conv = np.asarray(res.converged)
    assert conv.mean() > 0.7, (conv, np.asarray(res.resid))
    x = np.asarray(res.x)
    for i in np.argwhere(conv).ravel()[:4]:
        x1, x2 = x[i, 0], x[i, 1]
        d_in = _unit(x1 - a[i])
        r1 = _refract(d_in, x1, eta_glass)      # sphere normal = x1 (unit)
        assert r1 is not None
        # refracted ray from x1 must pass through x2
        assert np.linalg.norm(np.cross(r1, _unit(x2 - x1))) < 5e-3
        r2 = _refract(_unit(x2 - x1), x2, 1.0 / eta_glass)
        assert r2 is not None
        assert np.linalg.norm(np.cross(r2, _unit(b[i] - x2))) < 5e-3


def _unit(v):
    return v / np.linalg.norm(v)


def _caustic_scene(res=32, spp=16):
    """Small area light above a glass sphere above a diffuse floor: the
    classic ERPT caustic configuration (Cline et al. fig. 9)."""
    b = SceneBuilder()
    glass = b.add_bsdf(T.BSDF_DIELECTRIC, eta=1.5)
    floor = b.add_bsdf(T.BSDF_DIFFUSE, reflectance=(0.7, 0.7, 0.7))
    v = np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]],
                 np.float32)
    f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)   # normal +y (up)
    b.add_mesh(v, f, bsdf=floor)
    b.add_sphere([0.0, 0.7, 0.0], 0.35, bsdf=glass)
    lv = np.array([[-0.25, 2.0, -0.25], [0.25, 2.0, -0.25],
                   [0.25, 2.0, 0.25], [-0.25, 2.0, 0.25]], np.float32)
    lf = np.array([[0, 1, 2], [0, 2, 3]], np.int32)  # normal -y (down)
    lb = b.add_bsdf(T.BSDF_DIFFUSE, reflectance=(0.0, 0.0, 0.0))
    b.add_mesh(lv, lf, bsdf=lb, emitter_radiance=(40.0, 40.0, 40.0))
    b.set_perspective_sensor(
        to_world=tf.look_at([0, 2.2, -2.6], [0, 0.3, 0], [0, 1, 0]),
        fov_deg=40.0)
    b.config = b.config._replace(width=res, height=res, spp=spp,
                                 max_depth=5, integrator="path")
    return b.build(), b.config


@pytest.mark.slow
def test_erpt_consistent_and_beats_pssmlt_on_caustic():
    """ERPT's equal-deposition redistribution should (a) agree with the
    path-traced mean and (b) cut caustic-region MSE vs pssmlt at the same
    mutation budget (the reference integrator's reason to exist)."""
    from mitsubaer_tpu.integrators import erpt as erpt_m
    from mitsubaer_tpu.integrators import pssmlt as pssmlt_m
    from mitsubaer_tpu.integrators import render as render_m

    scene, cfg = _caustic_scene(res=32, spp=48)
    truth = np.asarray(render_m.render(scene, cfg._replace(spp=768),
                                       seed=9)).reshape(32, 32, 3)
    e = np.asarray(erpt_m.render_erpt(scene, cfg._replace(integrator="erpt"),
                                      seed=0))
    m = np.asarray(pssmlt_m.render_pssmlt(
        scene, cfg._replace(integrator="pssmlt"), seed=0))
    assert abs(e.mean() - truth.mean()) / truth.mean() < 0.25
    # caustic region: brightest decile of the truth image
    lum = truth.mean(-1)
    thr = np.quantile(lum, 0.9)
    mask = lum >= thr
    mse_e = float(((e.mean(-1) - lum)[mask] ** 2).mean())
    mse_m = float(((m.mean(-1) - lum)[mask] ** 2).mean())
    assert mse_e < mse_m * 1.05, (mse_e, mse_m)


def test_erpt_runs_flat_scene():
    """Smoke: erpt through the public render() dispatch."""
    from mitsubaer_tpu.integrators import render as render_m

    scene, cfg = _caustic_scene(res=16, spp=8)
    img = np.asarray(render_m.render(
        scene, cfg._replace(integrator="erpt"), seed=0))
    assert np.isfinite(img).all() and img.mean() > 0
