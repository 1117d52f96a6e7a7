"""Specular manifold walks (core/manifold.py; reference manifold.cpp:35).

Anchors: plane reflection has the exact image-source solution; sphere
refraction cross-checks the independent bracketed-bisection solver used by
the single-scatter integrator."""
import numpy as np
import jax.numpy as jnp

from mitsubaer_tpu.core import manifold as mf


def test_plane_reflection_matches_image_source():
    # mirror plane z=0, endpoints above it
    N = 64
    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (N, 3)).astype(np.float32)
    a[:, 2] = rng.uniform(0.5, 2.0, N)
    b[:, 2] = rng.uniform(0.5, 2.0, N)
    params = np.tile(np.array([0, 0, 0, 0, 0, 1.0], np.float32), (N, 1))
    # init: tangent-plane projection of the endpoint midpoint (far-from-
    # solution starts can diverge an undamped Newton — manifold.cpp seeds
    # from an existing path vertex for the same reason)
    mid = 0.5 * (a + b)
    u0 = np.stack([mid[:, 0], mid[:, 1]], axis=-1).astype(np.float32)
    res = mf.solve_specular_vertex(
        mf.SURF_PLANE, jnp.asarray(params), a, b, 1.0, u0, damping=0.8,
        iters=32)
    assert np.asarray(res.converged).mean() > 0.95
    # image source: reflect b through the plane; x = line(a, b') ^ plane
    b_img = b.copy()
    b_img[:, 2] = -b[:, 2]
    t = a[:, 2] / (a[:, 2] - b_img[:, 2])
    x_ref = a + t[:, None] * (b_img - a)
    conv = np.asarray(res.converged)
    assert np.abs(np.asarray(res.x)[conv] - x_ref[conv]).max() < 1e-3


def test_sphere_refraction_matches_bisection_solver():
    from mitsubaer_tpu.integrators.singlescatter import _solve_phi

    N = 32
    rng = np.random.default_rng(1)
    # interior points and exterior lights of a unit sphere; eta such that
    # the constraint h = wa + eta*wb with a INSIDE: relative IOR from the
    # interior side
    x_in = rng.uniform(-0.4, 0.4, (N, 3)).astype(np.float32)
    l = rng.uniform(1.5, 2.5, (N, 3)).astype(np.float32) \
        * np.sign(rng.normal(size=(N, 3))).astype(np.float32)
    eta = 1.33
    B_bis, ok_b = _solve_phi(jnp.zeros((N, 3)), 1.0, eta,
                             jnp.asarray(x_in), jnp.asarray(l))
    params = np.tile(np.array([0, 0, 0, 1.0], np.float32), (N, 1))
    u0 = mf.sphere_init(jnp.asarray(params), jnp.asarray(x_in),
                        jnp.asarray(l))
    # constraint convention: h = w_a + eta_c * w_b with a INTERIOR; Snell
    # eta*sin_i = sin_o (solver convention, eta = n_int) maps to
    # eta_c = sin_i/sin_o = 1/eta
    res = mf.solve_specular_vertex(
        mf.SURF_SPHERE, jnp.asarray(params), jnp.asarray(x_in),
        jnp.asarray(l), 1.0 / eta, u0, iters=24, damping=0.7)
    both = np.asarray(res.converged) & np.asarray(ok_b)
    assert both.mean() > 0.7, both.mean()
    d = np.linalg.norm(np.asarray(res.x)[both] - np.asarray(B_bis)[both],
                       axis=-1)
    assert np.median(d) < 5e-3, np.median(d)
