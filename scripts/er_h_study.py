"""ER marching accuracy vs step size h (VERDICT r3 item 4a).

Quantifies the velocity-Verlet integrator's endpoint/direction error on
analytic RIFs as a function of h, to justify the benchmarked step-size
regime against the reference default (heterogeneousrefractive.cpp:208,
h=1e-3 scene units). Two accuracy probes:

1. Richardson endpoint error vs an h/16 reference trace (radial RIF — the
   ultrasound-lens profile, strong curvature).
2. Conserved-quantity drift: in a radially symmetric RIF the angular
   momentum |r x v| (Bouguer's invariant, v = n * dir) is conserved along
   the exact ray; its drift is a per-step error meter with no reference
   trace needed. (A linear RIF's Snell invariant v_x is conserved EXACTLY
   by the leapfrog — structurally zero drift — so it can't serve here.)

Run on CPU: python scripts/er_h_study.py
"""
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.models import eikonal as ek


def radial_rif(n0=1.33, amp=0.2, w=0.6, c=(0, 0, 0)):
    return ek.RifField(
        kind=jnp.asarray(ek.RIF_RADIAL, jnp.int32),
        params=jnp.asarray([n0, amp, w, *c, 0, 0], jnp.float32),
        coeff=jnp.ones((1, 1, 1), jnp.float32),
        aabb_min=jnp.zeros(3), aabb_max=jnp.ones(3))


def linear_rif(n0=1.3, g=(0.0, 0.15, 0.0)):
    return ek.RifField(
        kind=jnp.asarray(ek.RIF_LINEAR, jnp.int32),
        params=jnp.asarray([n0, *g, 0, 0, 0, 0], jnp.float32),
        coeff=jnp.ones((1, 1, 1), jnp.float32),
        aabb_min=jnp.zeros(3), aabb_max=jnp.ones(3))


def sphere_sdf(r=50.0):
    return ek.SdfField(
        kind=jnp.asarray(ek.SDF_SPHERE, jnp.int32),
        params=jnp.asarray([0, 0, 0, r, 0, 0, 0, 0], jnp.float32),
        coeff=jnp.ones((1, 1, 1), jnp.float32),
        aabb_min=jnp.zeros(3), aabb_max=jnp.ones(3))


def endpoint(rif, sdf, h, dist=3.0):
    p = jnp.asarray([[-1.5, 0.3, 0.0]])
    v = jnp.asarray([[1.0, 0.0, 0.0]]) * ek.rif_value(rif, p)[0]
    steps = int(dist / h * 1.5) + 8
    pf, vf, opt, _, _, _ = ek.trace_curved(
        rif, sdf, p, v, jnp.full((1,), dist), h, steps, jnp.ones((1,), bool))
    return np.asarray(pf[0]), np.asarray(vf[0]), float(opt[0])


def bouguer_drift(rif, h, dist=3.0):
    p0 = np.array([-1.2, 0.4, 0.0], np.float32)
    p = jnp.asarray([p0])
    n0 = float(ek.rif_value(rif, p)[0])
    v = jnp.asarray([[0.9, 0.1, 0.0]])
    v = v / jnp.linalg.norm(v) * n0
    L0 = np.linalg.norm(np.cross(p0, np.asarray(v[0])))
    steps = int(dist / h * 1.5) + 8
    pf, vf, _, _, _, _ = ek.trace_curved(
        rif, sphere_sdf(1e3), p, v, jnp.full((1,), dist), h, steps,
        jnp.ones((1,), bool))
    L1 = np.linalg.norm(np.cross(np.asarray(pf[0]), np.asarray(vf[0])))
    return abs(L1 - L0) / abs(L0)


if __name__ == "__main__":
    rif = radial_rif()
    sdf = sphere_sdf(50.0)
    p_ref, v_ref, o_ref = endpoint(rif, sdf, 1e-3 / 16 * 16 / 16)  # h=1/16k
    p_ref, v_ref, o_ref = endpoint(rif, sdf, 6.25e-4)
    print("# radial RIF (ultrasound-lens profile), arc length 3.0")
    print(f"# reference trace h=6.25e-4: end={p_ref}")
    print(f"{'h':>10} {'|dp|':>12} {'|dv|/|v|':>12} {'d_opt':>12} "
          f"{'Bouguer drift':>14}")
    for h in (4e-2, 2e-2, 1e-2, 5e-3, 2.5e-3, 1e-3):
        pe, ve, oe = endpoint(rif, sdf, h)
        dp = np.linalg.norm(pe - p_ref)
        dv = np.linalg.norm(ve - v_ref) / np.linalg.norm(v_ref)
        sd = bouguer_drift(rif, h)
        print(f"{h:10.2e} {dp:12.3e} {dv:12.3e} {abs(oe - o_ref):12.3e} "
              f"{sd:14.3e}")
