"""JAX half of the reference-math oracle cross-check.

Run in a SUBPROCESS with JAX_ENABLE_X64=1 JAX_PLATFORMS=cpu (x64 is a
process-global switch; the main test process stays f32). Prints the same
whitespace-separated doubles as tests/oracle/er_oracle.cpp for each case
given on argv (same CLI contract)."""
import sys

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, sys.argv[1])

from mitsubaer_tpu.models import eikonal as ek  # noqa: E402


def make_rif(kind, prm):
    prm = list(prm) + [0.0] * (8 - len(prm))
    if kind == 1:
        k = ek.RIF_LINEAR
    else:
        k = ek.RIF_RADIAL
        # oracle order: n0 a w cx cy cz ; RifField params: n0 a w cx cy cz
    return ek.RifField(
        kind=jnp.asarray(k, jnp.int32),
        params=jnp.asarray(prm, jnp.float64),
        coeff=jnp.zeros((), jnp.float64),
        aabb_min=jnp.zeros(3, jnp.float64),
        aabb_max=jnp.ones(3, jnp.float64),
    )


def make_sdf(prm):
    prm = list(prm) + [0.0] * (8 - len(prm))
    return ek.SdfField(
        kind=jnp.asarray(ek.SDF_SPHERE, jnp.int32),
        params=jnp.asarray(prm, jnp.float64),
        coeff=jnp.zeros((), jnp.float64),
        aabb_min=jnp.zeros(3, jnp.float64),
        aabb_max=jnp.ones(3, jnp.float64),
    )


def fmt(x):
    import numpy as np
    return " ".join("%.17g" % v for v in np.asarray(x, dtype=float).ravel())


def main():
    if sys.argv[2] == "batch":
        # one case per stdin line; one output line each (single jax import
        # for the whole suite — subprocess startup dominates otherwise)
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            run_case(line.split())
        return
    run_case(sys.argv[2:])


def run_case(argv):
    a = 0
    mode = argv[a]; a += 1
    if mode == "refract":
        vals = [float(x) for x in argv[a:a + 8]]
        v = jnp.asarray(vals[0:3], jnp.float64)[None]
        N = jnp.asarray(vals[3:6], jnp.float64)[None]
        ni = jnp.asarray([vals[6]], jnp.float64)
        ne = jnp.asarray([vals[7]], jnp.float64)
        v2, tir = ek.boundary_velocity(v, N, ni, ne)
        print(int(tir[0]), fmt(v2))
        return
    kind = int(argv[a]); a += 1
    nprm = 4 if kind == 1 else 6
    prm = [float(x) for x in argv[a:a + nprm]]; a += nprm
    rif = make_rif(kind, prm)
    p = jnp.asarray([float(x) for x in argv[a:a + 3]], jnp.float64)[None]
    d = jnp.asarray([float(x) for x in argv[a + 3:a + 6]], jnp.float64)[None]
    a += 6
    h = float(argv[a]); a += 1
    nsteps = int(argv[a]); a += 1
    n0 = ek.rif_value(rif, p)
    v = d / jnp.linalg.norm(d, axis=-1, keepdims=True) * n0[..., None]
    if mode == "step":
        @jax.jit
        def run_steps(p, v):
            def body(_, st):
                p, v, opt = st
                p, v, dopt = ek.er_step(rif, p, v, jnp.float64(h))
                return (p, v, opt + dopt)
            return jax.lax.fori_loop(
                0, nsteps, body, (p, v, jnp.zeros((1,), jnp.float64)))
        p, v, opt = run_steps(p, v)
        print(fmt(p), fmt(v), fmt(opt))
    elif mode == "trace":
        sdfp = [float(x) for x in argv[a:a + 4]]
        dist = float(argv[a + 4])
        sdf = make_sdf(sdfp)
        pp, vv, opt, marched, exited, _ = ek.trace_curved(
            rif, sdf, p, v, jnp.asarray([dist], jnp.float64), h,
            max_steps=200000, active=jnp.ones((1,), bool))
        print(int(~exited[0]), fmt(pp), fmt(vv), fmt(marched), fmt(opt))
    elif mode == "deriv":
        @jax.jit
        def run_deriv(p, v):
            dp0 = jnp.zeros((1, 3, 3), jnp.float64)
            dv0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (1, 3, 3))

            def body(_, st):
                return ek.er_derivative_step(rif, *st, jnp.float64(h))
            return jax.lax.fori_loop(0, nsteps, body, (p, v, dp0, dv0))
        p, v, dpdv0, dvdv0 = run_deriv(p, v)
        print(fmt(p), fmt(v), fmt(dpdv0), fmt(dvdv0))


if __name__ == "__main__":
    main()
