"""Reference-math oracle: compile the standalone C++ re-implementation of
the reference's eikonal core (tests/oracle/er_oracle.cpp — same update
order as heterogeneousrefractive.cpp:653-1074, IEEE double) and assert the
JAX implementation matches it step-for-step on fixed analytic RIFs.

The JAX side runs ONCE in a batch subprocess with JAX_ENABLE_X64=1 (x64 is
process-global; this process stays f32); all cases share the single jax
import. Agreement bound: both sides evaluate identical arithmetic in f64
with f32-rounded parameters, so trajectories match to ~1e-9 even after
hundreds of steps — far inside the 1e-5 target (VERDICT r4 item 4)."""
import os
import subprocess

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
SRC = os.path.join(HERE, "oracle", "er_oracle.cpp")
BIN = os.path.join(HERE, "oracle", "er_oracle.bin")

LINEAR = [1, 1.2, 0.3, 0.1, -0.05]
RADIAL = [2, 1.3, 0.25, 0.7, 0.1, -0.05, 0.2]
START = [0.1, -0.2, 0.05, 0.6, 0.5, 0.5]

CASES = {}
for name, rif in (("linear", LINEAR), ("radial", RADIAL)):
    for nsteps in (1, 37, 400):
        CASES[f"step-{name}-{nsteps}"] = ["step"] + rif + START \
            + [0.01, nsteps]
    CASES[f"trace-{name}"] = ["trace"] + rif + START + [0.01, 0] \
        + [0, 0, 0, 4.0, 0.7371]
    for nsteps in (1, 60):
        CASES[f"deriv-{name}-{nsteps}"] = ["deriv"] + rif + START \
            + [0.01, nsteps]
CASES["trace-exit"] = ["trace"] + LINEAR + START + [0.01, 0] \
    + [0, 0, 0, 1.0, 5.0]
for i, c in enumerate([
    [0.2, 0.3, 1.2, 0, 0, 1, 1.3, 1.0],      # exit into vacuum
    [0.1, -0.2, -1.1, 0, 0, -1, 1.0, 1.45],  # entry into glass-ish
    [0.05, 0.02, 0.4, 0, 0, 1, 1.5, 1.0],    # shallow: near-TIR refraction
]):
    CASES[f"refract-{i}"] = ["refract"] + c
CASES["refract-tir"] = ["refract", 1.0, 0.0, 0.05, 0, 0, 1, 1.5, 1.0]


@pytest.fixture(scope="module")
def results():
    if (not os.path.exists(BIN)
            or os.path.getmtime(BIN) < os.path.getmtime(SRC)):
        subprocess.run(["g++", "-O2", "-o", BIN, SRC], check=True)
    keys = list(CASES)
    cpp = {}
    for k in keys:
        out = subprocess.run([BIN] + [str(a) for a in CASES[k]],
                             capture_output=True, text=True, check=True)
        cpp[k] = np.array([float(x) for x in out.stdout.split()])
    env = dict(os.environ, JAX_ENABLE_X64="1", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    stdin = "\n".join(" ".join(str(a) for a in CASES[k]) for k in keys)
    out = subprocess.run(
        ["python", os.path.join(HERE, "oracle", "jax_side.py"), ROOT,
         "batch"],
        input=stdin, capture_output=True, text=True, check=True, env=env)
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == len(keys), out.stderr[-2000:]
    jx = {k: np.array([float(x) for x in ln.split()])
          for k, ln in zip(keys, lines)}
    return cpp, jx


@pytest.mark.parametrize("key", [k for k in CASES if k.startswith("step-")])
def test_er_step_trajectory(results, key):
    """er_step (heterogeneousrefractive.cpp:653-661): p, v, optical len."""
    cpp, jx = results
    np.testing.assert_allclose(jx[key], cpp[key], rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("key", ["trace-linear", "trace-radial"])
def test_trace_no_exit(results, key):
    """trace (:671-691), full-step + partial-step schedule, inside case."""
    cpp, jx = results
    assert cpp[key][0] == 1 and jx[key][0] == 1
    np.testing.assert_allclose(jx[key], cpp[key], rtol=1e-9, atol=1e-9)


def test_trace_boundary_exit(results):
    """Boundary-exit case: the reference rolls BACK one leapfrog step
    (er_step with -h, :684) where the JAX trace keeps the last inside
    state; the two agree to O(h^2) in the state and O(h) in marched."""
    cpp, jx = results
    a, b = cpp["trace-exit"], jx["trace-exit"]
    assert a[0] == 0 and b[0] == 0          # both report an exit
    np.testing.assert_allclose(b[1:7], a[1:7], atol=5e-4)  # p, v
    np.testing.assert_allclose(b[7], a[7], atol=0.011)     # marched
    np.testing.assert_allclose(b[8], a[8], atol=0.02)      # optical


@pytest.mark.parametrize("key", [k for k in CASES if k.startswith("deriv-")])
def test_derivative_step(results, key):
    """er_derivativestep (:798-814): dp/dv0, dv/dv0 propagation, incl. the
    reference's evaluation of the second Hessian at the UPDATED point."""
    cpp, jx = results
    np.testing.assert_allclose(jx[key], cpp[key], rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("key", ["refract-0", "refract-1", "refract-2"])
def test_boundary_velocity(results, key):
    """boundaryVelocity (:1036-1051), refraction branch (the TIR branch is
    a documented deviation: the reference reverses the full direction,
    eikonal.py keeps tangential momentum — see eikonal.py:418)."""
    cpp, jx = results
    assert cpp[key][0] == 0 and jx[key][0] == 0
    np.testing.assert_allclose(jx[key][1:], cpp[key][1:], rtol=1e-12,
                               atol=1e-12)


def test_boundary_velocity_tir_flag(results):
    """Both implementations classify the same event as TIR."""
    cpp, jx = results
    assert cpp["refract-tir"][0] == 1 and jx["refract-tir"][0] == 1
