"""Round-3 wavefront profiling: per-pass-kind costs + end-to-end pass time
for (wf_mini_passes, wf_track_iters) variants, in ONE process/session.

Usage: python scripts/profile_passes2.py "[(0,3),(2,3)]"
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mitsubaer_tpu.integrators import wavefront as wf
from mitsubaer_tpu.integrators.render import render_pass_wavefront
from mitsubaer_tpu.scene import presets

VARIANTS = eval(sys.argv[1]) if len(sys.argv) > 1 else [(0, 3), (2, 3)]

res, sppc, md = 512, 32, 12
scene, cfg0 = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                     density_res=64, max_depth=md)
cfg0 = cfg0._replace(filter="box", engine="wavefront")
scene = jax.device_put(scene)
npix = res * res


def time_k(fn, k_small, k_big, reps=3):
    """Per-iteration time via two iteration counts (subtracts fixed cost)."""
    float(fn(k_small, jnp.uint32(0)))
    float(fn(k_big, jnp.uint32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter(); float(fn(k_small, jnp.uint32(r)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fn(k_big, jnp.uint32(r)))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (k_big - k_small)


def make_runner(kind, cfg):
    @partial(jax.jit, static_argnums=(0,))
    def run(k, seed):
        st, event_pass, tracking_iter, cond, finalize = wf.make_engine(
            scene, cfg, sppc, seed, jnp.uint32(0), has_direct=False,
            any_het=True)
        def warm_iter(s):
            s = event_pass(s)
            s = event_pass(s, mini=True)
            return jax.lax.fori_loop(0, 3, lambda i, x: tracking_iter(x), s)
        st = jax.lax.fori_loop(0, 10, lambda i, s: warm_iter(s), st)
        if kind == "event":
            body = lambda i, s: event_pass(s)
        elif kind == "mini":
            body = lambda i, s: event_pass(s, mini=True)
        elif kind == "track":
            body = lambda i, s: tracking_iter(s)
        elif kind == "track6":
            body = lambda i, s: tracking_iter(s, K=6)
        elif kind == "trackc6":
            body = lambda i, s: tracking_iter(s, K=6, compact=4)
        elif kind == "trackc6w3":
            body = lambda i, s: tracking_iter(s, K=6, compact=3)
        elif kind == "trackc6w2":
            body = lambda i, s: tracking_iter(s, K=6, compact=2)
        st = jax.lax.fori_loop(0, k, body, st)
        return st.L.sum() + st.n_taps.astype(jnp.float32)
    return lambda k, seed: run(k, seed)

cfg = cfg0
import os
for kind in filter(None, os.environ.get("KINDS", "event,mini,track").split(",")):
    r = make_runner(kind, cfg)
    dt = time_k(r, 4, 24)
    print(f"{kind:8s} {dt*1e3:6.2f} ms/pass", flush=True)

for var in VARIANTS:
    mp, ti = var[0], var[1]
    tc = var[2] if len(var) > 2 else 0
    cfg = cfg0._replace(wf_mini_passes=mp, wf_track_iters=ti,
                        wf_track_compact=tc)
    L = jnp.zeros((npix, 3), jnp.float32)
    L1, stats = render_pass_wavefront(scene, L, cfg, sppc, jnp.uint32(0),
                                      jnp.uint32(0), has_direct=False,
                                      any_het=True)
    _ = float(L1.sum())
    t0 = time.perf_counter()
    L2, stats = render_pass_wavefront(scene, L1, cfg, sppc, jnp.uint32(0),
                                      jnp.uint32(1), has_direct=False,
                                      any_het=True)
    segs, taps, iters, unfinished = [int(x) for x in stats]
    _ = float(L2.sum())
    dt = time.perf_counter() - t0
    samples = npix * sppc
    print(f"mini={mp} T={ti} tc={tc}: pass {dt:.3f}s  full_iters {iters} "
          f"unfin {unfinished}  segs/spl {segs/samples:.2f} "
          f"taps/spl {taps/samples:.2f}  Mrays/s {segs/dt/1e6:.2f}  "
          f"Msamples/s {samples/dt/1e6:.2f}", flush=True)
