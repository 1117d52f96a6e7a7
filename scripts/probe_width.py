"""Round-4 probe: per-pass cost vs lane width (n = npix at res 128/181/256/362/512).
Also: sort_key_val + row-gather cost vs table size (for in-pool compaction)."""
import sys, time
from functools import partial
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from mitsubaer_tpu.integrators import wavefront as wf
from mitsubaer_tpu.scene import presets

def time_k(fn, k_small=4, k_big=24, reps=3):
    float(fn(k_small, jnp.uint32(0))); float(fn(k_big, jnp.uint32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter(); float(fn(k_small, jnp.uint32(r))); ts.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); float(fn(k_big, jnp.uint32(r))); tb.append(time.perf_counter()-t0)
    return (min(tb)-min(ts))/(k_big-k_small)

for res in (128, 256, 512):
    scene, cfg = presets.volumetric_box(res=res, spp=8, heterogeneous=True,
                                        density_res=64, max_depth=12)
    cfg = cfg._replace(filter="box", engine="wavefront")
    scene = jax.device_put(scene)
    n = res*res
    def make_runner(kind):
        @partial(jax.jit, static_argnums=(0,))
        def run(k, seed):
            st, event_pass, tracking_iter, cond, finalize = wf.make_engine(
                scene, cfg, 8, seed, jnp.uint32(0), has_direct=False, any_het=True)
            def warm(s):
                s = event_pass(s); s = event_pass(s, mini=True)
                return jax.lax.fori_loop(0, 3, lambda i, x: tracking_iter(x), s)
            st = jax.lax.fori_loop(0, 10, lambda i, s: warm(s), st)
            if kind == "event": body = lambda i, s: event_pass(s)
            elif kind == "mini": body = lambda i, s: event_pass(s, mini=True)
            elif kind == "track": body = lambda i, s: tracking_iter(s)
            elif kind == "track3": body = lambda i, s: tracking_iter(s, K=3)
            st = jax.lax.fori_loop(0, k, body, st)
            return st.L.sum() + st.n_taps.astype(jnp.float32)
        return lambda k, seed: run(k, seed)
    out = [f"n={n:7d}"]
    for kind in ("event", "track3"):
        dt = time_k(make_runner(kind))
        out.append(f"{kind} {dt*1e6:7.0f}us ({dt/n*1e9:5.2f}ns/lane)")
    print("  ".join(out), flush=True)
