"""Round-4: DDA tracking pass cost + end-to-end schedule sweep on TPU.
Usage: python scripts/profile_dda.py "[(2,3,8),(2,2,8),(1,3,8),(2,3,0)]"
  variants = (wf_mini_passes, wf_track_iters, wf_dda)
"""
import sys, time, os
from functools import partial
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from mitsubaer_tpu.integrators import wavefront as wf
from mitsubaer_tpu.integrators.render import render_pass_wavefront
from mitsubaer_tpu.scene import presets

VARIANTS = eval(sys.argv[1]) if len(sys.argv) > 1 else [(2, 3, 8), (2, 2, 8), (1, 2, 8), (2, 3, 0)]
res, sppc, md = 512, 32, 12
scene, cfg0 = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                     density_res=64, max_depth=md)
cfg0 = cfg0._replace(filter="box", engine="wavefront")
scene = jax.device_put(scene)
npix = res * res

def time_k(fn, k_small=4, k_big=24, reps=3):
    float(fn(k_small, jnp.uint32(0))); float(fn(k_big, jnp.uint32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter(); float(fn(k_small, jnp.uint32(r))); ts.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); float(fn(k_big, jnp.uint32(r))); tb.append(time.perf_counter()-t0)
    return (min(tb)-min(ts))/(k_big-k_small)

if os.environ.get("KINDS"):
    for spec in os.environ["KINDS"].split(","):
        kind, dda = spec.split(":")
        cfg = cfg0._replace(wf_dda=int(dda))
        @partial(jax.jit, static_argnums=(0,))
        def run(k, seed, cfg=cfg, kind=kind):
            st, event_pass, tracking_iter, cond, finalize = wf.make_engine(
                scene, cfg, sppc, seed, jnp.uint32(0), has_direct=False, any_het=True)
            def warm(s):
                s = event_pass(s); s = event_pass(s, mini=True)
                return jax.lax.fori_loop(0, 3, lambda i, x: tracking_iter(x), s)
            st = jax.lax.fori_loop(0, 10, lambda i, s: warm(s), st)
            K = int(kind[1:]) if kind.startswith("t") else 0
            body = (lambda i, s: tracking_iter(s, K=K)) if K else (lambda i, s: event_pass(s, mini=True))
            st = jax.lax.fori_loop(0, k, body, st)
            return st.L.sum() + st.n_taps.astype(jnp.float32)
        dt = time_k(lambda k, s: run(k, s))
        print(f"{spec}: {dt*1e3:6.2f} ms/pass", flush=True)

for var in VARIANTS:
    mp, ti, dda = var
    cfg = cfg0._replace(wf_mini_passes=mp, wf_track_iters=ti, wf_dda=dda)
    L = jnp.zeros((npix, 3), jnp.float32)
    L1, stats = render_pass_wavefront(scene, L, cfg, sppc, jnp.uint32(0),
                                      jnp.uint32(0), has_direct=False, any_het=True)
    _ = float(L1.sum())
    t0 = time.perf_counter()
    L2, stats = render_pass_wavefront(scene, L1, cfg, sppc, jnp.uint32(0),
                                      jnp.uint32(1), has_direct=False, any_het=True)
    segs, taps, iters, unfin = [int(x) for x in stats]
    m = float(L2.sum())
    dt = time.perf_counter() - t0
    samples = npix * sppc
    print(f"mini={mp} T={ti} dda={dda}: pass {dt:.3f}s iters {iters} unfin {unfin} "
          f"segs/spl {segs/samples:.2f} taps/spl {taps/samples:.2f} "
          f"Mrays/s {segs/dt/1e6:.2f} Msmp/s {samples/dt/1e6:.2f} Lsum {m:.1f}", flush=True)
