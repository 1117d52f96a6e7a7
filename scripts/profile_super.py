"""Time one composed super-iteration (E+M+trackK) under fori vs while."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mitsubaer_tpu.integrators import wavefront as wf
from mitsubaer_tpu.scene import presets

res, sppc, md = 512, 32, 12
scene, cfg0 = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                     density_res=64, max_depth=md)
cfg = cfg0._replace(filter="box", engine="wavefront", wf_mini_passes=1,
                    wf_track_iters=6)
scene = jax.device_put(scene)
K = 6


def make(kind):
    @partial(jax.jit, static_argnums=(0,))
    def run(k, seed):
        st, event_pass, tracking_iter, cond, finalize = wf.make_engine(
            scene, cfg, sppc, seed, jnp.uint32(0), has_direct=False,
            any_het=True)

        def super_iter(s):
            s = event_pass(s)
            s = event_pass(s, mini=True)
            return tracking_iter(s, K=K)

        def super_cond(s):
            s = event_pass(s)
            s = event_pass(s, mini=True)
            return jax.lax.cond(s.track_work,
                                lambda x: tracking_iter(x, K=K),
                                lambda x: x, s)

        st = jax.lax.fori_loop(0, 8, lambda i, s: super_iter(s), st)  # warm
        if kind == "fori":
            st = jax.lax.fori_loop(0, k, lambda i, s: super_iter(s), st)
        elif kind == "fori_cond":
            st = jax.lax.fori_loop(0, k, lambda i, s: super_cond(s), st)
        elif kind == "while":
            stt = (jnp.int32(0), st)
            stt = jax.lax.while_loop(
                lambda c: c[0] < k,
                lambda c: (c[0] + 1, super_iter(c[1])), stt)
            st = stt[1]
        return st.L.sum() + st.n_taps.astype(jnp.float32)
    return run


for kind in ("fori", "fori_cond", "while"):
    r = make(kind)
    float(r(4, jnp.uint32(0))); float(r(24, jnp.uint32(0)))
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); float(r(4, jnp.uint32(i)))
        t1 = time.perf_counter(); float(r(24, jnp.uint32(i)))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / 20)
    print(f"{kind:10s}: {min(ts)*1e3:.2f} ms/super-iter", flush=True)
