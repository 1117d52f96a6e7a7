"""Round-5: loop-differenced cost of ONE tracking phase, full vs compacted,
on a representative mid-render state of the bench scene."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jaxcache")

from functools import partial

from mitsubaer_tpu.integrators import wavefront as wf
from mitsubaer_tpu.scene import presets

res, sppc = 512, 32
scene, cfg0 = presets.volumetric_box(
    res=res, spp=sppc, heterogeneous=True, density_res=64, max_depth=12)
scene = jax.device_put(scene)


def build_state(cfg, warm=6):
    st, event_pass, tracking_iter, cond, finalize = wf.make_engine(
        scene, cfg, sppc, jnp.uint32(0), jnp.uint32(0), has_direct=False,
        any_het=True)

    @jax.jit
    def warmup(_):
        s = st
        for _i in range(warm):
            s = event_pass(s)
            s = tracking_iter(s, K=2)
            s = event_pass(s, mini=True)
        return s
    return warmup(0), tracking_iter, event_pass


def timed_phase(state, fn, iters_lo=1, iters_hi=3):
    def make(m):
        @jax.jit
        def f(s):
            for _ in range(m):
                s = fn(s)
            return s
        return f
    f_lo, f_hi = make(iters_lo), make(iters_hi)

    def run(f):
        jax.block_until_ready(f(state))
        t0 = time.perf_counter()
        out = f(state)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        out = f(state)
        jax.block_until_ready(out)
        return min(t1 - t0, time.perf_counter() - t1)
    return (run(f_hi) - run(f_lo)) / (iters_hi - iters_lo)


cfg = cfg0._replace(filter="box", engine="wavefront")
state, tracking_iter, event_pass = build_state(cfg)
need = (state.sh_active & ~state.sh_need_isect
        & (state.sh_t < state.sh_seg)) | state.ext_tracking
print("active lanes:", int(need.sum()), "/", need.shape[0])

for name, fn in [
    ("full K=3", lambda s: tracking_iter(s, K=3)),
    ("full K=1", lambda s: tracking_iter(s, K=1)),
    ("event", lambda s: event_pass(s)),
    ("mini", lambda s: event_pass(s, mini=True)),
]:
    print(f"{name}: {timed_phase(state, fn)*1e3:.3f} ms")

for k in (8,):
    cfgc = cfg._replace(wf_track_compact=1, wf_compact_k=k)
    ti_c = wf.make_engine(
        scene, cfgc, sppc, jnp.uint32(0), jnp.uint32(0), has_direct=False,
        any_het=True)[2]
    print(f"compact K={k}: "
          f"{timed_phase(state, lambda s: ti_c(s, K=3, compact=1))*1e3:.3f} ms")
