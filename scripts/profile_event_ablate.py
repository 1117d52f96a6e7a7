"""Ablation timing of the wavefront event pass (WF_ABLATE env var)."""
import os
import subprocess
import sys

import os as _os
VARIANTS = _os.environ.get("ABL_VARIANTS", "|noslots|nobeam|nodir").split("|")

RUN = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial
import jax, jax.numpy as jnp
from mitsubaer_tpu.integrators import wavefront as wf
from mitsubaer_tpu.scene import presets
res, sppc, md = 512, 16, 12
scene, cfg = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                    density_res=64, max_depth=md)
cfg = cfg._replace(filter="box", engine="wavefront")
scene = jax.device_put(scene)

@partial(jax.jit, static_argnums=(1, 2))
def run(scene, k, warm, seed):
    st, event_pass, tracking_iter, cond, finalize = wf.make_engine(
        scene, cfg, sppc, seed, jnp.uint32(0), has_direct=False, any_het=True)
    def super_iter(s):
        s = event_pass(s)
        return jax.lax.fori_loop(0, 6, lambda i, x: tracking_iter(x), s)
    st = jax.lax.fori_loop(0, warm, lambda i, s: super_iter(s), st)
    st = jax.lax.fori_loop(0, k, lambda i, s: event_pass(s), st)
    return st.L.sum() + st.n_taps.astype(jnp.float32)

def t(k_small, k_big, warm=10, reps=3):
    float(run(scene, k_small, warm, jnp.uint32(0)))
    float(run(scene, k_big, warm, jnp.uint32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter(); float(run(scene, k_small, warm, jnp.uint32(r)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run(scene, k_big, warm, jnp.uint32(r)))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (k_big - k_small)

print(f"{t(4, 24)*1e3:.2f} ms")
'''

for v in VARIANTS:
    env = dict(os.environ)
    env["WF_ABLATE"] = v
    r = subprocess.run([sys.executable, "-c", RUN], env=env,
                       capture_output=True, text=True, timeout=900)
    out = [l for l in r.stdout.splitlines() if "ms" in l]
    print(f"{v or 'baseline':55s} {out[-1] if out else 'FAIL: ' + r.stderr[-200:]}")
