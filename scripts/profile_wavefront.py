"""Time the wavefront engine's event pass and tracking iteration separately
on the real TPU (in-jit repetition to defeat async-timing noise)."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mitsubaer_tpu.integrators import wavefront as wf
from mitsubaer_tpu.scene import presets

res, sppc, md = 512, 16, 12
scene, cfg = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                    density_res=64, max_depth=md)
cfg = cfg._replace(filter="box", engine="wavefront")
scene = jax.device_put(scene)


@partial(jax.jit, static_argnums=(1, 2, 3))
def run(scene, which: str, k: int, warm: int, seed):
    st, event_pass, tracking_iter, cond, finalize = wf.make_engine(
        scene, cfg, sppc, seed, jnp.uint32(0), has_direct=False, any_het=True)
    # advance into a representative mid-render state
    def super_iter(s):
        s = event_pass(s)
        return jax.lax.fori_loop(0, 6, lambda i, x: tracking_iter(x), s)
    st = jax.lax.fori_loop(0, warm, lambda i, s: super_iter(s), st)
    if which == "event":
        st = jax.lax.fori_loop(0, k, lambda i, s: event_pass(s), st)
    elif which == "track":
        st = jax.lax.fori_loop(0, k, lambda i, s: tracking_iter(s), st)
    else:
        st = jax.lax.fori_loop(0, k, lambda i, s: super_iter(s), st)
    return st.L.sum() + st.n_taps.astype(jnp.float32)


def t(which, k_small, k_big, warm=10, reps=4):
    float(run(scene, which, k_small, warm, jnp.uint32(0)))
    float(run(scene, which, k_big, warm, jnp.uint32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter(); float(run(scene, which, k_small, warm, jnp.uint32(r)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(run(scene, which, k_big, warm, jnp.uint32(r)))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (k_big - k_small)


if __name__ == "__main__":
    print(jax.devices())
    print(f"  event pass: {t('event', 4, 24)*1e3:.2f} ms")
    print(f"  tracking iter: {t('track', 8, 58)*1e3:.2f} ms")
    print(f"  super iter (1ev+6tr): {t('super', 2, 12)*1e3:.2f} ms")
