"""Round-4: grouped-tile engine (wavefront2) end-to-end TPU profile.
Usage: python scripts/profile_wf2.py "[(2,3,0),(2,3,8),(2,6,8),(1,6,8)]"
  variants = (wf_mini_passes, wf_track_iters, wf_dda)
"""
import sys, time
from functools import partial
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import functools
import jax
from experiments.wavefront2 import render_wavefront2


@functools.partial(jax.jit,
                   static_argnames=("cfg", "sppc", "has_direct", "any_het"),
                   keep_unused=True)
def render_pass_wavefront2(scene, accum_L, cfg, sppc, seed, pass_idx,
                           has_direct=True, any_het=True):
    L, stats = render_wavefront2(scene, cfg, sppc, seed, pass_idx,
                                 has_direct=has_direct, any_het=any_het)
    return accum_L + L, stats

from mitsubaer_tpu.scene import presets

VARIANTS = eval(sys.argv[1]) if len(sys.argv) > 1 else [(2, 3, 0), (2, 3, 8), (2, 6, 8)]
res, sppc, md = 512, 32, 12
scene, cfg0 = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                     density_res=64, max_depth=md)
cfg0 = cfg0._replace(filter="box", engine="wavefront2")
scene = jax.device_put(scene)
npix = res * res

for var in VARIANTS:
    mp, ti, dda = var
    cfg = cfg0._replace(wf_mini_passes=mp, wf_track_iters=ti, wf_dda=dda)
    L = jnp.zeros((npix, 3), jnp.float32)
    t0 = time.perf_counter()
    L1, stats = render_pass_wavefront2(scene, L, cfg, sppc, jnp.uint32(0),
                                       jnp.uint32(0), has_direct=False, any_het=True)
    _ = float(L1.sum()); tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    L2, stats = render_pass_wavefront2(scene, L1, cfg, sppc, jnp.uint32(0),
                                       jnp.uint32(1), has_direct=False, any_het=True)
    segs, taps, iters, unfin = [int(x) for x in stats]
    m = float(L2.sum())
    dt = time.perf_counter() - t0
    samples = npix * sppc
    print(f"mini={mp} T={ti} dda={dda}: compile {tc:.0f}s pass {dt:.3f}s iters {iters} "
          f"unfin {unfin} segs/spl {segs/samples:.2f} taps/spl {taps/samples:.2f} "
          f"Mrays/s {segs/dt/1e6:.2f} Msmp/s {samples/dt/1e6:.2f} Lsum {m:.1f}", flush=True)
