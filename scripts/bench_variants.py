"""End-to-end wavefront bench for (wf_mini_passes, wf_track_iters) variants.

Usage: python scripts/bench_variants.py "[(0,3),(2,3)]"
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mitsubaer_tpu.integrators.render import render_pass_wavefront
from mitsubaer_tpu.scene import presets

VARIANTS = eval(sys.argv[1]) if len(sys.argv) > 1 else [(0, 3), (2, 3)]
# entries: (mini, T) or (mini, T, compact_denom)

res, sppc, md = 512, 32, 12
scene, cfg0 = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                     density_res=64, max_depth=md)
cfg0 = cfg0._replace(filter="box", engine="wavefront")
scene = jax.device_put(scene)
npix = res * res

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
    mean = float(L2.mean())
    dt = time.perf_counter() - t0
    samples = npix * sppc
    print(f"mini={mp} T={ti} C={tc}: pass {dt:.3f}s  full_iters {iters} "
          f"unfin {unfinished}  segs/spl {segs/samples:.2f} "
          f"taps/spl {taps/samples:.2f}  Mrays/s {segs/dt/1e6:.2f}  "
          f"Msam/s {samples/dt/1e6:.2f}  mean {mean:.4f}", flush=True)
