"""One bench-config render pass; print segment/tap/iteration stats."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mitsubaer_tpu.integrators.render import render_pass_wavefront
from mitsubaer_tpu.scene import presets

res, sppc, md = 512, 32, 12
scene, cfg = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                    density_res=64, max_depth=md)
cfg = cfg._replace(filter="box", engine="wavefront", wf_track_iters=3)
scene = jax.device_put(scene)
npix = res * res
L = jnp.zeros((npix, 3), jnp.float32)

L1, stats = render_pass_wavefront(scene, L, cfg, sppc, jnp.uint32(0),
                                  jnp.uint32(0), has_direct=False, any_het=True)
_ = float(L1.sum())
t0 = time.perf_counter()
L2, stats = render_pass_wavefront(scene, L1, cfg, sppc, jnp.uint32(0),
                                  jnp.uint32(1), has_direct=False, any_het=True)
segs, taps, iters, unfinished = [int(x) for x in stats]
_ = float(L2.sum())
dt = time.perf_counter() - t0
samples = npix * sppc
print(f"pass time {dt:.3f}s  samples {samples}")
print(f"segments {segs} ({segs/samples:.2f}/sample)  taps {taps} "
      f"({taps/samples:.2f}/sample)  super_iters {iters}  unfinished {unfinished}")
print(f"per-super-iter {dt/iters*1e3:.3f} ms;  Msamples/s {samples/dt/1e6:.2f}; "
      f"Mrays/s {segs/dt/1e6:.2f}; Mtaps/s {taps/dt/1e6:.2f}")
