"""TPU sweep over (epoch ring E, T_TRACK) for the bench config."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from mitsubaer_tpu.integrators.render import render_pass_wavefront
from mitsubaer_tpu.scene import presets

res, sppc, md = 512, 32, 12
scene0, cfg0 = presets.volumetric_box(res=res, spp=sppc, heterogeneous=True,
                                      density_res=64, max_depth=md)
scene0 = jax.device_put(scene0)
npix = res * res

def run(E, T):
    cfg = cfg0._replace(filter="box", engine="wavefront", wf_track_iters=T,
                        wf_epoch_ring=E)
    L = jnp.zeros((npix, 3), jnp.float32)
    L1, stats = render_pass_wavefront(scene0, L, cfg, sppc, jnp.uint32(0),
                                      jnp.uint32(0), has_direct=False,
                                      any_het=True)
    _ = float(L1.sum())
    t0 = time.perf_counter()
    L2, stats = render_pass_wavefront(scene0, L1, cfg, sppc, jnp.uint32(0),
                                      jnp.uint32(1), has_direct=False,
                                      any_het=True)
    segs, taps, iters, unfin = [int(x) for x in stats]
    _ = float(L2.sum())
    dt = time.perf_counter() - t0
    mrays = segs / dt / 1e6
    print(f"E={E:3d} T={T} : {dt:.3f}s  si={iters:4d} "
          f"({dt/iters*1e3:.2f} ms/si)  {mrays:6.2f} Mrays/s  unfin={unfin}")

import sys
configs = eval(sys.argv[1]) if len(sys.argv) > 1 else [(0, 3), (0, 2), (16, 3)]
for E, T in configs:
    run(E, T)
