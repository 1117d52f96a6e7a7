"""Round-5: A/B the reworked sort-compacted tracking on the bench scene.

Usage: python scripts/profile_compact_r5.py "[(0,3,2,0),(1,3,2,8),(1,3,1,8),(1,2,1,12)]"
Each tuple = (wf_track_compact, wf_track_iters, wf_mini_passes, wf_compact_k).
"""
import ast
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jaxcache")

from mitsubaer_tpu.integrators.render import render_pass_wavefront
from mitsubaer_tpu.scene import presets

res, sppc, max_depth = 512, 32, 12
scene, cfg0 = presets.volumetric_box(
    res=res, spp=sppc, heterogeneous=True, density_res=64,
    max_depth=max_depth)
cfg0 = cfg0._replace(filter="box", engine="wavefront")
scene = jax.device_put(scene)
npix = res * res

combos = ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1 else \
    [(0, 3, 2, 0), (1, 3, 2, 8), (1, 3, 1, 8), (1, 3, 1, 12)]

for (comp, ti, mini, ck) in combos:
    cfg = cfg0._replace(wf_track_compact=comp, wf_track_iters=ti,
                        wf_mini_passes=mini, wf_compact_k=ck or 8)
    L = jnp.zeros((npix, 3), jnp.float32)

    def one_pass(L, pass_idx):
        return render_pass_wavefront(
            scene, L, cfg, sppc, jnp.asarray(0, jnp.uint32), pass_idx,
            has_direct=False, any_het=True)

    L, stats = one_pass(L, jnp.asarray(0, jnp.uint32))
    _ = float(L.sum()) + int(stats[0])
    n_iters = 3
    segs = iters = 0
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        L, stats = one_pass(L, jnp.asarray(i, jnp.uint32))
        segs += int(stats[0])
        iters += int(stats[2])
    _ = float(L.sum())
    dt = time.perf_counter() - t0
    mean = float(np.asarray(L).mean()) / (sppc * (n_iters + 1))
    print(f"comp={comp} T={ti} mini={mini} K={ck}: "
          f"{segs/dt/1e6:.2f} Mrays/s  {npix*sppc*n_iters/dt/1e6:.2f} "
          f"Msamples/s  iters/pass={iters/n_iters:.0f}  mean={mean:.5f}")
