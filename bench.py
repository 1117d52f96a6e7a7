"""Benchmark: forward rays/s on the heterogeneous volumetric scene
(BASELINE.json metric). Prints ONE JSON line.

Run on the real TPU chip (default platform) — everything is jitted, so the
axon tunnel only sees compiled programs.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mitsubaer_tpu.integrators import render as render_m
    from mitsubaer_tpu.models import film as film_m
    from mitsubaer_tpu.scene import presets

    res = 512
    sppc = 4
    max_depth = 12
    scene, cfg = presets.volumetric_box(
        res=res, spp=sppc, heterogeneous=True, density_res=64,
        max_depth=max_depth,
    )
    cfg = cfg._replace(filter="box")

    scene = jax.device_put(scene)
    accum = film_m.new_accumulator(cfg)

    def one_pass(accum, pass_idx):
        return render_m.render_pass(
            scene, accum, cfg, sppc, jnp.asarray(0, jnp.uint32), pass_idx
        )

    # warmup / compile
    accum = one_pass(accum, jnp.asarray(0, jnp.uint32))
    accum.block_until_ready()

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        accum = one_pass(accum, jnp.asarray(i, jnp.uint32))
    accum.block_until_ready()
    dt = time.perf_counter() - t0

    # camera rays traced per pass (primary wavefront lanes; bounces and
    # shadow rays add work per ray but the metric follows the reference's
    # "samples/s" convention: primary samples per second)
    rays = res * res * sppc * n_iters
    mrays = rays / dt / 1e6

    img = np.asarray(film_m.develop(accum))
    ok = bool(np.isfinite(img).all() and img.mean() > 0)

    baseline = 100.0  # Mrays/s/chip target (BASELINE.json north star)
    print(json.dumps({
        "metric": "forward_Mrays_per_s_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 4),
        "valid_image": ok,
        "config": f"volumetric heterogeneous {res}x{res} spp{sppc} depth{max_depth}",
    }))


if __name__ == "__main__":
    main()
