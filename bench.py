"""Benchmark: forward rays/s on the heterogeneous volumetric scene
(BASELINE.json metric). Prints ONE JSON line.

Metric: traced ray segments per second (extension segments + shadow-ray
segments, each requiring scene intersection + medium traversal) — the
standard renderer Mrays/s convention. The persistent-wavefront engine
counts its segments exactly (integrators/wavefront.py stats).

Runs on the real TPU chip; everything is jitted, the axon tunnel only sees
compiled programs and scalar results.
"""
import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mitsubaer_tpu.integrators.render import render_pass_wavefront
    from mitsubaer_tpu.scene import presets

    res = 512
    sppc = 32   # large per-pass sample budget amortizes the wavefront tail
    max_depth = 12
    scene, cfg = presets.volumetric_box(
        res=res, spp=sppc, heterogeneous=True, density_res=64,
        max_depth=max_depth,
    )
    cfg = cfg._replace(filter="box", engine="wavefront", wf_track_iters=3)
    scene = jax.device_put(scene)
    npix = res * res

    L = jnp.zeros((npix, 3), jnp.float32)

    def one_pass(L, pass_idx):
        return render_pass_wavefront(
            scene, L, cfg, sppc, jnp.asarray(0, jnp.uint32), pass_idx,
            has_direct=False, any_het=True,
        )

    # warmup / compile. NOTE: through the axon tunnel block_until_ready can
    # return before execution finishes — force a real device->host fetch.
    L, stats = one_pass(L, jnp.asarray(0, jnp.uint32))
    _ = float(L.sum()) + int(stats[0])

    n_iters = 3
    segs = 0
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        L, stats = one_pass(L, jnp.asarray(i, jnp.uint32))
        segs += int(stats[0])
    _ = float(L.sum())
    dt = time.perf_counter() - t0

    samples = npix * sppc * n_iters
    mrays = segs / dt / 1e6
    msamples = samples / dt / 1e6

    img = np.asarray(L / (sppc * (n_iters + 1)))
    ok = bool(np.isfinite(img).all() and img.mean() > 0)

    baseline = 100.0  # Mrays/s/chip target (BASELINE.json north star)
    print(json.dumps({
        "metric": "forward_Mrays_per_s_per_chip",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 4),
        "samples_per_s_M": round(msamples, 4),
        "segments_per_sample": round(segs / samples, 2),
        "valid_image": ok,
        "config": f"volumetric heterogeneous {res}x{res} spp{sppc} depth{max_depth}",
    }))


if __name__ == "__main__":
    main()
