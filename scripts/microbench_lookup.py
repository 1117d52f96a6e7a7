"""Isolate DensityBricks.lookup cost with IN-JIT repetition (k_big - k_small
difference), immune to axon-tunnel transfer/caching artifacts. Per-iter
points are derived on-device from the loop counter."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.models import medium as medium_m
from mitsubaer_tpu.scene import presets

N = 1 << 18


def bench(make_step, init, reps=3, k_small=4, k_big=64):
    """Time one step of `out = step(out, i)` via loop-length differencing."""
    @partial(jax.jit, static_argnums=(1,))
    def run(x0, k, salt):
        def body(i, x):
            return make_step(x, i + salt)
        return jax.lax.fori_loop(0, k, body, x0)

    x0 = jax.device_put(init)
    jax.block_until_ready(run(x0, k_small, jnp.float32(0)))
    jax.block_until_ready(run(x0, k_big, jnp.float32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, k_small, jnp.float32(r)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, k_big, jnp.float32(r)))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (k_big - k_small)


def points(x, i):
    """Derive (N,3) pseudo-random points in [-1,1] from state+counter."""
    base = jnp.arange(N, dtype=jnp.float32)
    u = jnp.sin(base[:, None] * jnp.array([[12.9898, 78.233, 37.719]])
                + i.astype(jnp.float32) * 1.6180) * 43758.5453
    return (u - jnp.floor(u)) * 2.0 - 1.0


def main():
    print(jax.devices())
    scene, cfg = presets.volumetric_box(res=64, spp=1, heterogeneous=True,
                                        density_res=64)
    scene = jax.device_put(scene)

    for dt_ in [jnp.bfloat16, jnp.float32]:
        bricks = medium_m.DensityBricks(scene.media, dtype=dt_)

        def step(x, i):
            p = points(x, i)
            return x + bricks.lookup(p).sum()

        d = bench(step, jnp.float32(0))
        print(f"lookup {dt_.__name__}: {d*1e3:.3f} ms/iter -> "
              f"{N/d/1e6:.0f} Mtaps/s")

    # gather-only (brick row fetch + sum)
    bricks = medium_m.DensityBricks(scene.media, dtype=jnp.bfloat16)
    tab = bricks.bricks

    def step_g(x, i):
        p = points(x, i)
        idx = (jnp.abs(p[:, 0]) * 2047).astype(jnp.int32)
        return x + jnp.take(tab, idx, axis=0).astype(jnp.float32).sum()

    d = bench(step_g, jnp.float32(0))
    print(f"gather-only (2048,128)bf16: {d*1e3:.3f} ms/iter")

    # points-only baseline (to subtract)
    def step_p(x, i):
        return x + points(x, i).sum()

    d = bench(step_p, jnp.float32(0))
    print(f"points-only: {d*1e3:.3f} ms/iter")

    # weight expansion only
    def step_w(x, i):
        p = points(x, i)
        t = p * 0.5 + 0.5
        lx = (t[:, 0] * 6).astype(jnp.int32)
        ly = (t[:, 1] * 2).astype(jnp.int32)
        lz = (t[:, 2] * 2).astype(jnp.int32)
        k8 = jnp.arange(8)
        k4 = jnp.arange(4)
        tx, ty, tz = t[:, 0:1], t[:, 1:2], t[:, 2:3]
        wx = jnp.where(k8 == lx[:, None], 1 - tx,
                       jnp.where(k8 == lx[:, None] + 1, tx, 0.))
        wy = jnp.where(k4 == ly[:, None], 1 - ty,
                       jnp.where(k4 == ly[:, None] + 1, ty, 0.))
        wz = jnp.where(k4 == lz[:, None], 1 - tz,
                       jnp.where(k4 == lz[:, None] + 1, tz, 0.))
        wzy = (wz[:, :, None] * wy[:, None, :]).reshape(-1, 16)
        w = (wzy[:, :, None] * wx[:, None, :]).reshape(-1, 128)
        return x + w.sum()

    d = bench(step_w, jnp.float32(0))
    print(f"weights-only: {d*1e3:.3f} ms/iter")

    # scalar 8-corner gather variant: flat grid (64^3,), 8 takes of (N,)
    dgrid = scene.media.density.data
    if dgrid.ndim == 4:
        dgrid = dgrid[..., 0]
    flat = dgrid.reshape(-1)
    nz, ny, nx = dgrid.shape

    def step_s(x, i):
        p = points(x, i)
        q = (p * 0.5 + 0.5) * jnp.array([nx - 1, ny - 1, nz - 1], jnp.float32)
        c = jnp.clip(jnp.floor(q), 0, jnp.array([nx - 2, ny - 2, nz - 2])).astype(jnp.int32)
        f = q - c
        acc = jnp.zeros((N,), jnp.float32)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    idx = ((c[:, 2] + dz) * ny + (c[:, 1] + dy)) * nx + (c[:, 0] + dx)
                    w = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                         * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                         * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                    acc += w * jnp.take(flat, idx)
        return x + acc.sum()

    d = bench(step_s, jnp.float32(0))
    print(f"8-scalar-gather trilinear: {d*1e3:.3f} ms/iter -> "
          f"{N/d/1e6:.0f} Mtaps/s")


if __name__ == "__main__":
    main()
