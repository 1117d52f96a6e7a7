"""Microbenchmarks for TPU perf design decisions. Inputs vary per call to
defeat any RPC-level caching on the axon tunnel."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, make_args, iters=10):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    args = [make_args(i + 1) for i in range(iters)]
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def bench_gather():
    print("== row gather: jnp.take(table, idx, axis=0) -> sum ==")
    rng = np.random.default_rng(0)
    for rows, width in [(4096, 128), (4096, 8), (262144, 1), (32768, 128)]:
        shape = (rows, width) if width > 1 else (rows,)
        table = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        for n in [1 << 20]:
            f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum())
            mk = lambda k: (table, jnp.asarray(
                rng.integers(0, rows, size=n), jnp.int32))
            dt = timeit(f, mk)
            print(f"  table ({rows},{width}) n={n}: {dt*1e3:.3f} ms -> "
                  f"{n/dt/1e9:.3f} Grows/s, {n*max(width,1)*4/dt/1e9:.1f} GB/s")


def bench_loop_overhead():
    print("== while_loop with per-iter gather ==")
    rng = np.random.default_rng(1)
    rows = 4096
    table = jnp.asarray(rng.standard_normal((rows, 128)), jnp.float32)
    for n in [1 << 17, 1 << 20]:
        def f(t, x, iters):
            def body(c):
                i, v = c
                idx = (v * 1664525 + 1013904223) & (rows - 1)
                row = jnp.take(t, idx, axis=0)
                return (i + 1, v + row[:, 0].astype(jnp.int32) % 3)
            return jax.lax.while_loop(lambda c: c[0] < iters, body,
                                      (jnp.int32(0), x))[1]

        g = jax.jit(f, static_argnums=2)
        mk = lambda k: (table, jnp.asarray(rng.integers(0, rows, size=n), jnp.int32))
        d10 = timeit(g, lambda k: mk(k) , iters=5) if False else None
        d_small = timeit(lambda t, x: g(t, x, 10), mk, iters=5)
        d_big = timeit(lambda t, x: g(t, x, 110), mk, iters=5)
        per_iter = (d_big - d_small) / 100
        print(f"  n={n}: per-gather-iteration {per_iter*1e6:.2f} us "
              f"-> {n/per_iter/1e9:.2f} Grows/s in-loop")


def bench_trilinear():
    print("== bricked trilinear lookup (current hot op) ==")
    from mitsubaer_tpu.models import medium as medium_m
    from mitsubaer_tpu.scene import presets

    rng = np.random.default_rng(2)
    scene, cfg = presets.volumetric_box(res=64, spp=1, heterogeneous=True,
                                        density_res=64)
    bricks = medium_m.DensityBricks(jax.device_put(scene).media)
    for n in [1 << 20]:
        f = jax.jit(lambda p: bricks.lookup(p).sum())
        mk = lambda k: (jnp.asarray(
            rng.uniform(-0.5, 0.5, size=(n, 3)), jnp.float32),)
        dt = timeit(f, mk)
        print(f"  n={n}: {dt*1e3:.3f} ms -> {n/dt/1e6:.1f} Mtaps/s")


def bench_woodcock():
    print("== sample_distance_woodcock full width ==")
    from mitsubaer_tpu.core import rng as rng_m
    from mitsubaer_tpu.models import medium as medium_m
    from mitsubaer_tpu.scene import presets

    rng = np.random.default_rng(3)
    scene, cfg = presets.volumetric_box(res=512, spp=1, heterogeneous=True,
                                        density_res=64)
    scene = jax.device_put(scene)
    media = scene.media
    n = 1 << 20

    @jax.jit
    def f(o, d, seed):
        smp = rng_m.make_sampler(seed, jnp.arange(n, dtype=jnp.uint32),
                                 jnp.zeros((n,), jnp.uint32))
        kind, sa, ss, sw, scale = medium_m.params(
            media, jnp.zeros((n,), jnp.int32))
        hit, dist, w, p, smp2, logp = medium_m.sample_distance_woodcock(
            media, sa, ss, scale, o, d, jnp.full((n,), 1.0), smp,
            jnp.ones((n,), bool))
        return dist.sum() + w.sum()

    def mk(k):
        o = jnp.asarray(rng.uniform(-0.4, 0.4, size=(n, 3)), jnp.float32)
        d = rng.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return (o, jnp.asarray(d, jnp.float32), jnp.uint32(k))

    dt = timeit(f, mk, iters=5)
    print(f"  n={n}: {dt*1e3:.2f} ms -> {n/dt/1e6:.2f} Msamples/s")


def bench_intersect():
    print("== brute-force intersect (volumetric box tris) ==")
    from mitsubaer_tpu.scene import presets
    from mitsubaer_tpu.scene import intersect as isect

    rng = np.random.default_rng(4)
    scene, cfg = presets.volumetric_box(res=64, spp=1, heterogeneous=True,
                                        density_res=64)
    scene = jax.device_put(scene)
    print(f"  ntris={scene.geo.v0.shape[0]}")
    n = 1 << 20

    f = jax.jit(lambda o, d: isect.intersect(
        scene.geo, o, d, jnp.zeros((n,)), jnp.full((n,), 3e38)).t.sum())

    def mk(k):
        o = jnp.asarray(rng.uniform(-1, 1, size=(n, 3)), jnp.float32)
        d = rng.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return (o, jnp.asarray(d, jnp.float32))

    dt = timeit(f, mk)
    print(f"  n={n}: {dt*1e3:.3f} ms -> {n/dt/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    print(jax.devices())
    bench_gather()
    bench_loop_overhead()
    bench_trilinear()
    bench_intersect()
    bench_woodcock()
