"""Deeper gather characterization on the real TPU: row-width sweep, dtype,
take_along_axis, sort, one-hot matmul contraction, and fused
gather+trilinear. Decides the tracking-kernel redesign (target: density taps
at >=0.5G/s effective)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, make_args, iters=8):
    out = fn(*make_args(0))
    jax.block_until_ready(out)
    args = [make_args(i + 1) for i in range(iters)]
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    n = 1 << 18  # 262144 lanes, matching the wavefront engine

    print("== A. row gather width sweep (f32), n=262144 ==")
    for rows, width in [(2048, 128), (2048, 512), (512, 1024), (256, 2048),
                        (16384, 128), (262144, 8), (262144, 1)]:
        shape = (rows, width) if width > 1 else (rows,)
        table = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(-1) if t.ndim > 1
                    else jnp.take(t, i, axis=0))
        mk = lambda k: (table, jnp.asarray(
            rng.integers(0, rows, size=n), jnp.int32))
        dt = timeit(f, mk)
        print(f"  ({rows},{width}): {dt*1e3:.3f} ms -> {n/dt/1e6:.0f} Mrows/s,"
              f" {n*width*4/dt/1e9:.1f} GB/s")

    print("== B. dtype effect, (2048,128) ==")
    for dt_ in [jnp.float32, jnp.bfloat16, jnp.int8]:
        table = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32).astype(dt_)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0).astype(jnp.float32).sum(-1))
        mk = lambda k: (table, jnp.asarray(rng.integers(0, 2048, size=n), jnp.int32))
        d = timeit(f, mk)
        print(f"  {dt_.__name__}: {d*1e3:.3f} ms -> {n/d/1e6:.0f} Mrows/s")

    print("== C. multi-tap from same row: gather (N,1024) then J in-row "
          "trilinear reductions ==")
    table = jnp.asarray(rng.standard_normal((512, 1024)), jnp.float32)
    for J in [1, 2, 4, 8]:
        def f(t, i, u, J=J):
            row = jnp.take(t, i, axis=0)  # (N,1024)
            acc = 0.0
            k = jnp.arange(1024)
            for j in range(J):
                lx = (u[:, j] * 1000).astype(jnp.int32) % 1023
                tx = u[:, j]
                w = jnp.where(k == lx[:, None], 1 - tx[:, None],
                              jnp.where(k == lx[:, None] + 1, tx[:, None], 0.))
                acc = acc + jnp.sum(row * w, -1)
            return acc
        g = jax.jit(f)
        mk = lambda k: (table,
                        jnp.asarray(rng.integers(0, 512, size=n), jnp.int32),
                        jnp.asarray(rng.random((n, 8)), jnp.float32))
        d = timeit(g, mk)
        print(f"  J={J}: {d*1e3:.3f} ms -> {n*J/d/1e6:.0f} Mtaps/s")

    print("== D. small-table gather vs select-chain vs onehot-matmul, "
          "(8,16) params table ==")
    table = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    idx_mk = lambda k: jnp.asarray(rng.integers(0, 8, size=n), jnp.int32)
    f1 = jax.jit(lambda t, i: jnp.take(t, i, axis=0).sum(-1))
    d = timeit(f1, lambda k: (table, idx_mk(k)))
    print(f"  take: {d*1e3:.3f} ms")
    def f2(t, i):
        out = jnp.broadcast_to(t[0], (n, 16))
        for r in range(1, 8):
            out = jnp.where((i == r)[:, None], t[r], out)
        return out.sum(-1)
    d = timeit(jax.jit(f2), lambda k: (table, idx_mk(k)))
    print(f"  select-chain: {d*1e3:.3f} ms")
    def f3(t, i):
        oh = (i[:, None] == jnp.arange(8)[None, :]).astype(jnp.float32)
        return (oh @ t).sum(-1)
    d = timeit(jax.jit(f3), lambda k: (table, idx_mk(k)))
    print(f"  onehot-matmul: {d*1e3:.3f} ms")

    print("== E. sort/permute costs, n=262144 ==")
    f = jax.jit(lambda x: jnp.sort(x))
    d = timeit(f, lambda k: (jnp.asarray(rng.random(n), jnp.float32),))
    print(f"  sort f32: {d*1e3:.3f} ms")
    f = jax.jit(lambda k_, v: jax.lax.sort((k_, v), num_keys=1))
    d = timeit(f, lambda k: (jnp.asarray(rng.integers(0, 2048, n), jnp.int32),
                             jnp.asarray(rng.random((n,)), jnp.float32)))
    print(f"  sort kv: {d*1e3:.3f} ms")
    f = jax.jit(lambda v, i: v[i])
    d = timeit(f, lambda k: (jnp.asarray(rng.random((n, 8)), jnp.float32),
                             jnp.asarray(rng.permutation(n), jnp.int32)))
    print(f"  permute (N,8): {d*1e3:.3f} ms")

    print("== F. current DensityBricks.lookup for reference ==")
    from mitsubaer_tpu.models import medium as medium_m
    from mitsubaer_tpu.scene import presets
    scene, cfg = presets.volumetric_box(res=64, spp=1, heterogeneous=True,
                                        density_res=64)
    scene = jax.device_put(scene)
    bricks = medium_m.DensityBricks(scene.media, dtype=jnp.bfloat16)
    f = jax.jit(lambda p: bricks.lookup(p).sum())
    mk = lambda k: (jnp.asarray(rng.random((n, 3)) * 2 - 1, jnp.float32),)
    d = timeit(f, mk)
    print(f"  bricks.lookup: {d*1e3:.3f} ms -> {n/d/1e6:.0f} Mtaps/s")


if __name__ == "__main__":
    main()
