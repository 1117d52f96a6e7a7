"""In-jit gather characterization (loop-length differencing; immune to
tunnel artifacts). Decides the tracking tap redesign.

Key question: does per-row gather cost scale with row WIDTH and with table
RESIDENCY (VMEM vs HBM)? Plus: corner-table trilinear (one (N,8) row gather
+ 7 mults) vs current 128-wide brick lookup."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 18


def bench(make_step, reps=3, k_small=4, k_big=36):
    @partial(jax.jit, static_argnums=(1,))
    def run(x0, k, salt):
        def body(i, x):
            return make_step(x, i + salt)
        return jax.lax.fori_loop(0, k, body, x0)

    x0 = jnp.float32(0)
    jax.block_until_ready(run(x0, k_small, jnp.int32(0)))
    jax.block_until_ready(run(x0, k_big, jnp.int32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, k_small, jnp.int32(r)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, k_big, jnp.int32(r)))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (k_big - k_small)


def randu(i, salt=0):
    base = jnp.arange(N, dtype=jnp.float32)
    u = jnp.sin(base * 12.9898 + i.astype(jnp.float32) * 1.618 + salt) * 43758.5
    return u - jnp.floor(u)


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)

    print("== row gather width sweep, in-jit, N=262144 ==")
    for rows, width, dt_ in [
        (2048, 128, jnp.float32), (2048, 128, jnp.bfloat16),
        (2048, 64, jnp.float32), (2048, 32, jnp.float32),
        (2048, 16, jnp.float32), (2048, 8, jnp.float32),
        (262144, 8, jnp.float32), (262144, 8, jnp.bfloat16),
        (2097152, 8, jnp.float32),
        (16384, 128, jnp.float32),
        (131072, 128, jnp.float32),   # 64MB: definitely HBM
    ]:
        table = jax.device_put(jnp.asarray(
            rng.standard_normal((rows, width)), jnp.float32).astype(dt_))

        def step(x, i, table=table, rows=rows):
            idx = (randu(i) * (rows - 1)).astype(jnp.int32)
            return x + jnp.take(table, idx, axis=0).astype(jnp.float32).sum()

        d = bench(step)
        mb = rows * width * (2 if dt_ == jnp.bfloat16 else 4) / 1e6
        print(f"  ({rows},{width}) {dt_.__name__} [{mb:.1f}MB]: "
              f"{d*1e3:.3f} ms -> {N/d/1e6:.0f} Mrows/s")

    print("== corner-table trilinear: (ncells,8) gather + weights ==")
    for ncells, dt_ in [(250047, jnp.float32), (250047, jnp.bfloat16)]:
        table = jax.device_put(jnp.asarray(
            rng.standard_normal((ncells, 8)), jnp.float32).astype(dt_))

        def step(x, i, table=table, ncells=ncells):
            idx = (randu(i) * (ncells - 1)).astype(jnp.int32)
            fx = randu(i, 1)[:, None]
            fy = randu(i, 2)[:, None]
            fz = randu(i, 3)[:, None]
            c = jnp.take(table, idx, axis=0).astype(jnp.float32)  # (N,8)
            wx = jnp.concatenate([1 - fx, fx], 1)              # (N,2)
            wy = jnp.concatenate([1 - fy, fy], 1)
            wz = jnp.concatenate([1 - fz, fz], 1)
            w = (wz[:, :, None] * wy[:, None, :]).reshape(N, 4)
            w = (w[:, :, None] * wx[:, None, :]).reshape(N, 8)
            return x + jnp.sum(c * w, -1).sum()

        d = bench(step)
        print(f"  corner ({ncells},8) {dt_.__name__}: {d*1e3:.3f} ms -> "
              f"{N/d/1e6:.0f} Mtaps/s")

    print("== 2 independent gathers in one round (pipelining?) ==")
    table = jax.device_put(jnp.asarray(rng.standard_normal((250047, 8)), jnp.float32))

    def step(x, i):
        i1 = (randu(i) * 250046).astype(jnp.int32)
        i2 = (randu(i, 9) * 250046).astype(jnp.int32)
        return x + jnp.take(table, i1, axis=0).sum() + jnp.take(table, i2, axis=0).sum()

    d = bench(step)
    print(f"  2x (N,8) gathers: {d*1e3:.3f} ms")

    print("== smaller wavefront: N=65536, (250047,8) gather ==")
    M = 1 << 16

    def step(x, i):
        base = jnp.arange(M, dtype=jnp.float32)
        u = jnp.sin(base * 12.9898 + i.astype(jnp.float32) * 1.618) * 43758.5
        u = u - jnp.floor(u)
        idx = (u * 250046).astype(jnp.int32)
        return x + jnp.take(table, idx, axis=0).sum()

    d = bench(step)
    print(f"  (N=65536): {d*1e3:.3f} ms -> {M/d/1e6:.0f} Mrows/s")


if __name__ == "__main__":
    main()
