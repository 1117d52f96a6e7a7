"""Round-5 probes for the compaction design:

1. Random-row SCATTER cost: W sorted-unique rows (C cols) into an (n, C)
   table — the unpack-back step compaction needs. r3/r4 assumed TPU scatter
   is 5-10x slower than gather; measure it properly (loop-differenced).
2. Parallel gather streams: is ONE (K*n)-row gather the max, or do 2-4
   independent gathers from separate tables overlap (HBM has ~4x headroom
   over the measured 190 GB/s single-stream gather)?

Usage: python scripts/probe_scatter_r5.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jaxcache")


def timed(fn, *args, iters=3):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def loop_diff(make_fn, n_lo=4, n_hi=16):
    """Build f(x, iters) in-graph loops; return per-iter seconds."""
    f_lo = make_fn(n_lo)
    f_hi = make_fn(n_hi)
    t_lo = timed(f_lo)
    t_hi = timed(f_hi)
    return (t_hi - t_lo) / (n_hi - n_lo)


N = 262144


def probe_scatter(W, C):
    key = jax.random.PRNGKey(0)
    idx = jnp.sort(jax.random.choice(key, N, (W,), replace=False))
    rows = jnp.ones((W, C), jnp.float32)
    table = jnp.zeros((N, C), jnp.float32)

    def make(iters):
        @jax.jit
        def f():
            def body(i, tab):
                return tab.at[idx].set(rows + i.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, table)
        return f

    dt = loop_diff(make)
    print(f"scatter {W}x{C} into {N}x{C}: {dt*1e3:.3f} ms "
          f"({dt/W*1e9:.2f} ns/row)")


def probe_scatter_where(W, C):
    """Alternative unpack: full-width gather-back via rank (the r4 wall)."""
    key = jax.random.PRNGKey(1)
    need = jax.random.uniform(key, (N,)) < (W / N)
    rank = jnp.cumsum(need.astype(jnp.int32)) - 1
    lane_slot = jnp.clip(jnp.where(need, rank, 0), 0, W - 1)
    rows = jnp.ones((W, C), jnp.float32)

    def make(iters):
        @jax.jit
        def f():
            def body(i, acc):
                got = jnp.take(rows + i.astype(jnp.float32), lane_slot,
                               axis=0)
                return acc + got
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((N, C), jnp.float32))
        return f

    dt = loop_diff(make)
    print(f"gather-back full-width {N} rows from {W}x{C}: {dt*1e3:.3f} ms "
          f"({dt/N*1e9:.2f} ns/row)")


def probe_parallel_gather(n_streams, rows_per_stream=65536, C=128):
    tables = [jnp.arange(3969 * C, dtype=jnp.float32).reshape(3969, C) + i
              for i in range(n_streams)]
    key = jax.random.PRNGKey(2)
    idxs = [jax.random.randint(jax.random.fold_in(key, i), (rows_per_stream,),
                               0, 3969) for i in range(n_streams)]

    def make(iters):
        @jax.jit
        def f():
            def body(i, acc):
                tot = acc
                for s in range(n_streams):
                    g = jnp.take(tables[s], idxs[s] + i % 2, axis=0)
                    tot = tot + jnp.sum(g, axis=0)
                return tot
            return jax.lax.fori_loop(0, iters, body,
                                     jnp.zeros((C,), jnp.float32))
        return f

    dt = loop_diff(make)
    tot_rows = n_streams * rows_per_stream
    print(f"gather {n_streams} streams x {rows_per_stream} rows (C={C}): "
          f"{dt*1e3:.3f} ms ({dt/tot_rows*1e9:.2f} ns/row)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for W in (32768, 65536, 131072):
        probe_scatter(W, 8)
    probe_scatter(65536, 12)
    probe_scatter(65536, 16)
    probe_scatter_where(65536, 8)
    for s in (1, 2, 4):
        probe_parallel_gather(s)
