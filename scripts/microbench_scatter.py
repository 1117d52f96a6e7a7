"""TPU microbench: row gather vs row scatter (set) for compaction planning,
plus tracking-iteration count instrumentation on the bench scene."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 262144
for W in (32768, 65536, 131072):
    for C in (8, 16):
        tab = jnp.zeros((N, C), jnp.float32)
        rows = jnp.ones((W, C), jnp.float32)
        idx = (jnp.arange(W, dtype=jnp.int32) * 7919) % N  # unique-ish

        @partial(jax.jit, static_argnums=(0,))
        def run_scatter(k, t, r, i):
            def body(j, acc):
                return acc.at[i].set(r + j * 0.0)
            return jax.lax.fori_loop(0, k, body, t).sum()

        @partial(jax.jit, static_argnums=(0,))
        def run_gather(k, t, i):
            def body(j, acc):
                return acc + jnp.take(t, i, axis=0).sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        float(run_scatter(2, tab, rows, idx)); float(run_scatter(12, tab, rows, idx))
        t0 = time.perf_counter(); float(run_scatter(2, tab, rows, idx)); t1 = time.perf_counter()
        float(run_scatter(12, tab, rows, idx)); t2 = time.perf_counter()
        dt_s = ((t2 - t1) - (t1 - t0)) / 10
        float(run_gather(2, tab, idx)); float(run_gather(12, tab, idx))
        t0 = time.perf_counter(); float(run_gather(2, tab, idx)); t1 = time.perf_counter()
        float(run_gather(12, tab, idx)); t2 = time.perf_counter()
        dt_g = ((t2 - t1) - (t1 - t0)) / 10
        print(f"W={W:6d} C={C:2d}: scatter {dt_s*1e3:7.3f} ms ({dt_s/W*1e9:5.2f} ns/row)"
              f"   gather {dt_g*1e3:7.3f} ms ({dt_g/W*1e9:5.2f} ns/row)", flush=True)

# also: argwhere-style compaction index build cost (cumsum + scatter)
flags = (jnp.arange(N) % 4) == 0
@jax.jit
def build_perm(f):
    pos = jnp.cumsum(f.astype(jnp.int32)) - 1
    perm = jnp.full((N,), 0, jnp.int32)
    perm = perm.at[jnp.where(f, pos, N - 1)].set(jnp.arange(N, dtype=jnp.int32))
    return perm
p = build_perm(flags); p.block_until_ready()
t0 = time.perf_counter()
for _ in range(10):
    p = build_perm(flags)
p.block_until_ready()
print(f"perm build: {(time.perf_counter()-t0)/10*1e3:.3f} ms", flush=True)
