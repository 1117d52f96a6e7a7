"""Round-4 probe: compaction primitive costs via in-loop differencing.
sort_key_val, row-gather (table size x rows-gathered x width), block-gather."""
import sys, time
from functools import partial
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np

def bench(name, step, k_small=4, k_big=24, reps=3):
    @partial(jax.jit, static_argnums=(1,))
    def run(x0, k, salt):
        return jax.lax.fori_loop(0, k, lambda i, x: step(x, i + salt), x0)
    x0 = jnp.float32(1.0)
    jax.block_until_ready(run(x0, k_small, jnp.int32(0)))
    jax.block_until_ready(run(x0, k_big, jnp.int32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(run(x0, k_small, jnp.int32(r))); ts.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); jax.block_until_ready(run(x0, k_big, jnp.int32(r))); tb.append(time.perf_counter()-t0)
    dt = (min(tb)-min(ts))/(k_big-k_small)
    print(f"{name}: {dt*1e6:8.1f} us", flush=True)
    return dt

rng = np.random.default_rng(0)

# sort cost
for n in (16384, 65536, 262144):
    keys = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)
    vals = jnp.arange(n, dtype=jnp.int32)
    def step(x, i, keys=keys, vals=vals, n=n):
        k2 = keys ^ i
        sk, sv = jax.lax.sort_key_val(k2, vals)
        return x + sk[0].astype(jnp.float32) + sv[-1].astype(jnp.float32)
    bench(f"sort_key_val n={n}", step)

# row gather: W rows of width C from T-row table
for T, W, C in [(262144, 65536, 12), (262144, 262144, 12), (65536, 16384, 12),
                (65536, 65536, 12), (16384, 16384, 12), (262144, 65536, 1),
                (262144, 262144, 1), (65536, 65536, 1), (3969, 262144, 128)]:
    tab = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, W), jnp.int32)
    def step(x, i, tab=tab, idx=idx, T=T):
        rows = jnp.take(tab, (idx + i) % T, axis=0)
        return x + rows.sum()
    bench(f"gather T={T} W={W} C={C}", step)

# block gather: take K of G big rows (contiguous groups)
for G, K, RW in [(512, 128, 512*12), (512, 256, 512*12)]:
    tab = jnp.asarray(rng.standard_normal((G, RW)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, G, K), jnp.int32)
    def step(x, i, tab=tab, idx=idx, G=G):
        rows = jnp.take(tab, (idx + i) % G, axis=0)
        return x + rows.sum()
    bench(f"blockgather G={G} K={K} roww={RW}", step)

# scatter rows back: K big rows into G-row table
for G, K, RW in [(512, 128, 512*12)]:
    tab = jnp.asarray(rng.standard_normal((G, RW)).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((K, RW)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, G, K), jnp.int32)
    def step(x, i, tab=tab, src=src, idx=idx, G=G):
        t2 = tab.at[(idx + i) % G].set(src * x)
        return x + t2.sum() * 1e-9
    bench(f"blockscatter G={G} K={K} roww={RW}", step)
