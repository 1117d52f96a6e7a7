"""Atom costs on the bench scene: fused density lookup, K-batch tracking
pass, lax.sort-based compaction list build."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mitsubaer_tpu.models import medium as medium_m
from mitsubaer_tpu.scene import presets

N = 262144
scene, cfg = presets.volumetric_box(res=512, spp=1, heterogeneous=True,
                                    density_res=64)
scene = jax.device_put(scene)
bricks = medium_m.DensityBricks(scene.media, dtype=jnp.bfloat16)


def timeit(fn, *args):
    float(fn(2, *args)); float(fn(12, *args))
    ts = []
    for i in range(3):
        t0 = time.perf_counter(); float(fn(2, *args)); t1 = time.perf_counter()
        float(fn(12, *args)); t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / 10)
    return min(ts)


# 1. fused lookup at several widths
for W in (N, N // 2, N // 4):
    @partial(jax.jit, static_argnums=(0,))
    def look(k, key):
        p0 = jax.random.uniform(jax.random.PRNGKey(0), (W, 3)) * 2 - 1
        def body(j, acc):
            p = p0 + j * 1e-6
            return acc + bricks.lookup(p).sum()
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))
    print(f"lookup W={W:6d}: {timeit(look, 0)*1e3:6.3f} ms", flush=True)

# 2. lax.sort compaction list build (key = need? lane : BIG)
flags = ((jnp.arange(N) * 134775813) % 7) < 2
@partial(jax.jit, static_argnums=(0,))
def sort_build(k, f):
    def body(j, acc):
        key = jnp.where(f, jnp.arange(N, dtype=jnp.int32) + j,
                        jnp.int32(2 ** 30))
        srt = jax.lax.sort(key)
        return acc + srt[0].astype(jnp.float32)
    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
print(f"lax.sort 262k int32: {timeit(sort_build, flags)*1e3:6.3f} ms", flush=True)

@partial(jax.jit, static_argnums=(0,))
def sort_kv(k, f):
    def body(j, acc):
        key = jnp.where(f, jnp.arange(N, dtype=jnp.int32) + j,
                        jnp.int32(2 ** 30))
        kk, vv = jax.lax.sort_key_val(key, jnp.arange(N, dtype=jnp.int32))
        return acc + vv[0].astype(jnp.float32)
    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
print(f"lax.sort_key_val:    {timeit(sort_kv, flags)*1e3:6.3f} ms", flush=True)

# 3. cumsum alone
@partial(jax.jit, static_argnums=(0,))
def csum(k, f):
    def body(j, acc):
        return acc + jnp.cumsum(f.astype(jnp.int32) + j)[-1].astype(jnp.float32)
    return jax.lax.fori_loop(0, k, body, jnp.float32(0))
print(f"cumsum 262k:         {timeit(csum, flags)*1e3:6.3f} ms", flush=True)
