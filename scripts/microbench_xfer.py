"""Isolate: transfer cost vs on-device compute cost."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
N = 1 << 20

print(jax.devices())

# 1. pure transfer timing
for mb, shape, dt_ in [(12, (N, 3), jnp.float32), (4, (N,), jnp.int32)]:
    arrs = [rng.standard_normal(shape).astype(np.float32) if dt_ == jnp.float32
            else rng.integers(0, 1000, size=shape).astype(np.int32)
            for _ in range(5)]
    t0 = time.perf_counter()
    outs = [jax.device_put(a) for a in arrs]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 5
    print(f"transfer {mb}MB: {dt*1e3:.2f} ms -> {mb/1e3/dt:.2f} GB/s")

# 2. nearest-tap with inputs already on device
NZ = NY = NX = 64
grid = jax.device_put(jnp.asarray(rng.standard_normal((NZ * NY * NX,)), jnp.float32))
aabb_min = jnp.asarray([-0.5] * 3, jnp.float32)
aabb_max = jnp.asarray([0.5] * 3, jnp.float32)


@jax.jit
def nearest(p):
    res = jnp.array([NX, NY, NZ], jnp.float32)
    h = (aabb_max - aabb_min) / (res - 1.0)
    x = jnp.clip((p - aabb_min) / h, 0.0, res - 1.0)
    cell = jnp.floor(x).astype(jnp.int32)
    idx = (cell[..., 2] * NY + cell[..., 1]) * NX + cell[..., 0]
    return jnp.take(grid, idx).sum()


ps = [jax.device_put(jnp.asarray(rng.uniform(-0.6, 0.6, (N, 3)), jnp.float32))
      for _ in range(11)]
jax.block_until_ready(ps)
jax.block_until_ready(nearest(ps[0]))
t0 = time.perf_counter()
outs = [nearest(p) for p in ps[1:]]
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 10
print(f"nearest-1tap on-device: {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} Mtaps/s")

# 3. raw take, indices on device
idxs = [jax.device_put(jnp.asarray(rng.integers(0, NZ*NY*NX, N), jnp.int32))
        for _ in range(11)]
jax.block_until_ready(idxs)
take = jax.jit(lambda i: jnp.take(grid, i).sum())
jax.block_until_ready(take(idxs[0]))
t0 = time.perf_counter()
outs = [take(i) for i in idxs[1:]]
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 10
print(f"raw take on-device: {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} Mtaps/s")

# 4. same but with indices computed from float (the only difference left)
take2 = jax.jit(lambda p: jnp.take(grid, (p[:, 0] * 1000).astype(jnp.int32) % (NZ*NY*NX)).sum())
jax.block_until_ready(take2(ps[0]))
t0 = time.perf_counter()
outs = [take2(p) for p in ps[1:]]
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 10
print(f"take w/ computed idx: {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} Mtaps/s")
