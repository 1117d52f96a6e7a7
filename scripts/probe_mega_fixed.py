"""Isolate the pallas_call fixed cost: no-op copy kernels, varying grid
size and block size, timed as a 10-chain inside one jit."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(nrows, N, B, label, chain=10):
    def kern(i_ref, o_ref):
        o_ref[:] = i_ref[:] + 1.0

    f = lambda x: pl.pallas_call(
        kern,
        grid=(N // B,),
        out_shape=jax.ShapeDtypeStruct((nrows, N), jnp.float32),
        in_specs=[pl.BlockSpec((nrows, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nrows, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(x)

    @jax.jit
    def g(x):
        return jax.lax.fori_loop(0, chain, lambda i, s: f(s), x)

    x = jnp.zeros((nrows, N), jnp.float32)
    _ = float(np.asarray(g(x)[0]).sum())
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = g(x)
        _ = float(np.asarray(r[0, :8]).sum())
        best = min(best, (time.perf_counter() - t0) / chain)
    print(f"{label}: {best*1e3:8.3f} ms/call  ({N//B} blocks, "
          f"{nrows}x{N} f32 = {nrows*N*4/1e6:.1f} MB)")


def main():
    print(jax.devices())
    bench(8, 1024, 1024, "tiny 1-block")
    bench(8, 262144, 1024, "8-row 256-block")
    bench(8, 262144, 8192, "8-row 32-block")
    bench(16, 262144, 1024, "16-row 256-block")
    bench(16, 262144, 8192, "16-row 32-block")
    # XLA reference: same copy without pallas
    @jax.jit
    def gx(x):
        return jax.lax.fori_loop(0, 10, lambda i, s: s + 1.0, x)
    x = jnp.zeros((16, 262144), jnp.float32)
    _ = float(np.asarray(gx(x)[0, :8]).sum())
    t0 = time.perf_counter()
    r = gx(x)
    _ = float(np.asarray(r[0, :8]).sum())
    print(f"xla +1 16x262144: {(time.perf_counter()-t0)/10*1e3:8.3f} ms/call")


if __name__ == "__main__":
    main()


def chain_sweep():
    """True device per-call cost: vary chain length, dispatch cancels."""
    import importlib
    sys.path.insert(0, "/root/repo/scripts")
    pm = importlib.import_module("probe_mega_r5")
    rng = np.random.default_rng(0)
    d = rng.random((pm.GR,) * 3).astype(np.float32)
    tab = jnp.asarray(pm.build_table(d), jnp.bfloat16)
    N, B, trips = 262144, 1024, 8
    st = np.zeros((16, N), np.float32)
    st[0:3] = rng.random((3, N)) * 2.0
    dirs = rng.standard_normal((3, N))
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    st[3:6] = dirs
    st[7] = rng.random(N) * 0.5 + 0.2
    st[8] = 8.0
    st[10] = 1.0
    stj = jnp.asarray(st)
    kern = pm.make_kernel(B, trips, 0.0, (pm.GR - 1) / 2.0)

    def call(s, tab):
        return pl.pallas_call(
            kern,
            grid=(N // B,),
            out_shape=jax.ShapeDtypeStruct((16, N), jnp.float32),
            in_specs=[
                pl.BlockSpec((16, B), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pm.W, pm.R), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((16, B), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        )(s, tab)

    times = {}
    for chain in (10, 40):
        @jax.jit
        def g(s, tab):
            return jax.lax.fori_loop(0, chain, lambda i, c: call(c, tab), s)
        _ = float(np.asarray(g(stj, tab)[6, :8]).sum())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = g(stj, tab)
            _ = float(np.asarray(r[6, :8]).sum())
            best = min(best, time.perf_counter() - t0)
        times[chain] = best
        print(f"chain={chain}: total {best*1e3:.3f} ms")
    per_call = (times[40] - times[10]) / 30
    loop_part = trips * N * 3.0e-9
    print(f"device per-call: {per_call*1e3:.3f} ms "
          f"(loop@3ns = {loop_part*1e3:.3f} ms -> fixed "
          f"{(per_call-loop_part)*1e3:.3f} ms)")


if __name__ == "__main__":
    chain_sweep()
