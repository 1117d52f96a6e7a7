"""Mosaic per-lane gather probes (jax 0.9.0, TPU v5e). Sequential dependence
through the loop (idx derived from acc) defeats hoisting/folding."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 18
R, W = 2048, 128


def bench(fn, args, reps=3, k_small=2, k_big=18):
    @partial(jax.jit, static_argnums=(0,))
    def run(k, salt, *a):
        def body(i, acc):
            return acc * 0.5 + fn(*a, i + salt, acc)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    jax.block_until_ready(run(k_small, jnp.int32(0), *args))
    jax.block_until_ready(run(k_big, jnp.int32(0), *args))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(k_small, jnp.int32(r), *args))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(k_big, jnp.int32(r), *args))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (k_big - k_small)


def randidx(i, acc, n=N, r=R):
    base = jnp.arange(n, dtype=jnp.float32)
    u = jnp.sin(base * 12.9898 + i.astype(jnp.float32) * 1.618 + acc * 1e-20) * 43758.5
    return ((u - jnp.floor(u)) * (r - 1)).astype(jnp.int32)


def try_bench(name, fn, args):
    try:
        d = bench(fn, args)
        print(f"{name}: {d*1e3:.3f} ms -> {N/d/1e6:.0f} M/s")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:240]}")


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((R, W)), jnp.float32)

    # XLA baseline
    def f_xla(tab, i, acc):
        idx = randidx(i, acc)
        return jnp.take(tab, idx, axis=0).sum()

    try_bench("xla row take (2048,128)", f_xla, (table,))

    # A. pallas take_along_axis: out[n,c] = tab[idx[n], c], blocked over n
    BLK = 2048

    def k_tala(tab_ref, idx_ref, out_ref):
        idx2 = jnp.broadcast_to(idx_ref[:][:, None], (BLK, W))
        out_ref[:] = jnp.sum(
            jnp.take_along_axis(tab_ref[:], idx2, axis=0), axis=-1,
            keepdims=True)

    def f_tala(tab, i, acc):
        idx = randidx(i, acc)
        out = pl.pallas_call(
            k_tala,
            grid=(N // BLK,),
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec((R, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK,), lambda b: (b,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 1), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
        )(tab, idx)
        return out.sum()

    try_bench("pallas take_along_axis rows", f_tala, (table,))

    # B. pallas scalar gather via take_along_axis on flat table transposed:
    # tab_t (W, R) laid out so gather is along LANES?  out[n] = flat[idx[n]]
    # formulated 2D: operand (1, RW) bcast rows? -> per-lane gather along axis1
    flat2 = jnp.asarray(rng.standard_normal((8, R * W // 8)), jnp.float32)

    def k_lane(tab_ref, idx_ref, out_ref):
        # gather along axis 1 with per-row indices: out[s, n] = tab[s, idx[s, n]]
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    def f_lane(tab, i, acc):
        idx = randidx(i, acc, r=R * W // 8).reshape(8, N // 8)
        out = pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct((8, N // 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        return out.sum()

    try_bench("pallas gather axis1 (8,RW/8)", f_lane, (flat2,))

    # C. same but smaller last dim table (8, 4096)
    small2 = jnp.asarray(rng.standard_normal((8, 4096)), jnp.float32)

    def f_lane_small(tab, i, acc):
        idx = randidx(i, acc, r=4096).reshape(8, N // 8)
        out = pl.pallas_call(
            k_lane,
            out_shape=jax.ShapeDtypeStruct((8, N // 8), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
        return out.sum()

    try_bench("pallas gather axis1 (8,4096)", f_lane_small, (small2,))

    # D. gather along axis 0 (sublanes): out[s, n] = tab[idx[s, n], n]
    # table (R', N) with R' = 8 sublanes
    tall = jnp.asarray(rng.standard_normal((8, N)), jnp.float32)

    def k_sub(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    def f_sub(tab, i, acc):
        idx = randidx(i, acc, r=8).reshape(1, N)
        out = pl.pallas_call(
            k_sub,
            out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tall[:, :N], idx)
        return out.sum()

    try_bench("pallas gather axis0 sublane (8,N)", f_sub, (tall,))

    # E. xla take_along_axis equivalents (outside pallas)
    def f_xla_tala(tab, i, acc):
        idx = randidx(i, acc, r=R * W // 8).reshape(8, N // 8)
        return jnp.take_along_axis(tab, idx, axis=1).sum()

    try_bench("xla gather axis1 (8,RW/8)", f_xla_tala, (flat2,))


if __name__ == "__main__":
    main()
