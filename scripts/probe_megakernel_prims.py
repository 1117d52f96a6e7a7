"""Probe every Mosaic primitive the render megakernel needs, in one kernel:
  1. (8,128) <-> (1024,1) relayout reshape
  2. broadcasted_iota + compare -> bf16 one-hot
  3. one-hot matmul gather (1024,R)x(R,W) bf16 -> f32
  4. in-row trilinear weight build + reduce
  5. uint32 hash RNG (mul/xor/shift)
  6. while_loop with scalar any() cond over vector state
  7. SMEM scalar tables + scalar accumulation counters
  8. pl.when chunk skipping with traced count
  9. transcendentals (sin/cos/sqrt/exp/log/arctan2/tan)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LAN = 8, 128
BLK = SUB * LAN
R, W = 768, 512  # brick table (padded rows, 8x8x8 payload)


def _hash_u32(x):
    x ^= x >> 16
    x = x * jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x = x * jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def kernel(tab_ref, seed_ref, out_ref, dens_out_ref, cnt_ref):
    seed = seed_ref[0]

    lane = (
        jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0) * LAN
        + jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1)
    )

    def body(carry):
        it, acc, total = carry
        # 5. RNG
        bits = _hash_u32(lane.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                         + jnp.uint32(it).astype(jnp.uint32) + seed.astype(jnp.uint32))
        # uint32->f32 unsupported in Mosaic: route top 24 bits through int32
        u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
            5.9604644775390625e-08)  # 2^-24

        # 9. transcendentals
        ang = u * 6.2831853
        tr = jnp.sin(ang) + jnp.cos(ang) + jnp.sqrt(u + 0.1) + jnp.exp(-u)
        # atan2/tan are not lowered by Mosaic: use a minimax atan poly + sin/cos
        x = u / (1.0 - u + 1e-6)
        ax = jnp.abs(x)
        inv = ax > 1.0
        z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1.0), ax)
        z2 = z * z
        at = z * (0.9998660 + z2 * (-0.3302995 + z2 * (0.1801410 + z2 * (-0.0851330 + z2 * 0.0208351))))
        at = jnp.where(inv, 1.5707963 - at, at)
        tr = tr + jnp.log(u + 1.0) + at + jnp.sin(u * 0.5) / jnp.cos(u * 0.5)

        # brick index + local coords from a fake position
        idx = (bits % jnp.uint32(729)).astype(jnp.int32)           # (8,128)
        tx = u
        lx = (bits >> 8) % jnp.uint32(7)

        # 1. relayout to rows (direct (8,128)->(BLK,1) shape cast is
        # unsupported; reshape to (1,BLK) then transpose)
        idx_rows = jnp.transpose(idx.reshape(1, BLK))
        # 2. one-hot
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (BLK, R), 1)
        onehot = (iota_r == idx_rows).astype(jnp.bfloat16)
        # 3. gather matmul
        rows = jnp.dot(onehot, tab_ref[:], preferred_element_type=jnp.float32)
        # 4. in-row trilinear-ish: weights along x only (8-wide window)
        k = jax.lax.broadcasted_iota(jnp.int32, (BLK, W), 1) % 8
        lx_rows = jnp.transpose(lx.astype(jnp.int32).reshape(1, BLK))
        tx_rows = jnp.transpose(tx.reshape(1, BLK))
        wgt = jnp.where(k == lx_rows, 1.0 - tx_rows,
                        jnp.where(k == lx_rows + 1, tx_rows, 0.0))
        dens = jnp.sum(rows * wgt, axis=1).reshape(SUB, LAN)

        # 8. chunked when: pretend only first chunks are active
        nact = jnp.sum((u > 0.5).astype(jnp.int32))

        @pl.when(nact > jnp.int32(BLK // 2 - 2000))
        def _():
            cnt_ref[0] += 1

        acc = acc + dens + tr * 1e-6
        total = total + nact
        return it + 1, acc, total

    def cond(carry):
        it, acc, total = carry
        return (it < 8) & (jnp.sum(acc) < 1e30)

    it0 = jnp.int32(0)
    acc0 = jnp.zeros((SUB, LAN), jnp.float32)
    tot0 = jnp.int32(0)
    it, acc, total = jax.lax.while_loop(cond, body, (it0, acc0, tot0))

    out_ref[:] = acc
    dens_out_ref[0] = total
    cnt_ref[1] = it


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal((R, W)), jnp.bfloat16)
    seed = jnp.array([12345], jnp.uint32)

    f = jax.jit(lambda tab, seed: pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((SUB, LAN), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
            jax.ShapeDtypeStruct((2,), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )(tab, seed))

    t0 = time.perf_counter()
    acc, tot, cnt = f(tab, seed)
    acc_np = np.asarray(acc)
    print(f"compile+run: {time.perf_counter()-t0:.1f}s")
    print("acc mean", acc_np.mean(), "total", np.asarray(tot), "cnt", np.asarray(cnt))
    print("finite:", np.isfinite(acc_np).all())

    # timing: 8 iterations of the loop -> per-iteration cost
    t0 = time.perf_counter()
    for i in range(20):
        acc, tot, cnt = f(tab, jnp.array([i], jnp.uint32))
        float(np.asarray(acc).sum())
    dt = (time.perf_counter() - t0) / 20
    print(f"per-call {dt*1e3:.3f} ms -> per loop-iter {dt/8*1e6:.1f} us "
          f"({BLK*8/dt/1e6:.0f} M taps/s uncompacted)")


if __name__ == "__main__":
    main()
