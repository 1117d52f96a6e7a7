"""Per-op cost inside a Mosaic kernel via in-kernel loop differencing.
Identifies which megakernel piece is pathologically slow."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LAN = 8, 128
BLK = SUB * LAN
R, W = 768, 512


def bench(name, make_body, extra_in=None, k_small=8, k_big=72, reps=3):
    """make_body(it, x, tab) -> new x ((8,128) f32). Measures per-iter cost."""
    def kernel(tab_ref, k_ref, out_ref):
        k = k_ref[0]

        def body(it, x):
            return make_body(it, x, tab_ref)

        out_ref[:] = jax.lax.fori_loop(0, k, body, jnp.zeros((SUB, LAN), jnp.float32))

    tab = jnp.asarray(np.random.default_rng(0).standard_normal((R, W)), jnp.bfloat16)

    @jax.jit
    def run(tab, k):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SUB, LAN), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, k)

    try:
        for k in (k_small, k_big):
            float(np.asarray(run(tab, jnp.array([k], jnp.int32))).sum())
        ts, tb = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(tab, jnp.array([k_small], jnp.int32))).sum())
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(np.asarray(run(tab, jnp.array([k_big], jnp.int32))).sum())
            tb.append(time.perf_counter() - t0)
        d = (min(tb) - min(ts)) / (k_big - k_small)
        print(f"{name}: {d*1e6:.1f} us/iter")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:100]}")


def _hash(x):
    x ^= x >> 16
    x = x * jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x = x * jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def lane_iota():
    return (jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 0) * LAN
            + jax.lax.broadcasted_iota(jnp.int32, (SUB, LAN), 1))


def main():
    print(jax.devices())

    def b_vpu(it, x, tab):  # baseline: ~20 VPU ops
        u = x * 1.0001 + jnp.float32(it)
        for _ in range(5):
            u = u * 0.999 + 0.001
        return u

    bench("20 vpu ops (8,128)", b_vpu)

    def b_hash(it, x, tab):
        bits = _hash(lane_iota().astype(jnp.uint32) + jnp.uint32(it))
        u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(2**-24)
        return x + u

    bench("hash rng draw", b_hash)

    def b_transp(it, x, tab):
        idx = (x.astype(jnp.int32) + it) % R
        rows = jnp.transpose(idx.reshape(1, BLK))   # (BLK,1)
        back = jnp.transpose(rows).reshape(SUB, LAN)
        return x + back.astype(jnp.float32) * 1e-6

    bench("relayout (8,128)<->(1024,1)", b_transp)

    def b_onehot(it, x, tab):
        idx = jnp.transpose(((x.astype(jnp.int32) + it) % R).reshape(1, BLK))
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (BLK, R), 1)
        oh = (iota_r == idx).astype(jnp.bfloat16)
        return x + jnp.sum(oh.astype(jnp.float32)) * 1e-6

    bench("one-hot build (1024,768)", b_onehot)

    def b_matmul(it, x, tab):
        idx = jnp.transpose(((x.astype(jnp.int32) + it) % R).reshape(1, BLK))
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (BLK, R), 1)
        oh = (iota_r == idx).astype(jnp.bfloat16)
        rows = jnp.dot(oh, tab[:], preferred_element_type=jnp.float32)
        return x + rows[:, 0].reshape(SUB, LAN) * 1e-6

    bench("one-hot + matmul (1024,768)x(768,512)", b_matmul)

    def b_matmul_bf16out(it, x, tab):
        idx = jnp.transpose(((x.astype(jnp.int32) + it) % R).reshape(1, BLK))
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (BLK, R), 1)
        oh = (iota_r == idx).astype(jnp.bfloat16)
        rows = jnp.dot(oh, tab[:], preferred_element_type=jnp.float32)
        red = jnp.sum(rows, axis=1)                 # (1024,)
        return x + red.reshape(SUB, LAN) * 1e-6

    bench("matmul + full-row reduce + reshape back", b_matmul_bf16out)

    def b_weights(it, x, tab):
        lx = (x.astype(jnp.int32) + it) % 7
        tx = x * 0.001 % 1.0
        lx_r = jnp.transpose(lx.reshape(1, BLK))
        tx_r = jnp.transpose(tx.reshape(1, BLK))
        k = jax.lax.broadcasted_iota(jnp.int32, (BLK, W), 1) % 8
        w = jnp.where(k == lx_r, 1.0 - tx_r, jnp.where(k == lx_r + 1, tx_r, 0.0))
        return x + jnp.sum(w) * 1e-6

    bench("weight build (1024,512)", b_weights)

    def b_small_matmul(it, x, tab):
        idx = jnp.transpose(((x.astype(jnp.int32) + it) % R).reshape(1, BLK))
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
        oh = (iota_r == (idx % 128)).astype(jnp.bfloat16)
        rows = jnp.dot(oh, tab[:128, :128], preferred_element_type=jnp.float32)
        return x + rows[:, 0].reshape(SUB, LAN) * 1e-6

    bench("small matmul (1024,128)x(128,128)", b_small_matmul)


if __name__ == "__main__":
    main()
