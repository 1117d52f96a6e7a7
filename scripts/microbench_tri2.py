"""Follow-up: gather vs table rows, bf16, optimized brick trilinear, pallas 2D gather."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
N = 1 << 20


def dev(x):
    return jax.block_until_ready(jax.device_put(x))


def run_sync(f, *args):
    return float(f(*args))


def rate(f, args, K_small=4, K_big=24, reps=5):
    run_sync(f, K_small, *args)
    run_sync(f, K_big, *args)
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run_sync(f, K_small, *args)
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_sync(f, K_big, *args)
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (K_big - K_small)


def bench_rows():
    print("== gather rate vs table rows (width 8, f32) ==")
    for rows in [1024, 4096, 16384, 65536, 262144]:
        tbl = dev(rng.standard_normal((rows, 8)).astype(np.float32))
        idx0 = dev(rng.integers(0, rows, N).astype(np.int32))

        @partial(jax.jit, static_argnums=0)
        def g(K, tbl, idx0, rows=rows):
            def body(i, acc):
                idx = (idx0 + i * 1664525 + (acc > 1e30).astype(jnp.int32)) % rows
                return acc + jnp.take(tbl, idx, axis=0)[:, 0].sum()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        dt = rate(g, (tbl, idx0))
        print(f"  rows {rows}: {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} Mrows/s")


def bench_bf16():
    print("== gather width 128: f32 vs bf16 table (4096 rows) ==")
    for dt_ in (np.float32, jnp.bfloat16):
        tbl = dev(jnp.asarray(rng.standard_normal((4096, 128)), dt_))
        idx0 = dev(rng.integers(0, 4096, N).astype(np.int32))

        @partial(jax.jit, static_argnums=0)
        def g(K, tbl, idx0):
            def body(i, acc):
                idx = (idx0 + i * 1664525 + (acc > 1e30).astype(jnp.int32)) % 4096
                return acc + jnp.take(tbl, idx, axis=0)[:, 0].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        d = rate(g, (tbl, idx0))
        print(f"  {dt_}: {d*1e3:.3f} ms -> {N/d/1e6:.1f} Mrows/s")


NZ = NY = NX = 64
grid_np = rng.standard_normal((NZ, NY, NX)).astype(np.float32)

_BX, _BY, _BZ = 8, 4, 4
_UX, _UY, _UZ = 7, 3, 3


def build_bricks(dtype=np.float32):
    ncx, ncy, ncz = NX - 1, NY - 1, NZ - 1
    nbx = -(-ncx // _UX); nby = -(-ncy // _UY); nbz = -(-ncz // _UZ)
    out = np.zeros((nbz, nby, nbx, _BZ, _BY, _BX), dtype)
    for bz in range(nbz):
        for by in range(nby):
            for bx in range(nbx):
                gz = np.minimum(bz * _UZ + np.arange(_BZ), NZ - 1)
                gy = np.minimum(by * _UY + np.arange(_BY), NY - 1)
                gx = np.minimum(bx * _UX + np.arange(_BX), NX - 1)
                out[bz, by, bx] = grid_np[np.ix_(gz, gy, gx)]
    return out.reshape(-1, 128), (nbz, nby, nbx)


bricks_np, NB = build_bricks()


def tri_brick_opt(bricks, p, dtype=jnp.float32):
    """Optimized post-gather: small per-axis weight vectors outer-product'd
    to (N,128) in minimal passes."""
    nbz, nby, nbx = NB
    res = jnp.array([NX, NY, NZ], jnp.float32)
    x = jnp.clip((p + 0.5) * (res - 1.0), 0.0, res - 1.0)
    cell = jnp.minimum(jnp.floor(x), res - 2.0).astype(jnp.int32)
    t = x - cell.astype(jnp.float32)
    cx, cy, cz = cell[..., 0], cell[..., 1], cell[..., 2]
    bx = jnp.minimum(cx // _UX, nbx - 1)
    by = jnp.minimum(cy // _UY, nby - 1)
    bz = jnp.minimum(cz // _UZ, nbz - 1)
    lx = cx - bx * _UX
    ly = cy - by * _UY
    lz = cz - bz * _UZ
    row = jnp.take(bricks, (bz * nby + by) * nbx + bx, axis=0)  # (N,128)

    tx, ty, tz = t[..., 0:1], t[..., 1:2], t[..., 2:3]
    k8 = jnp.arange(_BX)
    k4 = jnp.arange(_BY)
    wx = jnp.where(k8 == lx[:, None], 1 - tx, jnp.where(k8 == lx[:, None] + 1, tx, 0.0))
    wy = jnp.where(k4 == ly[:, None], 1 - ty, jnp.where(k4 == ly[:, None] + 1, ty, 0.0))
    wz = jnp.where(k4 == lz[:, None], 1 - tz, jnp.where(k4 == lz[:, None] + 1, tz, 0.0))
    wzy = (wz[:, :, None] * wy[:, None, :]).reshape(-1, 16)       # (N,16)
    w = (wzy[:, :, None] * wx[:, None, :]).reshape(-1, 128).astype(dtype)  # (N,128)
    return jnp.sum(row * w, axis=-1).astype(jnp.float32)


def bench_brick_opt():
    print("== brick trilinear optimized ==")
    p0 = dev(rng.uniform(-0.45, 0.45, (N, 3)).astype(np.float32))
    for dtype, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        bricks = dev(jnp.asarray(bricks_np, dtype))

        @partial(jax.jit, static_argnums=0)
        def g(K, bricks, p0, dtype=dtype):
            def body(i, carry):
                acc, sh = carry
                v = tri_brick_opt(bricks, p0 * (1.0 - 0.001 * sh), dtype)
                return (acc + v.sum(), sh + 1.0)
            return jax.lax.fori_loop(0, K, body, (jnp.float32(0), jnp.float32(0)))[0]

        dt = rate(g, (bricks, p0))
        print(f"  brick-opt {name}: {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} Mtaps/s")


def bench_pallas_2d():
    print("== pallas 2D gather attempts ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE = 4096
    R = 4096

    tbl = dev(rng.standard_normal((R, 128)).astype(np.float32))
    idx0 = dev(rng.integers(0, R, N).astype(np.int32))

    # attempt 1: out[i, :] = tbl[idx[i], :] via take_along_axis on axis 0
    def kernel1(tbl_ref, idx_ref, out_ref):
        tbl = tbl_ref[:]
        idx = idx_ref[:]                      # (TILE,)
        out_ref[:] = jnp.take_along_axis(
            tbl, jnp.broadcast_to(idx[:, None], (TILE, 128)) if False else
            idx[:, None] * jnp.ones((1, 128), jnp.int32), axis=0)

    @jax.jit
    def g1(tbl, idx):
        out = pl.pallas_call(
            kernel1,
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((R, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(tbl, idx)
        return out[:, 0].sum()

    try:
        v = float(g1(tbl, idx0))
        # verify
        ref = float(np.asarray(jnp.take(tbl, idx0, axis=0))[:, 0].sum())
        t0 = time.perf_counter()
        for _ in range(5):
            v = float(g1(tbl, idx0))
        dt = (time.perf_counter() - t0) / 5
        print(f"  take_along_axis axis0: OK ({v:.1f} vs {ref:.1f}), {dt*1e3:.3f} ms -> {N/dt/1e6:.1f} Mrows/s")
    except Exception as e:
        print(f"  take_along_axis axis0 FAILED: {str(e)[:200]}")


if __name__ == "__main__":
    print(jax.devices())
    bench_rows()
    bench_bf16()
    bench_brick_opt()
    bench_pallas_2d()
