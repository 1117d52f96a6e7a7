"""r5 megapass probe: in-Pallas tracking trip cost, transposed orientation.

Design under test (see PERF.md Round-5 #1): per-lane state lives in the
LANE dimension ((C, B) rows); the density tap is STOCHASTIC-trilinear
(one voxel per tap — unbiased for delta/ratio tracking because branch
probability x branch weight is linear in the density estimate), fetched
via two one-hot contractions against a VMEM-resident (W=512, R=512)
voxel table: an MXU matmul over brick rows and a VPU mult+reduce voxel
select. No (B,1) relayouts anywhere (the r4 probe's 3.4 ms/trip was
relayout-bound).

Measures ns/lane-trip for B in {256, 512, 1024} and validates fetched
voxel values + trip semantics against numpy.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 64^3 voxel grid as (R=512 bricks of 8x8x8, W=512 voxels/brick)
GR = 64            # grid res per axis
NBA = GR // 8      # bricks per axis = 8
R = NBA ** 3       # 512 brick rows
W = 512            # voxels per brick


def build_table(d):
    """d (64,64,64) -> T (W, R): T[j, r] = voxel j of brick r (transposed
    for the (W,R)x(R,B) matmul)."""
    t = d.reshape(NBA, 8, NBA, 8, NBA, 8)           # bz z by y bx x
    t = np.transpose(t, (0, 2, 4, 1, 3, 5))         # bz by bx z y x
    t = t.reshape(R, W)
    return np.ascontiguousarray(t.T)                # (W, R)


def _hash(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _unif(bits):
    # top 24 bits -> [0,1); route through int32 (Mosaic: no uint32->f32)
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) \
        * jnp.float32(5.9604644775390625e-08)


def make_kernel(B, n_trips, amin, inv_h):
    """Kernel: per block, n_trips Woodcock jumps with stochastic-trilinear
    taps. State rows (C,B): 0:3 o, 3:6 d, 6 t, 7 tlim, 8 maj, 9 seedf,
    10 live."""
    amin = np.float32(amin)
    inv_h = np.float32(inv_h)

    def kernel(st_ref, tab_ref, out_ref):
        o = st_ref[0:3, :]
        d = st_ref[3:6, :]
        tlim = st_ref[7:8, :]
        maj = st_ref[8:9, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1).astype(jnp.uint32) \
            + jnp.uint32(B) * jnp.uint32(pl.program_id(0))
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
        iota_j = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)

        def body(k, carry):
            t, acc, livef = carry
            live = livef > 0.5
            bits0 = _hash(lane * jnp.uint32(0x9E3779B9)
                          + k.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
            bits1 = _hash(bits0 + jnp.uint32(0x68E31DA4))
            bits2 = _hash(bits1 + jnp.uint32(0xB5297A4D))
            bits3 = _hash(bits2 + jnp.uint32(0x1B56C4E9))
            bits4 = _hash(bits3 + jnp.uint32(0x7F4A7C15))
            u1 = _unif(bits0)
            t = t - jnp.log(1.0 - u1) / maj
            esc = t >= tlim
            p = o + t * d                      # (3,B)
            xn = (p - amin) * inv_h            # voxel coords [0, 63]
            xn = jnp.clip(xn, 0.0, jnp.float32(GR - 1))
            base = jnp.floor(xn)
            fr = xn - base
            uj = jnp.concatenate([_unif(bits1), _unif(bits2), _unif(bits3)],
                                 axis=0)       # (3,B)
            c = (base + (uj < fr).astype(jnp.float32)).astype(jnp.int32)
            c = jnp.minimum(c, GR - 1)
            cx = c[0:1, :]
            cy = c[1:2, :]
            cz = c[2:3, :]
            r_idx = ((cz >> 3) * NBA + (cy >> 3)) * NBA + (cx >> 3)  # (1,B)
            j_idx = (((cz & 7) * 8) + (cy & 7)) * 8 + (cx & 7)       # (1,B)

            oh_r = (iota_r == r_idx).astype(jnp.float32).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                tab_ref[:], oh_r,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (W,B)
            oh_j = (iota_j == j_idx).astype(jnp.float32)
            dens = jnp.sum(rows * oh_j, axis=0, keepdims=True)  # (1,B)

            u2 = _unif(bits4)
            real = (u2 * maj < dens) & ~esc
            acc = acc + jnp.where(live, dens, 0.0)
            live = live & ~esc & ~real
            return t, acc, live.astype(jnp.float32)

        t0 = st_ref[6:7, :]
        acc0 = st_ref[11:12, :]
        live0 = st_ref[10:11, :]
        t, acc, livef = jax.lax.fori_loop(0, n_trips, body, (t0, acc0, live0))
        out_ref[0:6, :] = st_ref[0:6, :]
        out_ref[6:7, :] = t
        out_ref[7:10, :] = st_ref[7:10, :]
        out_ref[10:11, :] = livef
        out_ref[11:12, :] = acc
        out_ref[12:16, :] = st_ref[12:16, :]

    return kernel


def run(B, N, n_trips, st, tab, adaptive=False):
    kern = make_kernel(B, n_trips, 0.0, (GR - 1) / 2.0)  # box [0,2]
    f = jax.jit(lambda st, tab: pl.pallas_call(
        kern,
        grid=(N // B,),
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.float32),
        in_specs=[
            pl.BlockSpec((16, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(st, tab))
    out = f(st, tab)
    _ = float(np.asarray(out).sum())   # warm + force real execution
    # chain INSIDE one jit: device-side per-call cost, no tunnel dispatch
    chain = 10
    call = f.__wrapped__ if hasattr(f, "__wrapped__") else f

    @jax.jit
    def g(st, tab):
        return jax.lax.fori_loop(
            0, chain, lambda i, s: call(s, tab), st)

    _ = float(np.asarray(g(st, tab)[6]).sum())
    t0 = time.perf_counter()
    r = g(st, tab)
    _ = float(np.asarray(r[6]).sum())
    dt = (time.perf_counter() - t0) / chain
    return out, dt


def main():
    print(jax.devices())
    rng = np.random.default_rng(0)
    d = rng.random((GR, GR, GR)).astype(np.float32)
    tab = jnp.asarray(build_table(d), jnp.bfloat16)

    N = 1 << 18
    st = np.zeros((16, N), np.float32)
    st[0:3] = rng.random((3, N)) * 2.0          # o in box [0,2]
    dirs = rng.standard_normal((3, N))
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    st[3:6] = dirs
    st[6] = 0.0                                  # t
    st[7] = rng.random(N) * 0.5 + 0.2            # tlim
    st[8] = 8.0                                  # majorant
    st[10] = 1.0                                 # live
    stj = jnp.asarray(st)

    # fixed-cost isolation: trips=0 (no loop) and smaller N
    for NN in (65536, 262144):
        for n_trips in (0, 8):
            out, dt = run(1024, NN, n_trips, stj[:, :NN], tab)
            print(f"N={NN:7d} trips={n_trips}: {dt*1e3:7.3f} ms")

    for B in (512, 1024):
        prev = None
        for n_trips in (8, 16, 32, 64):
            try:
                out, dt = run(B, N, n_trips, stj, tab)
                ns = dt / (N * n_trips) * 1e9
                marg = ""
                if prev is not None:
                    pt, pd = prev
                    marg = (f"  marginal {(dt-pd)/(n_trips-pt)/N*1e9:6.2f} "
                            f"ns/lane-trip")
                prev = (n_trips, dt)
                o = np.asarray(out)
                print(f"B={B:5d} trips={n_trips:3d}: {dt*1e3:7.3f} ms "
                      f"-> {ns:6.2f} ns/lane-trip{marg}  "
                      f"(live {o[2].mean():.2f})")
            except Exception as e:
                print(f"B={B} trips={n_trips}: FAIL {type(e).__name__}: "
                      f"{str(e)[:300]}")

    # correctness: single trip, fixed rng -> compare voxel fetch vs numpy
    B = 512
    kern = make_kernel(B, 1, 0.0, (GR - 1) / 2.0)
    f = jax.jit(lambda st, tab: pl.pallas_call(
        kern,
        grid=(N // B,),
        out_shape=jax.ShapeDtypeStruct((16, N), jnp.float32),
        in_specs=[
            pl.BlockSpec((16, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(st, tab))
    o16 = np.asarray(jax.block_until_ready(f(stj, tab)))
    out = np.stack([o16[6], o16[11], o16[10]])

    # numpy replay of one trip
    def h_np(x):
        x = x.astype(np.uint64)
        M = np.uint64(0xFFFFFFFF)
        x ^= x >> 16
        x = (x * 0x7FEB352D) & M
        x ^= x >> 15
        x = (x * 0x846CA68B) & M
        x ^= x >> 16
        return x.astype(np.uint32)

    M32 = np.uint64(0xFFFFFFFF)
    lane = np.arange(N, dtype=np.uint64)
    b0 = h_np((lane * 0x9E3779B9) & M32)
    b1 = h_np((b0.astype(np.uint64) + 0x68E31DA4) & M32)
    b2 = h_np((b1.astype(np.uint64) + 0xB5297A4D) & M32)
    b3 = h_np((b2.astype(np.uint64) + 0x1B56C4E9) & M32)
    b4 = h_np((b3.astype(np.uint64) + 0x7F4A7C15) & M32)

    def u_np(b):
        return (b >> 8).astype(np.float32) * np.float32(2**-24)

    t = st[6] - np.log1p(-u_np(b0)) / st[8]
    esc = t >= st[7]
    p = st[0:3] + t * st[3:6]
    xn = np.clip(p * ((GR - 1) / 2.0), 0.0, GR - 1)
    base = np.floor(xn)
    fr = xn - base
    uj = np.stack([u_np(b1), u_np(b2), u_np(b3)])
    c = np.minimum(base + (uj < fr), GR - 1).astype(np.int64)
    dens_ref = d[c[2], c[1], c[0]].astype(np.float32)  # bf16 table rounding
    dens_bf16 = np.asarray(jnp.asarray(dens_ref, jnp.bfloat16), np.float32)
    acc = out[1]
    err = np.abs(acc - dens_bf16)
    print(f"1-trip voxel fetch: max err vs numpy (bf16 table) = "
          f"{err.max():.3e}  (mean dens {dens_bf16.mean():.4f})")
    real = (u_np(b4) * st[8] < dens_bf16) & ~esc
    live_ref = (~esc) & (~real)
    print(f"live agreement: {(out[2].astype(bool) == live_ref).mean():.4f}  "
          f"t agreement: {np.abs(out[0] - t).max():.2e}")


if __name__ == "__main__":
    main()
