"""Pallas tracking megapass: per-block adaptive-trip-count Woodcock /
ratio tracking with a VMEM-resident voxel table.

The full-width XLA tracking pass costs ~6.5-7.2 ns/lane-slot and serves
~20% active lanes (PERF.md): every measured XLA route to "pay only for
active lanes" is blocked by the flat ~9 ns/row indexed-gather cost. This
kernel restructures the tap so it never gathers:

* **Stochastic trilinear**: each tap picks ONE voxel per axis with
  probability equal to its trilinear weight (corner = floor(x) +
  [u < frac(x)]). For delta/ratio tracking this is *exactly* unbiased —
  every branch's probability times its weight is LINEAR in the sampled
  density S (real: S*sm/maj * ss/sm = S*ss/maj; null:
  (1-S*sm/maj) * (1-S*st/maj)/(1-S*sm/maj) = 1-S*st/maj; ratio factor:
  1-S*st/maj), so marginalizing the independent per-tap jitter
  reproduces the trilinear-density estimator term by term. The
  reference evaluates the full trilinear stencil per tap
  (heterogeneous.cpp:420 via lookupFloat); the one-voxel form is the
  TPU refinement that makes the fetch MXU-shaped.
* **One-hot MXU fetch**: the voxel value is fetched by a (W,R)x(R,B)
  bf16 matmul against the brick table (R bricks of 8x8x8 = W=512
  voxels) followed by a VPU one-hot select over the 512 brick slots.
  Everything stays in the LANE dimension ((rows, B) layout) — no
  sublane relayouts (measured 2.8-3.2 ns/lane-trip on v5e vs 6.5-7.2
  for the XLA slot, scripts/probe_mega_r5.py).
* **Per-block adaptive trips**: the grid runs (8,128)-aligned blocks of
  B lanes; each block loops majorant jumps until its OWN lanes resolve
  (or a trip cap). Blocks over quiet image regions exit immediately, so
  slot cost tracks the block maximum instead of the global maximum —
  the "per-block adaptive trip counts" design from PERF.md Round-5 #1.

Layout contract with the engine (wavefront.py::tracking_mega):
  input rows (24, n) f32:
    0:3  o in voxel coords ((o_world - aabb_min) * inv_h)
    3:6  d * inv_h (voxel-space direction; t stays world-parametric)
    6    t_cur      7  t_lim     8  majorant (world units)
    9    st_mean * scale         10:13 st_color * scale
    13:16 w_real (sigma_s / st_mean)
    16   is_shadow  17 valid     18:24 pad
  plus ctr (1, n) int32 (the per-lane tracking-RNG counter — kept
  integer end to end: small uint32 values bitcast to f32 are denormals
  that TPU vector ops flush to zero, which would silently replay the
  same tap stream every segment).
  output rows (8, n) f32:
    0 t_out  1:4 fac  4 hit  5 resolved  6 taps  7 pad
  plus ctr_out (1, n) int32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 512  # voxels per 8x8x8 brick

_C_IN = 24
_C_OUT = 8


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


def build_table(d):
    """(nz,ny,nx) density -> ((W, R) bf16 table, (nbx,nby,nbz) static).

    Pads each axis up to a multiple of 8 with zeros (zero density is never
    a real collision, so padded voxels are harmless). Table element
    T[j, r] = voxel j of brick r with r = (bz*nby+by)*nbx+bx and
    j = ((zi*8)+yi)*8+xi."""
    nz, ny, nx = d.shape
    pz, py, px = [-(-s // 8) * 8 for s in (nz, ny, nx)]
    d = jnp.pad(d, ((0, pz - nz), (0, py - ny), (0, px - nx)))
    nbz, nby, nbx = pz // 8, py // 8, px // 8
    t = d.reshape(nbz, 8, nby, 8, nbx, 8)
    t = jnp.transpose(t, (0, 2, 4, 1, 3, 5)).reshape(nbz * nby * nbx, W)
    return jnp.transpose(t).astype(jnp.bfloat16), (nbx, nby, nbz)


def _kernel(B, max_trips, res, nb, seed_ref, st_ref, ctr_ref, tab_ref,
            out_ref, ctr_out_ref):
    """One block of B lanes: loop majorant jumps until all resolve."""
    nx, ny, nz = res
    nbx, nby, nbz = nb
    R = nbx * nby * nbz
    o = st_ref[0:3, :]
    d = st_ref[3:6, :]
    tlim = st_ref[7:8, :]
    maj = jnp.maximum(st_ref[8:9, :], 1e-12)
    stm = st_ref[9:10, :]
    stc = st_ref[10:13, :]
    w_real = st_ref[13:16, :]
    is_sh = st_ref[16:17, :] > 0.5
    valid = st_ref[17:18, :] > 0.5
    ctr0 = ctr_ref[0:1, :].astype(jnp.uint32)
    seed = seed_ref[0]
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
            + B * pl.program_id(0)).astype(jnp.uint32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    resx = jnp.float32(nx - 1)
    resy = jnp.float32(ny - 1)
    resz = jnp.float32(nz - 1)

    def cond(carry):
        trips, t, fac, livef, hitf, taps = carry
        return (trips < max_trips) & (jnp.max(livef) > 0.5)

    def body(carry):
        trips, t, fac, livef, hitf, taps = carry
        live = livef > 0.5
        ctr = ctr0 + jnp.uint32(5) * taps.astype(jnp.int32).astype(jnp.uint32)
        b0 = _hash((lane ^ jnp.uint32(0x9E3779B9))
                   + ctr * jnp.uint32(0x85EBCA6B) + seed)
        b1 = _hash(b0 + jnp.uint32(0x68E31DA4))
        b2 = _hash(b1 + jnp.uint32(0xB5297A4D))
        b3 = _hash(b2 + jnp.uint32(0x1B56C4E9))
        b4 = _hash(b3 + jnp.uint32(0x7F4A7C15))

        t_new = t - jnp.log(jnp.maximum(1.0 - _unif(b0), 1e-12)) / maj
        esc = t_new >= tlim
        p = o + t_new * d                     # (3,B) voxel coords
        px_ = p[0:1, :]
        py_ = p[1:2, :]
        pz_ = p[2:3, :]
        inside = ((px_ >= 0.0) & (px_ <= resx) & (py_ >= 0.0) & (py_ <= resy)
                  & (pz_ >= 0.0) & (pz_ <= resz))
        px_ = jnp.clip(px_, 0.0, resx)
        py_ = jnp.clip(py_, 0.0, resy)
        pz_ = jnp.clip(pz_, 0.0, resz)

        def corner(v, u, hi):
            base = jnp.floor(v)
            c = base + (u < v - base).astype(jnp.float32)
            return jnp.minimum(c, hi).astype(jnp.int32)

        cx = corner(px_, _unif(b1), resx)
        cy = corner(py_, _unif(b2), resy)
        cz = corner(pz_, _unif(b3), resz)
        r_idx = ((cz >> 3) * nby + (cy >> 3)) * nbx + (cx >> 3)   # (1,B)
        j_idx = (((cz & 7) * 8) + (cy & 7)) * 8 + (cx & 7)        # (1,B)

        oh_r = (iota_r == r_idx).astype(jnp.float32).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            tab_ref[:], oh_r,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # (W,B)
        oh_j = (iota_j == j_idx).astype(jnp.float32)
        S = jnp.sum(rows * oh_j, axis=0, keepdims=True)           # (1,B)
        S = jnp.where(inside, S, 0.0)

        p_real = S * stm / maj
        real = (_unif(b4) < p_real) & ~esc & ~is_sh & live
        factor = jnp.maximum(1.0 - S * stc / maj, 0.0)            # (3,B)
        w_null = factor / jnp.maximum(1.0 - p_real, 1e-12)
        nullc = live & ~esc & ~is_sh & ~real
        shc = live & ~esc & is_sh
        fac = jnp.where(real, fac * w_real,
                        jnp.where(nullc, fac * w_null,
                                  jnp.where(shc, fac * factor, fac)))
        t = jnp.where(live, jnp.minimum(t_new, tlim), t)
        hitf = jnp.where(real, 1.0, hitf)
        taps = taps + jnp.where(live, 1.0, 0.0)
        livef = jnp.where(live & (esc | real), 0.0, livef)
        return trips + 1, t, fac, livef, hitf, taps

    t0 = st_ref[6:7, :]
    fac0 = jnp.ones((3, B), jnp.float32)
    live0 = valid.astype(jnp.float32)
    hit0 = jnp.zeros((1, B), jnp.float32)
    taps0 = jnp.zeros((1, B), jnp.float32)
    trips, t, fac, livef, hitf, taps = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, fac0, live0, hit0, taps0))

    resolved = valid & (livef <= 0.5)
    out_ref[0:1, :] = t
    out_ref[1:4, :] = fac
    out_ref[4:5, :] = hitf
    out_ref[5:6, :] = resolved.astype(jnp.float32)
    out_ref[6:7, :] = taps
    out_ref[7:8, :] = jnp.zeros((1, B), jnp.float32)
    ctr_out_ref[0:1, :] = (
        ctr0 + jnp.uint32(5) * taps.astype(jnp.int32).astype(jnp.uint32)
    ).astype(jnp.int32)


class MegaTable:
    """Per-render-pass voxel table + static grid metadata for the kernel."""

    def __init__(self, media):
        d = media.density.data
        if d.ndim == 4:
            d = d[..., 0]
        nz, ny, nx = d.shape
        self.res = (nx, ny, nz)
        self.table, self.nb = build_table(d)
        self.aabb_min = media.density.aabb_min
        extent = media.density.aabb_max - media.density.aabb_min
        res_v = jnp.array([nx, ny, nz], jnp.float32)
        self.inv_h = jnp.maximum(res_v - 1.0, 1.0) / jnp.maximum(extent, 1e-30)

    @staticmethod
    def fits(media, max_voxels=1 << 21):
        d = media.density.data
        shape = d.shape[:3]
        padded = 1
        for s in shape:
            padded *= -(-s // 8) * 8
        return padded <= max_voxels


@functools.partial(jax.jit, static_argnames=("B", "max_trips", "res", "nb",
                                             "interpret"))
def run(rows, ctr, table, seed, B=1024, max_trips=32, res=(64, 64, 64),
        nb=(8, 8, 8), interpret=False):
    """rows (24, n) f32 + ctr (1, n) int32, table (W, R) bf16, seed uint32
    scalar -> ((8, n) f32 outcome rows, (1, n) int32 ctr). Pads n up to a
    multiple of B."""
    n = rows.shape[1]
    npad = -(-n // B) * B
    if npad != n:
        rows = jnp.pad(rows, ((0, 0), (0, npad - n)))
        ctr = jnp.pad(ctr, ((0, 0), (0, npad - n)))
    kern = functools.partial(_kernel, B, max_trips, res, nb)
    out, ctr_out = pl.pallas_call(
        kern,
        grid=(npad // B,),
        out_shape=(
            jax.ShapeDtypeStruct((_C_OUT, npad), jnp.float32),
            jax.ShapeDtypeStruct((1, npad), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_C_IN, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_C_OUT, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(jnp.reshape(seed.astype(jnp.uint32), (1,)), rows, ctr, table)
    return out[:, :n], ctr_out[:, :n]
