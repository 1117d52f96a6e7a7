"""Round-3 perf: isolate the sort-compacted tracking pass overhead.

Times each structural piece of wavefront.tracking_compact at bench shapes
(n=262144, W=n/4, K=6) so we know where the ~5 ms of non-lookup cost lives:
  pack     full-width (n,C) concatenate of tracking inputs
  sort     lax.sort_key_val + cumsum rank
  gather   (W,C) row gather from the packed table
  lookups  K*W fused density taps (the useful work)
  back     (n,8) gather-back + full-width merge wheres
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mitsubaer_tpu.models import medium as medium_m
from mitsubaer_tpu.scene import presets

res = 512
n = res * res
W = n // 4
K = 6

scene, cfg = presets.volumetric_box(res=res, spp=1, heterogeneous=True,
                                    density_res=64, max_depth=12)
scene = jax.device_put(scene)
bricks = medium_m.DensityBricks(scene.media, dtype=jnp.bfloat16)

key = jax.random.PRNGKey(0)
o = jax.random.uniform(key, (n, 3)) * 2 - 1
d = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
t0a = jax.random.uniform(jax.random.PRNGKey(2), (n,))
tlim = t0a + jax.random.uniform(jax.random.PRNGKey(3), (n,)) * 2
need = jax.random.uniform(jax.random.PRNGKey(4), (n,)) < 0.18
med = jnp.where(need, 0, -1).astype(jnp.int32)
ctr = jnp.zeros((n,), jnp.uint32)
lanes = jnp.arange(n, dtype=jnp.int32)


def timeit(fn, *args, reps=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


@jax.jit
def pack_only(o, d, t0a, tlim, need):
    kind, sa, ss, _, scale = medium_m.params(scene.media, med)
    stc = sa + ss
    stm = jnp.mean(stc, axis=-1)
    maj = jnp.maximum(scene.media.majorant * jnp.max(stc, -1), 1e-6)
    packed = jnp.concatenate([
        o, d, t0a[:, None], tlim[:, None], maj[:, None], stc,
        stm[:, None], ss, scale[:, None]], axis=-1)
    return packed.sum()


@jax.jit
def pack9(o, d, t0a, tlim):
    packed = jnp.concatenate([o, d, t0a[:, None], tlim[:, None],
                              jnp.zeros((n, 1))], axis=-1)
    return packed.sum()


@jax.jit
def sort_only(need):
    k = jnp.where(need, lanes, jnp.int32(2 ** 30))
    _, src = jax.lax.sort_key_val(k, lanes)
    rank = jnp.cumsum(need.astype(jnp.int32)) - 1
    return src[:W].sum() + rank.sum()


@jax.jit
def pack_sort_gather(o, d, t0a, tlim, need):
    kind, sa, ss, _, scale = medium_m.params(scene.media, med)
    stc = sa + ss
    stm = jnp.mean(stc, axis=-1)
    maj = jnp.maximum(scene.media.majorant * jnp.max(stc, -1), 1e-6)
    packed = jnp.concatenate([
        o, d, t0a[:, None], tlim[:, None], maj[:, None], stc,
        stm[:, None], ss, scale[:, None]], axis=-1)
    k = jnp.where(need, lanes, jnp.int32(2 ** 30))
    _, src = jax.lax.sort_key_val(k, lanes)
    rows = jnp.take(packed, src[:W], axis=0)
    return rows.sum()


@jax.jit
def gather_cols(o, d, t0a, tlim, need):
    """Alternative: no pack — per-column gathers at width W."""
    k = jnp.where(need, lanes, jnp.int32(2 ** 30))
    _, src = jax.lax.sort_key_val(k, lanes)
    sw = src[:W]
    og = jnp.take(o, sw, axis=0)
    dg = jnp.take(d, sw, axis=0)
    tg = jnp.take(t0a, sw, axis=0)
    lg = jnp.take(tlim, sw, axis=0)
    mg = jnp.take(med, sw, axis=0)
    kind, sa, ss, _, scale = medium_m.params(scene.media, mg)
    stc = sa + ss
    return og.sum() + dg.sum() + tg.sum() + lg.sum() + stc.sum() + scale.sum()


@jax.jit
def lookups_W(o, d, t0a):
    p = (o[:W][None] + jnp.linspace(0.1, 1.0, K)[:, None, None]
         * d[:W][None])
    return bricks.lookup(p.reshape(K * W, 3)).sum()


@jax.jit
def lookups_n(o, d, t0a):
    p = (o[None] + jnp.linspace(0.1, 1.0, K)[:, None, None] * d[None])
    return bricks.lookup(p.reshape(K * n, 3)).sum()


@jax.jit
def back_only(need, o):
    rank = jnp.cumsum(need.astype(jnp.int32)) - 1
    in_win = need & (rank < W)
    out_rows = jnp.zeros((W, 8), jnp.float32) + o[:W, :1]
    slot = jnp.clip(jnp.where(in_win, rank, 0), 0, W - 1)
    mine = jnp.take(out_rows, slot, axis=0)
    a = jnp.where((in_win & need)[:, None], mine[:, 1:4], o)
    b = jnp.where(in_win, mine[:, 0], t0a)
    return a.sum() + b.sum()


for name, fn, args in [
    ("pack17+params", pack_only, (o, d, t0a, tlim, need)),
    ("pack9", pack9, (o, d, t0a, tlim)),
    ("sort+cumsum", sort_only, (need,)),
    ("pack+sort+gather", pack_sort_gather, (o, d, t0a, tlim, need)),
    ("sort+colgathers", gather_cols, (o, d, t0a, tlim, need)),
    (f"lookups K{K} @W", lookups_W, (o, d, t0a)),
    (f"lookups K{K} @n", lookups_n, (o, d, t0a)),
    ("gatherback+merge", back_only, (need, o)),
]:
    dt = timeit(fn, *args)
    print(f"{name:20s} {dt * 1e3:7.3f} ms", flush=True)
