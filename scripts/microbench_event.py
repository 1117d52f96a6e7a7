"""Time event-pass components at wavefront width on TPU (in-jit repetition)."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
N = 1 << 18


def dev(x):
    return jax.block_until_ready(jax.device_put(x))


def rate(f, args, K_small=4, K_big=24, reps=4):
    def run(K):
        return float(f(K, *args))
    run(K_small); run(K_big)
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run(K_small); ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(K_big); tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (K_big - K_small)


from mitsubaer_tpu.scene import presets, intersect as isect
from mitsubaer_tpu.models import phase as phase_m, bsdf as bsdf_m, sensor as sensor_m, medium as medium_m
from mitsubaer_tpu.integrators import volpath as vp
from mitsubaer_tpu.core import rng as rng_m

scene, cfg = presets.volumetric_box(res=512, spp=1, heterogeneous=True, density_res=64)
scene = jax.device_put(scene)
media = scene.media

o0 = dev(rng.uniform(-0.9, 0.9, (N, 3)).astype(np.float32))
d_ = rng.standard_normal((N, 3)); d_ /= np.linalg.norm(d_, axis=1, keepdims=True)
d0 = dev(d_.astype(np.float32))
u2 = dev(rng.random((N, 2)).astype(np.float32))
u1 = dev(rng.random(N).astype(np.float32))
med0 = dev(np.zeros(N, np.int32))
bidx = dev(np.zeros(N, np.int32))


def bench(name, fn, *args, K_small=4, K_big=24):
    @partial(jax.jit, static_argnums=0)
    def g(K, *a):
        def body(i, carry):
            acc, sh = carry
            out = fn(sh, *a)
            return (acc + out, sh + 1.0)
        return jax.lax.fori_loop(0, K, body, (jnp.float32(0), jnp.float32(0)))[0]
    dt = rate(g, args, K_small, K_big)
    print(f"  {name}: {dt*1e3:.3f} ms @ {N}")


print(jax.devices())

bench("intersect(12tri+aabb)", lambda sh, o, d: (
    isect.intersect(scene.geo, o + sh * 1e-4, d, jnp.zeros(N), jnp.full(N, isect.INF)).t.clip(0, 10).sum()
    + isect.ray_aabb(o, d, scene.aabb_min, scene.aabb_max)[1].clip(0, 10).sum()), o0, d0)

bench("phase sample+2eval", lambda sh, d, u2: (
    phase_m.sample(media.phase, med0, d, (u2 + sh * 1e-3) % 1.0).wo.sum()
    + phase_m.eval(media.phase, med0, d, -d).sum()
    + phase_m.eval(media.phase, med0, d, d).sum()), d0, u2)

def _bsdf(sh, u2, u1):
    bs = bsdf_m.sample(scene.bsdfs, bidx, jnp.stack([u1, u1, u1], -1), (u2 + sh*1e-3) % 1.0, u1)
    f = bsdf_m.eval(scene.bsdfs, bidx, bs.wo, bs.wo)
    p = bsdf_m.pdf(scene.bsdfs, bidx, bs.wo, bs.wo)
    return bs.wo.sum() + f.sum() + p.sum()
bench("bsdf sample+eval+pdf", _bsdf, u2, u1)

beam = vp.get_beam(scene)
bricks = medium_m.DensityBricks(media)
tau = vp.build_beam_tau(scene, beam, bricks)
def _beam(sh, o, u1):
    y, s, pdf, dist, dyp = vp.sample_beam_point(beam, o + sh * 1e-4, (u1 + sh*1e-3) % 1.0)
    tr = vp.beam_transmittance(beam, tau, s)
    return y.sum() + tr.sum() + pdf.clip(0, 10).sum()
bench("beam point+tau", _beam, o0, u1)

bench("brick lookup", lambda sh, o: bricks.lookup(o * (1 - sh * 1e-4)).sum(), o0)

def _rays(sh, u2):
    px = (u2[:, 0] * 512 + sh) % 512
    py = u2[:, 1] * 512
    r = sensor_m.sample_rays(scene.sensor, px, py, 512, 512, u_lens=u2)
    return r.o.sum() + r.d.sum()
bench("sensor rays", _rays, u2)

def _draws(sh, u1):
    smp = rng_m.make_sampler(jnp.uint32(3), jnp.arange(N, dtype=jnp.uint32),
                             (u1 * 100 + sh).astype(jnp.uint32))
    tot = jnp.float32(0)
    for _ in range(6):
        v, smp = rng_m.next_1d(smp)
        tot += v.sum()
    for _ in range(3):
        v, smp = rng_m.next_2d(smp)
        tot += v.sum()
    return tot
bench("12 sampler dims", _draws, u1)

def _slots(sh, u1):
    slots = jnp.zeros((16, N, 3))
    L = jnp.stack([u1, u1, u1], -1) + sh
    sidx = (u1 * 16).astype(jnp.int32)
    flush = u1 > 0.5
    for j in range(16):
        slots = slots.at[j].add(jnp.where((flush & (sidx == j))[..., None], L, 0.0))
    return slots.sum()
bench("16-slot flush", _slots, u1, K_small=2, K_big=10)
