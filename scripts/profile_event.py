"""Break down event-pass cost by timing its component ops in isolation
(in-jit loop differencing). Also: event pass at different sppc to expose the
slots-flush loop cost."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.core import rng
from mitsubaer_tpu.core.math import Frame
from mitsubaer_tpu.integrators import wavefront as wf
from mitsubaer_tpu.integrators.volpath import _shape_tables, _is_null_surface
from mitsubaer_tpu.models import bsdf as bsdf_m
from mitsubaer_tpu.models import emitter as emitter_m
from mitsubaer_tpu.models import phase as phase_m
from mitsubaer_tpu.models import sensor as sensor_m
from mitsubaer_tpu.scene import intersect as isect
from mitsubaer_tpu.scene import presets

N = 1 << 18
res, md = 512, 12
scene, cfg = presets.volumetric_box(res=res, spp=16, heterogeneous=True,
                                    density_res=64, max_depth=md)
cfg = cfg._replace(filter="box", engine="wavefront")
scene = jax.device_put(scene)


def bench(make_step, reps=3, k_small=4, k_big=24):
    @partial(jax.jit, static_argnums=(1,))
    def run(x0, k, salt):
        return jax.lax.fori_loop(0, k, lambda i, x: make_step(x, i + salt), x0)

    x0 = jnp.float32(0)
    jax.block_until_ready(run(x0, k_small, jnp.int32(0)))
    jax.block_until_ready(run(x0, k_big, jnp.int32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, k_small, jnp.int32(r)))
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0, k_big, jnp.int32(r)))
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (k_big - k_small)


def randu(i, salt=0):
    base = jnp.arange(N, dtype=jnp.float32)
    u = jnp.sin(base * 12.9898 + i.astype(jnp.float32) * 1.618 + salt) * 43758.5
    return u - jnp.floor(u)


def randv(i):
    v = jnp.stack([randu(i, s) for s in range(3)], -1) * 2 - 1
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def main():
    print(jax.devices())

    def s_isect(x, i):
        o = randv(i) * 0.1
        d = randv(i + 7)
        h = isect.intersect(scene.geo, o, d, jnp.full((N,), 1e-4),
                            jnp.full((N,), isect.INF))
        return x + h.t.sum() + h.ng.sum()

    print(f"intersect(12tri+cube): {bench(s_isect)*1e3:.3f} ms")

    def s_tables(x, i):
        sid = (randu(i) * 6).astype(jnp.int32)
        b, e, mi, mx = _shape_tables(scene, sid)
        nul = _is_null_surface(scene, b)
        return x + (b + e + mi + mx).sum().astype(jnp.float32) + nul.sum()

    print(f"_shape_tables+is_null: {bench(s_tables)*1e3:.3f} ms")

    def s_emitter(x, i):
        p = randv(i)
        ds = emitter_m.sample_direct(scene, p, jnp.stack([randu(i, 1), randu(i, 2)], -1), randu(i, 3))
        return x + ds.value.sum() + ds.pdf.sum()

    print(f"emitter.sample_direct: {bench(s_emitter)*1e3:.3f} ms")

    def s_bsdf(x, i):
        b_idx = (randu(i) * 2).astype(jnp.int32) - 1
        wi = randv(i + 3)
        wo = randv(i + 9)
        f = bsdf_m.eval(scene.bsdfs, b_idx, wi, wo)
        pdf = bsdf_m.pdf(scene.bsdfs, b_idx, wi, wo)
        bs = bsdf_m.sample(scene.bsdfs, b_idx, wi,
                           jnp.stack([randu(i, 4), randu(i, 5)], -1), randu(i, 6))
        return x + f.sum() + pdf.sum() + bs.weight.sum()

    print(f"bsdf eval+pdf+sample: {bench(s_bsdf)*1e3:.3f} ms")

    def s_phase(x, i):
        med = (randu(i) * 1).astype(jnp.int32)
        d1 = randv(i + 3)
        d2 = randv(i + 9)
        f = phase_m.eval(scene.media.phase, med, d1, d2)
        ps = phase_m.sample(scene.media.phase, med, d1,
                            jnp.stack([randu(i, 4), randu(i, 5)], -1))
        return x + f.sum() + ps.weight.sum()

    print(f"phase eval+sample: {bench(s_phase)*1e3:.3f} ms")

    def s_sensor(x, i):
        px = randu(i) * 512
        py = randu(i, 1) * 512
        rays = sensor_m.sample_rays(scene.sensor, px, py, 512, 512,
                                    u_lens=jnp.stack([randu(i, 2), randu(i, 3)], -1))
        return x + rays.o.sum() + rays.d.sum()

    print(f"sensor.sample_rays: {bench(s_sensor)*1e3:.3f} ms")

    def s_sampler(x, i):
        smp = rng.Sampler(lane=jnp.arange(N, dtype=jnp.uint32),
                          index=jnp.full((N,), 3, jnp.uint32),
                          dim=(randu(i) * 4).astype(jnp.uint32),
                          seed=jnp.uint32(7), mode=rng.LDS)
        tot = x
        for _ in range(9):
            u, smp = rng.next_1d(smp)
            tot = tot + u.sum()
        return tot

    print(f"sampler 9x next_1d (LDS): {bench(s_sampler)*1e3:.3f} ms")

    from mitsubaer_tpu.integrators.volpath import get_beam, build_beam_tau, sample_beam_point, beam_transmittance
    from mitsubaer_tpu.models import medium as medium_m
    bricks = medium_m.DensityBricks(scene.media, dtype=jnp.bfloat16)
    beam = get_beam(scene)
    beam_tau = build_beam_tau(scene, beam, bricks)

    def s_beam(x, i):
        p = randv(i)
        y, s, pdf, dist, dyp = sample_beam_point(beam, p, randu(i, 4))
        tr, dens = beam_transmittance(beam, beam_tau, s, with_density=True)
        return x + tr.sum() + dens.sum() + pdf.sum()

    print(f"beam NEE (sample+tau): {bench(s_beam)*1e3:.3f} ms")

    # full event pass at different sppc (slots loop cost)
    for sppc in [4, 16, 32]:
        st, event_pass, tracking_iter, cond, fin = wf.make_engine(
            scene, cfg, sppc, jnp.uint32(0), jnp.uint32(0),
            has_direct=False, any_het=True)

        def setup(s):
            def super_iter(x):
                x = event_pass(x)
                return jax.lax.fori_loop(0, 6, lambda i, y: tracking_iter(y), x)
            return jax.lax.fori_loop(0, 8, lambda i, x: super_iter(x), s)

        @partial(jax.jit, static_argnums=(1,))
        def run(s0, k, salt):
            s = setup(s0._replace(it=s0.it + salt))
            s = jax.lax.fori_loop(0, k, lambda i, x: event_pass(x), s)
            return s.L.sum() + s.n_taps.astype(jnp.float32)

        jax.block_until_ready(run(st, 2, jnp.int32(0)))
        jax.block_until_ready(run(st, 22, jnp.int32(0)))
        ts, tb = [], []
        for r in range(3):
            t0 = time.perf_counter(); jax.block_until_ready(run(st, 2, jnp.int32(r)))
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); jax.block_until_ready(run(st, 22, jnp.int32(r)))
            tb.append(time.perf_counter() - t0)
        d = (min(tb) - min(ts)) / 20
        print(f"event pass sppc={sppc}: {d*1e3:.3f} ms")


if __name__ == "__main__":
    main()
