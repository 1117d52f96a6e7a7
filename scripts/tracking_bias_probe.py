"""Isolate tracking-estimator bias: compare (a) loop-engine ratio tracking,
(b) wavefront-engine tracking_iter shadow path, (c) loop Woodcock escape
estimate against deterministic quadrature transmittance on fixed segments
through the Gaussian-blob density.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.core import rng
from mitsubaer_tpu.integrators import wavefront as wf_m
from mitsubaer_tpu.models import medium as medium_m
from mitsubaer_tpu.scene import presets

R = int(os.environ.get("REPS", 64))       # RNG replicates
NSEG = 128                                 # distinct segments


def main():
    scene, cfg = presets.volumetric_box(
        res=12, spp=1, max_depth=2, heterogeneous=True, density_res=32,
        emitter_kind="point", filter="box")  # 144 lanes >= NSEG
    media = scene.media
    bricks32 = medium_m.DensityBricks(media)
    sa = media.sigma_a[0]
    ss = media.sigma_s[0]
    st = sa + ss

    # segments: x-chords through the blob at lattice (y, z)
    ys = np.linspace(-0.9, 0.9, 16)
    zs = np.linspace(-0.9, 0.9, 8)
    Y, Z = np.meshgrid(ys, zs, indexing="ij")
    o = np.stack([np.full(NSEG, -0.99), Y.ravel(), Z.ravel()], -1).astype(np.float32)
    d = np.tile(np.array([[1.0, 0, 0]], np.float32), (NSEG, 1))
    t_max = np.full((NSEG,), 1.98, np.float32)
    o, d, t_max = jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max)

    # quadrature truth
    NQ = 4096
    k = (jnp.arange(NQ) + 0.5) / NQ
    pts = o[:, None, :] + (k[None, :] * t_max[:, None])[..., None] * d[:, None, :]
    dens = bricks32.lookup(pts.reshape(-1, 3)).reshape(NSEG, NQ)
    tau = jnp.sum(dens, axis=1) * (t_max / NQ)
    T_true = np.asarray(jnp.exp(-tau[:, None] * st[None, :]))
    print("T_true mean:", T_true.mean(axis=0))

    # (a) loop ratio tracking
    @jax.jit
    def loop_tr(seed):
        smp = rng.make_sampler(seed, jnp.arange(NSEG, dtype=jnp.uint32), 0)
        tr, _ = medium_m.transmittance_ratio_tracking(
            media, jnp.tile(sa, (NSEG, 1)), jnp.tile(ss, (NSEG, 1)),
            jnp.ones((NSEG,)), o, d, t_max, smp,
            jnp.ones((NSEG,), bool), bricks=bricks32)
        return tr

    acc = np.zeros((NSEG, 3))
    for s in range(R):
        acc += np.asarray(loop_tr(jnp.uint32(1000 + s)))
    est = acc / R
    rel = (est.mean(axis=0) - T_true.mean(axis=0)) / T_true.mean(axis=0)
    print("loop ratio-tracking  rel bias per channel:", np.round(rel, 5))

    # (b) wavefront tracking_iter shadow path
    sppc = 1

    @jax.jit
    def wf_tr(seed):
        st0, event_pass, tracking_iter, cond, finalize = wf_m.make_engine(
            scene, cfg._replace(engine="wavefront"), sppc, seed,
            jnp.uint32(0), n_lanes=None, has_direct=True, any_het=True)
        n = st0.o.shape[0]
        # plant NSEG shadow rays in the first NSEG lanes
        pad = n - NSEG
        mk = lambda a, fill: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0)
        s = st0._replace(
            sh_active=mk(jnp.ones((NSEG,), bool), False),
            sh_need_isect=jnp.zeros((n,), bool),
            sh_o=mk(o, 0.0), sh_d=mk(d, 1.0),
            sh_seg=mk(t_max, 0.0), sh_t=jnp.zeros((n,)),
            sh_med=jnp.zeros((n,), jnp.int32),
            sh_tr=jnp.ones((n, 3)),
            path_alive=jnp.zeros((n,), bool),
        )
        def body(i, s):
            return tracking_iter(s)
        s = jax.lax.fori_loop(0, 400, body, s)
        return s.sh_tr[:NSEG]

    acc = np.zeros((NSEG, 3))
    for s in range(R):
        acc += np.asarray(wf_tr(jnp.uint32(7000 + s * 131)))
    est = acc / R
    rel = (est.mean(axis=0) - T_true.mean(axis=0)) / T_true.mean(axis=0)
    print("wavefront tracking   rel bias per channel:", np.round(rel, 5))

    # (c) loop Woodcock escape probability (weighted): E[w * 1{escape}] = Tr
    @jax.jit
    def wood_escape(seed):
        smp = rng.make_sampler(seed, jnp.arange(NSEG, dtype=jnp.uint32), 0)
        hit, dist, w, p, smp, _ = medium_m.sample_distance_woodcock(
            media, jnp.tile(sa, (NSEG, 1)), jnp.tile(ss, (NSEG, 1)),
            jnp.ones((NSEG,)), o, d, t_max, smp, jnp.ones((NSEG,), bool),
            bricks=bricks32)
        return jnp.where(hit[:, None], 0.0, w)

    acc = np.zeros((NSEG, 3))
    for s in range(R):
        acc += np.asarray(wood_escape(jnp.uint32(3000 + s * 17)))
    est = acc / R
    rel = (est.mean(axis=0) - T_true.mean(axis=0)) / T_true.mean(axis=0)
    print("loop woodcock escape rel bias per channel:", np.round(rel, 5))


if __name__ == "__main__":
    main()
