"""Hanrahan-Krueger thin-slab BSDF (src/bsdfs/hk.cpp analogue):
reciprocity, energy bound, and sample/eval/pdf consistency — E[weight]
(which includes the delta straight-through) must equal the quadrature of
f cos over the sphere plus the unscattered transmittance."""
import numpy as np
import jax.numpy as jnp

from mitsubaer_tpu.core import rng
from mitsubaer_tpu.models import bsdf as bsdf_m
from mitsubaer_tpu.scene.build import SceneBuilder
from mitsubaer_tpu.scene import types as T


def _table(sig_s=(0.8, 0.8, 0.8), sig_a=(0.1, 0.1, 0.1), d=1.0, g=0.3):
    b = SceneBuilder()
    b.add_bsdf(kind=T.BSDF_HK, specular_r=sig_s, specular_t=sig_a,
               alpha=d, mix_w=g)
    b.add_sphere((0, 0, 0), 1.0, bsdf=0)
    from mitsubaer_tpu.core import transform as tf

    b.set_perspective_sensor(to_world=tf.look_at([0, 0, -3], [0, 0, 0],
                                                 [0, 1, 0]), fov_deg=40)
    return b.build().bsdfs


def _wi(n, seed=0):
    r = np.random.default_rng(seed)
    w = r.normal(size=(n, 3)).astype(np.float32)
    w /= np.linalg.norm(w, axis=-1, keepdims=True)
    w[:, 2] = np.abs(w[:, 2]) + 0.05
    return w / np.linalg.norm(w, axis=-1, keepdims=True)


def test_hk_reciprocity_and_positivity():
    bs = _table()
    n = 128
    wi = _wi(n, 0)
    wo = _wi(n, 1)
    wo[::2, 2] *= -1  # half transmission configs
    idx = jnp.zeros((n,), jnp.int32)
    f_io = np.asarray(bsdf_m.eval(bs, idx, jnp.asarray(wi), jnp.asarray(wo)))
    f_oi = np.asarray(bsdf_m.eval(bs, idx, jnp.asarray(wo), jnp.asarray(wi)))
    assert (f_io >= 0).all()
    # f = eval/|cos(wo)| must be symmetric
    r_io = f_io / np.abs(wo[:, 2:3])
    r_oi = f_oi / np.abs(wi[:, 2:3])
    ok = r_io > 1e-6
    assert np.abs(r_io - r_oi)[ok].max() / r_io[ok].max() < 1e-3


def test_hk_sample_matches_quadrature():
    bs = _table()
    n = 1
    wi = jnp.asarray([[0.3, 0.2, 0.93]] )
    wi = wi / jnp.linalg.norm(wi)
    idx = jnp.zeros((n,), jnp.int32)

    # quadrature of eval over the sphere (product Gauss grid)
    NT, NP = 128, 128
    th = (np.arange(NT) + 0.5) * np.pi / NT
    ph = (np.arange(NP) + 0.5) * 2 * np.pi / NP
    TH, PH = np.meshgrid(th, ph, indexing="ij")
    wo = np.stack([np.sin(TH) * np.cos(PH), np.sin(TH) * np.sin(PH),
                   np.cos(TH)], -1).reshape(-1, 3).astype(np.float32)
    dw = (np.pi / NT) * (2 * np.pi / NP) * np.sin(TH).reshape(-1)
    f = np.asarray(bsdf_m.eval(bs, jnp.zeros((wo.shape[0],), jnp.int32),
                               jnp.broadcast_to(wi, (wo.shape[0], 3)),
                               jnp.asarray(wo)))
    quad = (f * dw[:, None]).sum(0)
    # + unscattered delta transmittance
    st = 0.9
    tau = st * 1.0
    quad_total = quad + np.exp(-tau / float(wi[0, 2]))

    # MC through sample()
    M = 20000
    lane = jnp.arange(M, dtype=jnp.uint32)
    smp = rng.make_sampler(jnp.uint32(7), lane, jnp.zeros((M,), jnp.uint32))
    u2, smp = rng.next_2d(smp)
    u1, smp = rng.next_1d(smp)
    s = bsdf_m.sample(bs, jnp.zeros((M,), jnp.int32),
                      jnp.broadcast_to(wi, (M, 3)), u2, u1)
    mc = np.asarray(s.weight).mean(0)
    assert np.abs(mc - quad_total).max() / quad_total.max() < 0.05, (
        mc, quad_total)
    # energy conservation
    assert (quad_total < 1.0 + 1e-3).all()
