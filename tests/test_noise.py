"""Perlin noise (core/noise.py, reference librender/noise.cpp):
lattice-zero property, range, continuity, and fractal-sum behavior."""
import numpy as np
import jax.numpy as jnp

from mitsubaer_tpu.core import noise


def test_perlin_zero_at_lattice_and_range():
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.integers(-8, 8, (256, 3)), jnp.float32)
    assert np.abs(np.asarray(noise.perlin(lat))).max() < 1e-6
    p = jnp.asarray(rng.uniform(-10, 10, (20000, 3)), jnp.float32)
    v = np.asarray(noise.perlin(p))
    assert np.isfinite(v).all()
    assert np.abs(v).max() <= 1.0 + 1e-4
    assert v.std() > 0.1                 # actually varies
    assert abs(v.mean()) < 0.02          # zero-mean


def test_perlin_continuity():
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.uniform(-5, 5, (5000, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((5000, 3)) * 1e-3, jnp.float32)
    dv = np.asarray(noise.perlin(p + d) - noise.perlin(p))
    step = np.linalg.norm(np.asarray(d), axis=1)
    assert (np.abs(dv) < 10.0 * step + 1e-6).all()  # Lipschitz-ish


def test_fbm_turbulence():
    rng = np.random.default_rng(2)
    p = jnp.asarray(rng.uniform(-4, 4, (8192, 3)), jnp.float32)
    f = np.asarray(noise.fbm(p))
    t = np.asarray(noise.turbulence(p))
    assert np.isfinite(f).all() and np.isfinite(t).all()
    assert np.abs(f).max() <= 1.0 + 1e-4
    assert (t >= 0).all() and t.max() <= 1.0 + 1e-4
    # fbm has more high-frequency content than single-octave perlin
    d = jnp.asarray(np.full((8192, 3), 0.05), jnp.float32)
    var1 = np.asarray(noise.perlin(p + d) - noise.perlin(p)).std()
    var4 = np.asarray(noise.fbm(p + d) - noise.fbm(p)).std()
    assert var4 > var1 * 0.8


def test_noise_texture_eval():
    from mitsubaer_tpu.models import texture as tex_m
    from mitsubaer_tpu.scene.types import TEX_NOISE, empty_textures

    tex = empty_textures()._replace(
        kind=jnp.asarray([TEX_NOISE], jnp.int32),
        color0=jnp.asarray([[1.0, 0.0, 0.0]]),
        color1=jnp.asarray([[0.0, 0.0, 1.0]]))
    rng = np.random.default_rng(3)
    uv = jnp.asarray(rng.uniform(0, 1, (4096, 2)), jnp.float32)
    v = np.asarray(tex_m.eval_texture(tex, jnp.zeros((4096,), jnp.int32),
                                      uv))
    assert np.isfinite(v).all()
    assert v[:, 0].std() > 0.02 and v[:, 2].std() > 0.02
    assert (v >= -1e-4).all() and (v <= 1.0 + 1e-4).all()
