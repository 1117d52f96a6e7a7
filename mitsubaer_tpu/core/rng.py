"""Counter-based samplers (reference: src/samplers/{independent,ldsampler,
stratified,sobol}.cpp + libcore/random.cpp SFMT).

TPU-native redesign: instead of stateful per-thread SFMT streams we use
*stateless counter-based* hashing — every (seed, pixel, sample_index,
dimension) tuple deterministically produces a float. This makes wavefront
rendering order-independent, replayable, and trivially shardable across a
device mesh (no RNG state to ship, unlike the reference's per-worker Sampler
clones in sched.cpp).

Two modes:
  - INDEPENDENT: PCG-style hash per dimension (replaces independent.cpp).
  - LDS: Owen-scrambled (0,2)-sequence per 2D dimension pair, padded across
    pairs by decorrelating hashes (replaces ldsampler.cpp's
    Larcher-Pillichshammer points; same stratification guarantees per pair).

The Sampler is a tiny pytree (lane ids + dimension counter); drawing numbers
returns (value, new_sampler). All ops are uint32 VPU arithmetic.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

INDEPENDENT = 0
LDS = 1

_TWO_NEG_32 = np.float32(2.3283064365386963e-10)  # 2^-32 (np scalar, not jnp)


def _hash_u32(x: jnp.ndarray) -> jnp.ndarray:
    """lowbias32 finalizer (public-domain integer hash)."""
    x = jnp.asarray(x, jnp.uint32)
    x ^= x >> 16
    x = x * jnp.uint32(0x7FEB352D)
    x ^= x >> 15
    x = x * jnp.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def hash_combine(*xs) -> jnp.ndarray:
    h = jnp.uint32(0x9E3779B9)
    for x in xs:
        h = _hash_u32(jnp.asarray(x, jnp.uint32) + h * jnp.uint32(0x01000193))
    return h


def _reverse_bits(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.asarray(x, jnp.uint32)
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x & jnp.uint32(0xAAAAAAAA)) >> 1)
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x & jnp.uint32(0xCCCCCCCC)) >> 2)
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x & jnp.uint32(0xF0F0F0F0)) >> 4)
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x & jnp.uint32(0xFF00FF00)) >> 8)
    return (x << 16) | (x >> 16)


def _owen_scramble(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine-Karras style nested uniform scramble on reversed bits."""
    x = jnp.asarray(x, jnp.uint32)
    x += seed
    x ^= x * jnp.uint32(0x6C50B47C)
    x ^= x * jnp.uint32(0xB82F1E52)
    x ^= x * jnp.uint32(0xC7AFE638)
    x ^= x * jnp.uint32(0x8D22F6E6)
    return x


def _sobol_2nd_dim(index: jnp.ndarray) -> jnp.ndarray:
    """Second Sobol' dimension via direction-number XOR (32 bits)."""
    index = jnp.asarray(index, jnp.uint32)
    v = jnp.uint32(1 << 31)
    result = jnp.zeros_like(index)
    for i in range(32):
        bit = (index >> jnp.uint32(i)) & jnp.uint32(1)
        result = jnp.where(bit == 1, result ^ v, result)
        v ^= v >> 1
    return result


def _u32_to_float(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(
        x.astype(jnp.float32) * _TWO_NEG_32, jnp.float32(0.99999994)
    )


@jax.tree_util.register_pytree_node_class
class Sampler:
    """Stateless sampler stream. `lane` identifies the pixel/ray, `index` the
    sample number within the pixel, `dim` the next dimension to draw.
    `mode` is static (part of the pytree structure) so jit specializes on it."""

    def __init__(self, lane, index, dim, seed, mode: int = INDEPENDENT):
        self.lane = lane
        self.index = index
        self.dim = dim
        self.seed = seed
        self.mode = mode

    def _replace(self, **kw):
        d = dict(lane=self.lane, index=self.index, dim=self.dim,
                 seed=self.seed, mode=self.mode)
        d.update(kw)
        return Sampler(**d)

    def tree_flatten(self):
        return (self.lane, self.index, self.dim, self.seed), self.mode

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, mode=aux)


def make_sampler(seed, lane, sample_index, mode: int = INDEPENDENT) -> Sampler:
    return Sampler(
        lane=jnp.asarray(lane, jnp.uint32),
        index=jnp.asarray(sample_index, jnp.uint32),
        dim=jnp.zeros_like(jnp.asarray(lane, jnp.uint32)),
        seed=jnp.asarray(seed, jnp.uint32),
        mode=mode,
    )


def _independent_bits(s: Sampler, dim_offset) -> jnp.ndarray:
    return _hash_u32(
        hash_combine(s.seed, s.lane, s.index, s.dim + jnp.uint32(dim_offset))
    )


def next_1d(s: Sampler):
    if s.mode == LDS:
        scramble = hash_combine(s.seed, s.lane, s.dim)
        shuffled = _owen_scramble(_reverse_bits(s.index), hash_combine(scramble, jnp.uint32(0x55)))
        x = _reverse_bits(_owen_scramble(_reverse_bits(shuffled), scramble))
        value = _u32_to_float(x)
    else:
        value = _u32_to_float(_independent_bits(s, 0))
    return value, s._replace(dim=s.dim + jnp.uint32(1))


def next_2d(s: Sampler):
    if s.mode == LDS:
        pair_scramble = hash_combine(s.seed, s.lane, s.dim)
        # Owen-shuffle the sample index per dimension-pair (padded sequence),
        # then draw the (0,2)-sequence point and Owen-scramble each axis.
        # idx = LK(reverse(index)) lives in the bit-reversed domain: it is both
        # the shuffled index's van-der-Corput bits (x axis) and, reversed, the
        # shuffled index itself (fed to the second Sobol' dimension).
        idx = _owen_scramble(_reverse_bits(s.index), hash_combine(pair_scramble, jnp.uint32(0xA5)))
        x_bits = idx
        y_bits = _sobol_2nd_dim(_reverse_bits(idx))
        x = _reverse_bits(_owen_scramble(_reverse_bits(x_bits), hash_combine(pair_scramble, jnp.uint32(1))))
        y = _reverse_bits(_owen_scramble(_reverse_bits(y_bits), hash_combine(pair_scramble, jnp.uint32(2))))
        value = jnp.stack([_u32_to_float(x), _u32_to_float(y)], axis=-1)
    else:
        value = jnp.stack(
            [
                _u32_to_float(_independent_bits(s, 0)),
                _u32_to_float(_independent_bits(s, 1)),
            ],
            axis=-1,
        )
    return value, s._replace(dim=s.dim + jnp.uint32(2))
