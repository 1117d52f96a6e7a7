import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.core import rng


class TestIndependent:
    def test_uniform_moments(self):
        s = rng.make_sampler(1, jnp.arange(100000), 0)
        u, s = rng.next_1d(s)
        u = np.asarray(u)
        assert u.min() >= 0 and u.max() < 1
        np.testing.assert_allclose(u.mean(), 0.5, atol=0.005)
        np.testing.assert_allclose(u.var(), 1 / 12, atol=0.005)

    def test_dims_decorrelated(self):
        s = rng.make_sampler(1, jnp.arange(100000), 0)
        a, s = rng.next_1d(s)
        b, s = rng.next_1d(s)
        corr = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
        assert abs(corr) < 0.01

    def test_reproducible(self):
        s1 = rng.make_sampler(7, jnp.arange(64), 3)
        s2 = rng.make_sampler(7, jnp.arange(64), 3)
        a, _ = rng.next_2d(s1)
        b, _ = rng.next_2d(s2)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_seeds_differ(self):
        a, _ = rng.next_1d(rng.make_sampler(1, jnp.arange(64), 0))
        b, _ = rng.next_1d(rng.make_sampler(2, jnp.arange(64), 0))
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestLDS:
    def test_stratification_2d(self):
        # One pixel, N=1024 samples: (0,2)-sequence must place exactly one
        # sample in each of 1024 base-2 elementary intervals (here: 32x32).
        n = 1024
        s = rng.make_sampler(9, jnp.zeros(n, jnp.uint32), jnp.arange(n), mode=rng.LDS)
        p, _ = rng.next_2d(s)
        p = np.asarray(p)
        cells = (p[:, 0] * 32).astype(int) * 32 + (p[:, 1] * 32).astype(int)
        counts = np.bincount(cells, minlength=1024)
        assert counts.max() == 1 and counts.min() == 1

    def test_1d_stratified(self):
        n = 256
        s = rng.make_sampler(3, jnp.zeros(n, jnp.uint32), jnp.arange(n), mode=rng.LDS)
        u, _ = rng.next_1d(s)
        counts = np.bincount((np.asarray(u) * n).astype(int), minlength=n)
        assert counts.max() == 1

    def test_pixels_decorrelated(self):
        n = 4096
        sa = rng.make_sampler(3, jnp.zeros(n, jnp.uint32), jnp.arange(n), mode=rng.LDS)
        sb = rng.make_sampler(3, jnp.ones(n, jnp.uint32), jnp.arange(n), mode=rng.LDS)
        a, _ = rng.next_2d(sa)
        b, _ = rng.next_2d(sb)
        corr = np.corrcoef(np.asarray(a[:, 0]), np.asarray(b[:, 0]))[0, 1]
        assert abs(corr) < 0.05

    def test_mean_unbiased(self):
        n = 4096
        s = rng.make_sampler(5, jnp.zeros(n, jnp.uint32), jnp.arange(n), mode=rng.LDS)
        p, _ = rng.next_2d(s)
        np.testing.assert_allclose(np.asarray(p).mean(axis=0), 0.5, atol=0.01)
