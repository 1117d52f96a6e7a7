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


class TestStratified:
    def test_1d_strata(self):
        n = 64
        s = rng.make_sampler(3, jnp.zeros(n, jnp.uint32), jnp.arange(n),
                             mode=rng.STRATIFIED, n_samples=n)
        u, _ = rng.next_1d(s)
        counts = np.bincount((np.asarray(u) * n).astype(int), minlength=n)
        assert counts.max() == 1 and counts.min() == 1

    def test_2d_strata(self):
        n = 64  # 8x8 grid
        s = rng.make_sampler(5, jnp.zeros(n, jnp.uint32), jnp.arange(n),
                             mode=rng.STRATIFIED, n_samples=n)
        p, _ = rng.next_2d(s)
        p = np.asarray(p)
        cells = (p[:, 0] * 8).astype(int) * 8 + (p[:, 1] * 8).astype(int)
        counts = np.bincount(cells, minlength=64)
        assert counts.max() == 1 and counts.min() == 1


class TestHalton:
    def test_uniform_and_stratified(self):
        n = 512
        s = rng.make_sampler(1, jnp.zeros(n, jnp.uint32), jnp.arange(n),
                             mode=rng.HALTON)
        p, _ = rng.next_2d(s)
        p = np.asarray(p)
        np.testing.assert_allclose(p.mean(axis=0), 0.5, atol=0.03)
        # base-2 axis: 512 consecutive scrambled-radical-inverse samples fill
        # all 512 base-2 strata exactly once
        counts = np.bincount((p[:, 0] * 512).astype(int), minlength=512)
        assert counts.max() == 1

    def test_radical_inverse_base2_matches_reverse_bits(self):
        idx = jnp.arange(64, dtype=jnp.uint32)
        r = np.asarray(rng.radical_inverse(idx, jnp.uint32(2)))
        expect = np.asarray([int(f"{i:06b}"[::-1], 2) / 64 for i in range(64)])
        np.testing.assert_allclose(r, expect, atol=1e-6)

    def test_base3_first_points(self):
        idx = jnp.arange(9, dtype=jnp.uint32)
        r = np.asarray(rng.radical_inverse(idx, jnp.uint32(3)))
        expect = [0, 1/3, 2/3, 1/9, 4/9, 7/9, 2/9, 5/9, 8/9]
        np.testing.assert_allclose(r, expect, atol=1e-6)


class TestSobol:
    def test_dim0_is_van_der_corput(self):
        # unscrambled check via the raw table
        assert rng._SOBOL_TABLE[0, 0] == 1 << 31

    def test_elementary_intervals(self):
        # scrambled Sobol' dims (0,1) remain a (0,2)-sequence: 256 samples
        # hit all 16x16 strata exactly once
        n = 256
        s = rng.make_sampler(11, jnp.zeros(n, jnp.uint32), jnp.arange(n),
                             mode=rng.SOBOL)
        p, _ = rng.next_2d(s)
        p = np.asarray(p)
        cells = (p[:, 0] * 16).astype(int) * 16 + (p[:, 1] * 16).astype(int)
        counts = np.bincount(cells, minlength=256)
        assert counts.max() == 1 and counts.min() == 1

    def test_higher_dims_uniform(self):
        n = 4096
        s = rng.make_sampler(2, jnp.zeros(n, jnp.uint32), jnp.arange(n),
                             mode=rng.SOBOL)
        s = s._replace(dim=s.dim + jnp.uint32(17))
        u, _ = rng.next_1d(s)
        u = np.asarray(u)
        np.testing.assert_allclose(u.mean(), 0.5, atol=0.02)
        counts = np.bincount((u * 64).astype(int), minlength=64)
        assert counts.min() > 30  # roughly even occupancy

    def test_table_dims_distinct(self):
        t = rng._SOBOL_TABLE
        assert len({tuple(r) for r in t}) == t.shape[0]


class TestHammersley:
    def test_first_axis_is_index_over_n(self):
        n = 128
        s = rng.make_sampler(1, jnp.zeros(n, jnp.uint32), jnp.arange(n),
                             mode=rng.HAMMERSLEY, n_samples=n)
        p, _ = rng.next_2d(s)
        counts = np.bincount((np.asarray(p)[:, 0] * n).astype(int), minlength=n)
        assert counts.max() == 1 and counts.min() == 1
