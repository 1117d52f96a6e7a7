"""Flattened-BVH intersection (scene/bvh.py): brute-force-vs-BVH
equivalence — the reference's test_kd pattern (src/tests/test_kd.cpp with
the data/tests/bunny.ply fixture)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mitsubaer_tpu.scene import bvh as bvh_m


def _random_soup(T=2000, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-1, 1, (T, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.02, (T, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.06, (T, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.06, (T, 3)).astype(np.float32)
    return v0, e1, e2


def _rays(N=2048, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    d = rng.normal(0, 1, (N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def test_bvh_matches_brute_force():
    from mitsubaer_tpu.scene.intersect import _tri_chunk_hit

    v0, e1, e2 = _random_soup()
    b = bvh_m.build_bvh(v0, e1, e2)
    o, d = _rays()
    N = o.shape[0]
    t_min = np.full((N,), 1e-4, np.float32)
    t_max = np.full((N,), 1e9, np.float32)
    t, prim, u, v = jax.jit(
        lambda o, d: bvh_m.intersect_bvh(b, o, d, t_min, t_max))(o, d)
    t = np.asarray(t)
    tb = []
    for s in range(0, N, 512):
        tt, _, _, _ = _tri_chunk_hit(
            jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
            jnp.asarray(o[s:s + 512]), jnp.asarray(d[s:s + 512]), None)
        tb.append(np.asarray(tt))
    tb = np.concatenate(tb)
    tb = np.where(tb >= 1e-4, tb, 3e38)
    hit_a, hit_b = t < 1e30, tb < 1e30
    assert (hit_a == hit_b).mean() > 0.999
    both = hit_a & hit_b
    assert np.abs(t[both] - tb[both]).max() < 1e-3


def test_bvh_skip_links_cover_tree():
    v0, e1, e2 = _random_soup(T=777, seed=2)
    b = bvh_m.build_bvh(v0, e1, e2)
    skips = np.asarray(jax.lax.bitcast_convert_type(b.nodes[:, 6],
                                                    jnp.int32))
    N = len(skips)
    assert (skips > np.arange(N)).all() and (skips <= N).all()
    # every triangle lands in exactly one leaf
    counts = np.asarray(b.counts)
    assert counts.sum() == 777
    assert sorted(np.asarray(b.tri_id).tolist()) == list(range(777))


def test_bunny_mesh_renders_through_bvh():
    """Load the reference's bunny fixture (~70k tris) and intersect camera
    rays through the scene-level dispatch (geo.bvh path)."""
    import os

    ply = "/root/reference/data/tests/bunny.ply"
    if not os.path.exists(ply):
        pytest.skip("reference bunny.ply not available")
    from mitsubaer_tpu.scene.build import SceneBuilder
    from mitsubaer_tpu.scene import intersect as isect
    from mitsubaer_tpu.utils import io as io_m

    verts, faces = io_m.load_ply(ply)
    b = SceneBuilder()
    b.add_mesh(verts, faces, bsdf=b.add_bsdf())
    import numpy as _np

    from mitsubaer_tpu.core import transform as tf

    lo, hi = verts.min(0), verts.max(0)
    center = 0.5 * (lo + hi)
    eye = center + _np.array([0, 0, 2.5 * (hi - lo).max()])
    b.set_perspective_sensor(to_world=tf.look_at(eye, center, [0, 1, 0]),
                             fov_deg=40)
    scene = b.build()
    assert scene.geo.bvh is not None, "bunny must cross _BVH_MIN_TRIS"
    N = 1024
    rng = np.random.default_rng(0)
    o = np.tile(eye.astype(np.float32), (N, 1))
    to = center[None, :] + rng.normal(0, 0.3 * (hi - lo).max(), (N, 3))
    d = (to - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    hit = jax.jit(lambda o, d: isect.intersect(
        scene.geo, o, d, jnp.full((N,), 1e-4), jnp.full((N,), 1e9)))(
            jnp.asarray(o), jnp.asarray(d))
    frac = float(np.asarray(hit.valid).mean())
    assert 0.3 < frac <= 1.0, frac
