import jax.numpy as jnp
import numpy as np

from mitsubaer_tpu.scene import intersect as isect
from mitsubaer_tpu.scene.build import SceneBuilder


def simple_scene():
    b = SceneBuilder()
    m = b.add_bsdf()
    # unit quad at z=5 facing -z
    v = np.array([[-1, -1, 5], [1, -1, 5], [1, 1, 5], [-1, 1, 5]], np.float32)
    f = np.array([[0, 2, 1], [0, 3, 2]], np.int32)
    b.add_mesh(v, f, bsdf=m)
    b.add_sphere([0, 0, 10], 1.0, bsdf=m)
    return b.build()


class TestIntersect:
    def test_hit_quad(self):
        s = simple_scene()
        o = jnp.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.0], [2.0, 0.0, 0.0]])
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (3, 1))
        h = isect.intersect(s.geo, o, d, 1e-4, 1e9)
        np.testing.assert_array_equal(np.asarray(h.valid), [True, True, False])
        np.testing.assert_allclose(np.asarray(h.t[:2]), [5.0, 5.0], atol=1e-5)
        assert np.asarray(h.shape_id)[0] == 0

    def test_hit_sphere_behind_quad(self):
        s = simple_scene()
        # ray starting past the quad hits the sphere
        o = jnp.array([[0.0, 0.0, 6.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        h = isect.intersect(s.geo, o, d, 1e-4, 1e9)
        assert bool(h.valid[0])
        np.testing.assert_allclose(float(h.t[0]), 3.0, atol=1e-5)
        assert int(h.shape_id[0]) == 1
        # normal points back toward ray origin at the near intersection
        np.testing.assert_allclose(np.asarray(h.ng[0]), [0, 0, -1], atol=1e-5)

    def test_closest_hit_ordering(self):
        s = simple_scene()
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        h = isect.intersect(s.geo, o, d, 1e-4, 1e9)
        # quad at 5 is closer than sphere at 9
        np.testing.assert_allclose(float(h.t[0]), 5.0, atol=1e-5)

    def test_tmax_respected(self):
        s = simple_scene()
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        h = isect.intersect(s.geo, o, d, 1e-4, 4.0)
        assert not bool(h.valid[0])

    def test_occluded(self):
        s = simple_scene()
        o = jnp.array([[0.0, 0.0, 0.0], [0.0, 1.5, 0.0]])
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
        occ = isect.occluded(s.geo, o, d, jnp.full(2, 1e-4), jnp.full(2, 100.0))
        np.testing.assert_array_equal(np.asarray(occ), [True, False])

    def test_ray_aabb(self):
        tn, tf = isect.ray_aabb(
            jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 1.0]),
            jnp.array([-1.0, -1.0, -1.0]), jnp.array([1.0, 1.0, 1.0]),
        )
        np.testing.assert_allclose([float(tn), float(tf)], [4.0, 6.0], atol=1e-5)

    def test_many_triangles_chunked(self):
        # force the chunked path with > 256 triangles
        b = SceneBuilder()
        m = b.add_bsdf()
        rng = np.random.default_rng(0)
        n = 600
        centers = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        verts = []
        faces = []
        for i, c in enumerate(centers):
            verts.extend([c, c + [0.1, 0, 0], c + [0, 0.1, 0]])
            faces.append([3 * i, 3 * i + 1, 3 * i + 2])
        b.add_mesh(np.array(verts), np.array(faces), bsdf=m)
        s = b.build()
        # ray straight at a known triangle's interior
        tgt = centers[37] + np.array([0.03, 0.03, 0.0])
        o = jnp.asarray((tgt + np.array([0, 0, -20.0]))[None, :])
        d = jnp.array([[0.0, 0.0, 1.0]])
        h = isect.intersect(s.geo, o, d, 1e-4, 1e9)
        assert bool(h.valid[0])
        hits_near = np.abs(np.asarray(h.p[0]) - tgt).max()
        assert hits_near < 0.2  # could hit another overlapping tri, but nearby in xy
