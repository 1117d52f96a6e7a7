"""Heightfield + instanced shapes (shapes/heightfield.cpp, instance.cpp)
and the adaptive / multichannel integrators (misc/)."""
import numpy as np
import jax.numpy as jnp

from mitsubaer_tpu.core import transform as tf
from mitsubaer_tpu.integrators import misc as misc_m
from mitsubaer_tpu.integrators import render as rm
from mitsubaer_tpu.scene.build import SceneBuilder
from mitsubaer_tpu.scene import presets


def test_heightfield_renders():
    b = SceneBuilder()
    ys, xs = np.meshgrid(np.linspace(0, 2 * np.pi, 17),
                         np.linspace(0, 2 * np.pi, 17), indexing="ij")
    h = 0.15 * np.sin(xs) * np.cos(ys)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] *= 2.0
    m[2, 3] = -0.5
    b.add_heightfield(h, to_world=m, bsdf=b.add_bsdf())
    b.add_rectangle(to_world=_emitter_xform(), bsdf=-1,
                    emitter_radiance=(8.0, 8.0, 8.0))
    b.set_perspective_sensor(
        to_world=tf.look_at([0, -3, 2], [0, 0, 0], [0, 0, 1]), fov_deg=45)
    b.config = b.config._replace(width=12, height=12, spp=8, max_depth=3,
                                 filter="box")
    img = np.asarray(rm.render(b.build(), b.config))
    assert np.isfinite(img).all() and img.mean() > 0


def _emitter_xform():
    m = np.eye(4, dtype=np.float32)
    m[2, 3] = 2.0
    m[1, 1] = -1.0  # face downward
    return m


def test_instances_render_and_cross_bvh_threshold():
    b = SceneBuilder()
    v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]],
                 np.float32) * 0.3
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    mats = []
    for i in range(300):   # 600 tris > _BVH_MIN_TRIS -> BVH path
        m = np.eye(4, dtype=np.float32)
        m[0, 3] = (i % 20) * 0.2 - 2.0
        m[1, 3] = (i // 20) * 0.2 - 1.5
        mats.append(m)
    ids = b.add_instances(v, f, mats, bsdf=b.add_bsdf())
    assert len(ids) == 300
    b.add_rectangle(to_world=_emitter_xform(), bsdf=-1,
                    emitter_radiance=(8.0, 8.0, 8.0))
    b.set_perspective_sensor(
        to_world=tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]), fov_deg=50)
    b.config = b.config._replace(width=12, height=12, spp=4, max_depth=2,
                                 filter="box")
    scene = b.build()
    assert scene.geo.bvh is not None
    img = np.asarray(rm.render(scene, b.config))
    assert np.isfinite(img).all() and img.mean() > 0


def test_multichannel_and_adaptive():
    scene, cfg = presets.cornell_box(res=12, spp=4, max_depth=3, boxes=False)
    cfg = cfg._replace(filter="box")
    mc = np.asarray(misc_m.render_multichannel(
        scene, cfg, fields=["shNormal", "distance"]))
    assert mc.shape == (12, 12, 9) and np.isfinite(mc).all()
    ad = np.asarray(misc_m.render_adaptive(scene, cfg, base_spp=4,
                                           max_sample_factor=2))
    assert ad.shape == (12, 12, 3) and np.isfinite(ad).all()
    assert ad.mean() > 0
