"""Miscellaneous integrators: ambient occlusion + field extraction.

Reference: src/integrators/direct/ao.cpp and src/integrators/misc/field.cpp
(used with the multichannel integrator for AOV outputs)."""
from __future__ import annotations

import jax.numpy as jnp

from ..core import rng, warp
from ..core.math import Frame
from ..scene import intersect as isect
from ..scene.types import RenderConfig, Scene
from . import common


def ao_li(scene: Scene, cfg: RenderConfig, o, d, sampler, pixel=None,
          ray_length_frac: float = 0.05, n_samples: int = 4):
    """Ambient occlusion (ao.cpp): cosine-hemisphere visibility with a ray
    length proportional to the scene extent."""
    n = o.shape[0]
    eps = common.scene_epsilon(scene)
    diag = jnp.linalg.norm(scene.aabb_max - scene.aabb_min)
    max_dist = diag * ray_length_frac

    hit = isect.intersect(scene.geo, o, d, jnp.full((n,), eps),
                          jnp.full((n,), isect.INF))
    frame = Frame.from_normal(hit.ng)
    occ_sum = jnp.zeros((n,), jnp.float32)
    smp = sampler
    for _ in range(n_samples):
        u2, smp = rng.next_2d(smp)
        wo = frame.to_world(warp.square_to_cosine_hemisphere(u2))
        blocked = isect.occluded(
            scene.geo, hit.p + wo * eps, wo,
            jnp.full((n,), eps * 0.1), jnp.full((n,), max_dist),
        )
        occ_sum = occ_sum + jnp.where(blocked, 0.0, 1.0)
    vis = occ_sum / n_samples
    value = jnp.where(hit.valid[..., None], vis[..., None], 1.0)
    sink = common.new_sink(cfg, n, pixel)
    sink = common.add_contribution(
        sink, cfg, jnp.broadcast_to(value, (n, 3)),
        jnp.where(hit.valid, hit.t, 0.0), jnp.ones((n,), jnp.int32),
        jnp.ones((n,), bool),
    )
    return sink, smp


def field_li(scene: Scene, cfg: RenderConfig, o, d, sampler, pixel=None,
             field: str = "shNormal"):
    """Field extraction (field.cpp): writes geometric quantities as colors.
    Fields: shNormal | geoNormal | position | distance | primIndex | uv."""
    n = o.shape[0]
    eps = common.scene_epsilon(scene)
    hit = isect.intersect(scene.geo, o, d, jnp.full((n,), eps),
                          jnp.full((n,), isect.INF))
    if field in ("shNormal", "geoNormal"):
        value = hit.ng * 0.5 + 0.5
    elif field == "position":
        value = hit.p
    elif field == "distance":
        value = jnp.broadcast_to(
            jnp.where(hit.valid, hit.t, 0.0)[..., None], (n, 3)
        )
    elif field == "primIndex":
        value = jnp.broadcast_to(hit.prim.astype(jnp.float32)[..., None], (n, 3))
    elif field == "uv":
        value = jnp.concatenate([hit.uv, jnp.zeros((n, 1))], axis=-1)
    else:
        raise ValueError(f"unknown field {field}")
    value = jnp.where(hit.valid[..., None], value, 0.0)
    sink = common.new_sink(cfg, n, pixel)
    sink = common.add_contribution(
        sink, cfg, value, jnp.where(hit.valid, hit.t, 0.0),
        jnp.ones((n,), jnp.int32), jnp.ones((n,), bool),
    )
    return sink, sampler
