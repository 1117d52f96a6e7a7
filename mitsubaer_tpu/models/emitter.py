"""Emitters: area / point / directional / collimated / constant / spot.

Reference: src/emitters/*.cpp + Scene::sampleEmitterDirect (scene.cpp).
Direct sampling picks an emitter uniformly, then a position/direction on it;
pdfs are reported in solid-angle measure at the reference point so MIS can
combine with BSDF/phase sampling, matching Mitsuba's
DirectSamplingRecord convention.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..core import smalltab, warp
from ..core.math import dot, length, normalize
from ..scene.types import (
    EM_AREA,
    EM_COLLIMATED,
    EM_CONSTANT,
    EM_DIRECTIONAL,
    EM_POINT,
    EM_SPOT,
    Scene,
)

_BIG = np.float32(1.0e7)


class DirectSample(NamedTuple):
    d: jnp.ndarray         # (N, 3) unit direction from ref point to emitter
    dist: jnp.ndarray      # (N,) distance to the emitter sample
    pdf: jnp.ndarray       # (N,) solid-angle pdf (includes emitter pick prob)
    value: jnp.ndarray     # (N, 3) emitted radiance / (intensity/d^2) etc.
    emitter: jnp.ndarray   # (N,) int32
    delta: jnp.ndarray     # (N,) bool (point/directional/collimated/spot)
    p: jnp.ndarray         # (N, 3) sampled emitter position
    n: jnp.ndarray         # (N, 3) emitter normal at sample (area)


def _sample_area_position(scene: Scene, e_idx, u2, u_tri):
    """Pick a triangle from the emitter's CDF segment + uniform barycentrics.
    Returns (p, n, pdf_area)."""
    em = scene.emitters
    off = smalltab.take(em.tri_offset, e_idx)
    cnt = smalltab.take(em.tri_count, e_idx)
    M = em.tri_cdf.shape[0]
    # masked searchsorted across the flat table: index of first cdf >= u within segment
    slots = jnp.arange(M)
    in_seg = (slots[None, :] >= off[:, None]) & (slots[None, :] < (off + cnt)[:, None])
    ge = em.tri_cdf[None, :] >= u_tri[:, None]
    candidate = in_seg & ge
    # first candidate slot; fall back to last slot in segment
    first = jnp.argmax(candidate, axis=-1)
    has = jnp.any(candidate, axis=-1)
    last = jnp.clip(off + cnt - 1, 0, M - 1)
    slot = jnp.where(has, first, last)
    tri = smalltab.take(em.tri_index, slot)

    v0 = smalltab.take(scene.geo.v0, tri)
    e1 = smalltab.take(scene.geo.e1, tri)
    e2 = smalltab.take(scene.geo.e2, tri)
    n = smalltab.take(scene.geo.ng, tri)
    b = warp.square_to_uniform_triangle(u2)
    p = v0 + b[..., 0:1] * e1 + b[..., 1:2] * e2
    area = smalltab.take(em.area, e_idx)
    pdf_area = 1.0 / jnp.maximum(area, 1e-12)
    return p, n, pdf_area


def sample_direct(scene: Scene, ref_p, u2, u_sel) -> DirectSample:
    """Sample a direct connection from `ref_p` to one emitter.

    u_sel picks the emitter (uniform among NE) and the triangle; u2 picks the
    position. Mirrors Scene::sampleEmitterDirect (scene.cpp:812-850)."""
    em = scene.emitters
    ne = em.kind.shape[0]
    e_idx = jnp.clip((u_sel * ne).astype(jnp.int32), 0, ne - 1)
    pick_pdf = 1.0 / ne
    u_tri = jnp.minimum(u_sel * ne - e_idx, 0.9999994)  # reuse stratum remainder

    kind = smalltab.take(em.kind, e_idx)
    radiance = smalltab.take(em.radiance, e_idx)
    pos = smalltab.take(em.position, e_idx)
    edir = smalltab.take(em.direction, e_idx)

    # --- area ---
    p_area, n_area, pdf_area = _sample_area_position(scene, e_idx, u2, u_tri)
    to_p = p_area - ref_p
    dist_a = length(to_p)
    d_a = to_p / jnp.maximum(dist_a, 1e-12)[..., None]
    cos_l = -dot(d_a, n_area)
    # area pdf -> solid angle: pdf_w = pdf_A * d^2 / cos
    pdf_a = jnp.where(
        cos_l > 1e-6, pdf_area * dist_a * dist_a / jnp.maximum(cos_l, 1e-6), 0.0
    )
    val_a = jnp.where((cos_l > 1e-6)[..., None], radiance, 0.0)

    # --- point: value = I / d^2, delta ---
    to_pt = pos - ref_p
    dist_p = length(to_pt)
    d_p = to_pt / jnp.maximum(dist_p, 1e-12)[..., None]
    val_p = radiance / jnp.maximum(dist_p * dist_p, 1e-12)[..., None]

    # --- spot: point + falloff (spot.cpp) ---
    cos_spot = dot(-d_p, edir)
    cutoff = smalltab.take(em.cutoff_cos, e_idx)
    beam = smalltab.take(em.beam_falloff_cos, e_idx)
    falloff = jnp.clip((cos_spot - cutoff) / jnp.maximum(beam - cutoff, 1e-6), 0.0, 1.0)
    val_s = val_p * falloff[..., None]

    # --- directional: comes from -dir at infinity, value = irradiance E ---
    d_d = -edir
    dist_d = jnp.full_like(dist_p, _BIG)

    # --- constant: uniform sky; sample uniform sphere direction ---
    d_c = warp.square_to_uniform_sphere(u2)
    pdf_c = jnp.full_like(dist_p, warp.square_to_uniform_sphere_pdf())
    dist_c = jnp.full_like(dist_p, _BIG)

    is_area = kind == EM_AREA
    is_point = kind == EM_POINT
    is_spot = kind == EM_SPOT
    is_dir = kind == EM_DIRECTIONAL
    is_const = kind == EM_CONSTANT
    is_coll = kind == EM_COLLIMATED

    d = jnp.where(is_area[..., None], d_a, d_p)
    d = jnp.where(is_dir[..., None], jnp.broadcast_to(d_d, d.shape), d)
    d = jnp.where(is_const[..., None], d_c, d)
    dist = jnp.where(is_area, dist_a, dist_p)
    dist = jnp.where(is_dir | is_const, dist_c, dist)
    value = jnp.where(is_area[..., None], val_a, val_p)
    value = jnp.where(is_spot[..., None], val_s, value)
    value = jnp.where(is_dir[..., None], jnp.broadcast_to(radiance, value.shape), value)
    value = jnp.where(is_const[..., None], jnp.broadcast_to(radiance, value.shape), value)
    # collimated beams are delta in position AND direction: direct sampling
    # has measure zero (handled by the dedicated beam-NEE in volpath)
    value = jnp.where(is_coll[..., None], 0.0, value)
    pdf = jnp.where(is_area, pdf_a, 1.0)
    pdf = jnp.where(is_const, pdf_c, pdf)
    # value stays the emitted quantity; the integrator divides by pdf, which
    # includes the uniform emitter-pick probability
    pdf = pdf * pick_pdf
    delta = is_point | is_spot | is_dir | is_coll
    return DirectSample(
        d=d, dist=dist, pdf=pdf, value=value, emitter=e_idx, delta=delta,
        p=jnp.where(is_area[..., None], p_area, pos),
        n=jnp.where(is_area[..., None], n_area, -d),
    )


def eval_hit(scene: Scene, emitter_id, ng, wi_world):
    """Radiance of an area emitter seen from direction wi_world (pointing away
    from the surface toward the viewer). Zero for back side."""
    em = scene.emitters
    e = jnp.clip(emitter_id, 0, em.kind.shape[0] - 1)
    radiance = smalltab.take(em.radiance, e)
    is_area = smalltab.take(em.kind, e) == EM_AREA
    front = dot(wi_world, ng) > 0
    return jnp.where(
        (is_area & front & (emitter_id >= 0))[..., None], radiance, 0.0
    )


def pdf_direct_hit(scene: Scene, emitter_id, ref_p, p, ng):
    """Solid-angle pdf of having direct-sampled the point p on area emitter
    `emitter_id` from ref_p (for MIS on BSDF-sampled emitter hits)."""
    em = scene.emitters
    ne = em.kind.shape[0]
    e = jnp.clip(emitter_id, 0, ne - 1)
    area = smalltab.take(em.area, e)
    to_p = p - ref_p
    d2 = dot(to_p, to_p)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-20))
    cos_l = -dot(to_p, ng) / dist
    pdf = jnp.where(
        cos_l > 1e-6, d2 / (jnp.maximum(cos_l, 1e-6) * jnp.maximum(area, 1e-12)), 0.0
    )
    return pdf / ne


def env_radiance(scene: Scene, d_world):
    """Radiance of environment (constant) emitters for escaped rays."""
    em = scene.emitters
    is_const = em.kind == EM_CONSTANT
    total = jnp.sum(
        jnp.where(is_const[:, None], em.radiance, 0.0), axis=0
    )
    return jnp.broadcast_to(total, d_world.shape)


def pdf_direct_env(scene: Scene, d_world):
    em = scene.emitters
    ne = em.kind.shape[0]
    has_const = jnp.any(em.kind == EM_CONSTANT)
    return jnp.where(
        has_const, warp.square_to_uniform_sphere_pdf() / ne, 0.0
    ) * jnp.ones(d_world.shape[:-1])
