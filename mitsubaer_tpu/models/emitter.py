"""Emitters: area / point / directional / collimated / constant / spot.

Reference: src/emitters/*.cpp + Scene::sampleEmitterDirect (scene.cpp).
Direct sampling picks an emitter uniformly, then a position/direction on it;
pdfs are reported in solid-angle measure at the reference point so MIS can
combine with BSDF/phase sampling, matching Mitsuba's
DirectSamplingRecord convention.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..core import smalltab, warp
from ..core.math import dot, length, normalize
from ..scene.types import (
    EM_ENVMAP,
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
    is_env = kind == EM_ENVMAP

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
    if _has_envmap(scene):
        d_e, pdf_e, val_e = sample_env_direction(scene, u2)
        d = jnp.where(is_env[..., None], d_e, d)
        dist = jnp.where(is_env, _BIG, dist)
        value = jnp.where(is_env[..., None], val_e, value)
        pdf = jnp.where(is_env, pdf_e, pdf)
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


def _env_uv(scene: Scene, d_world):
    """World direction -> lat-long uv in [0,1)^2 (envmap.cpp mapping)."""
    d = d_world @ scene.emitters.env_to_world  # world -> env frame (R^T)
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 1], d[..., 0])
    u = (phi / (2.0 * jnp.pi)) % 1.0
    v = theta / jnp.pi
    return u, v


def _env_lookup(scene: Scene, d_world):
    """Bilinear lat-long lookup of the shared environment map."""
    em = scene.emitters
    He, We = em.env_map.shape[:2]
    u, v = _env_uv(scene, d_world)
    x = u * We - 0.5
    y = v * He - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    img = em.env_map.reshape(-1, 3)
    xi0, xi1 = x0 % We, (x0 + 1) % We
    yi0 = jnp.clip(y0, 0, He - 1)
    yi1 = jnp.clip(y0 + 1, 0, He - 1)
    p00 = jnp.take(img, yi0 * We + xi0, axis=0)
    p10 = jnp.take(img, yi0 * We + xi1, axis=0)
    p01 = jnp.take(img, yi1 * We + xi0, axis=0)
    p11 = jnp.take(img, yi1 * We + xi1, axis=0)
    val = ((p00 * (1 - fx) + p10 * fx) * (1 - fy)
           + (p01 * (1 - fx) + p11 * fx) * fy)
    return val * em.env_scale


def sample_env_direction(scene: Scene, u2):
    """Importance-sample the lat-long envmap by luminance (envmap.cpp).
    Returns (d_world, pdf_solid_angle, radiance)."""
    em = scene.emitters
    He, We = em.env_map.shape[:2]
    # marginal row then conditional column by CDF inversion
    row = jnp.clip(jnp.searchsorted(em.env_cdf_rows, u2[..., 0]), 0, He - 1)
    cdf_lo_r = jnp.where(row > 0, jnp.take(em.env_cdf_rows, row - 1), 0.0)
    pmf_row = jnp.take(em.env_cdf_rows, row) - cdf_lo_r
    cond = jnp.take(em.env_cdf_cond, row, axis=0)  # (N, We) row gather
    col = jnp.clip(
        jax.vmap(jnp.searchsorted)(cond, u2[..., 1]), 0, We - 1)
    cdf_lo_c = jnp.where(col > 0,
                         jnp.take_along_axis(cond, jnp.maximum(col - 1, 0)[..., None],
                                             axis=-1)[..., 0], 0.0)
    pmf_col = jnp.take_along_axis(cond, col[..., None], axis=-1)[..., 0] - cdf_lo_c
    # jitter inside the texel
    ur = (u2[..., 0] - cdf_lo_r) / jnp.maximum(pmf_row, 1e-12)
    uc = (u2[..., 1] - cdf_lo_c) / jnp.maximum(pmf_col, 1e-12)
    v = (row.astype(jnp.float32) + jnp.clip(ur, 0.0, 0.9999)) / He
    u = (col.astype(jnp.float32) + jnp.clip(uc, 0.0, 0.9999)) / We
    theta = v * jnp.pi
    phi = u * 2.0 * jnp.pi
    st = jnp.sin(theta)
    d_env = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi),
                       jnp.cos(theta)], axis=-1)
    d_world = d_env @ scene.emitters.env_to_world.T
    # texel pmf -> solid angle density: pmf * (He*We) / (2 pi^2 sin(theta))
    pdf = (pmf_row * pmf_col * He * We
           / jnp.maximum(2.0 * jnp.pi * jnp.pi * st, 1e-8))
    val = _env_lookup(scene, d_world)
    return d_world, pdf, val


def env_pdf_direction(scene: Scene, d_world):
    """Solid-angle pdf of sample_env_direction having produced d_world."""
    em = scene.emitters
    He, We = em.env_map.shape[:2]
    u, v = _env_uv(scene, d_world)
    row = jnp.clip((v * He).astype(jnp.int32), 0, He - 1)
    col = jnp.clip((u * We).astype(jnp.int32), 0, We - 1)
    cdf_lo_r = jnp.where(row > 0, jnp.take(em.env_cdf_rows,
                                           jnp.maximum(row - 1, 0)), 0.0)
    pmf_row = jnp.take(em.env_cdf_rows, row) - cdf_lo_r
    cond = jnp.take(em.env_cdf_cond, row, axis=0)
    cdf_lo_c = jnp.where(col > 0,
                         jnp.take_along_axis(cond, jnp.maximum(col - 1, 0)[..., None],
                                             axis=-1)[..., 0], 0.0)
    pmf_col = jnp.take_along_axis(cond, col[..., None], axis=-1)[..., 0] - cdf_lo_c
    st = jnp.sin(jnp.clip(v, 1e-4, 1 - 1e-4) * jnp.pi)
    return (pmf_row * pmf_col * He * We
            / jnp.maximum(2.0 * jnp.pi * jnp.pi * st, 1e-8))


def _has_envmap(scene: Scene) -> bool:
    # static: the shared map is (1,1,3) when no envmap emitter exists
    return scene.emitters.env_map.shape[0] > 1


def env_radiance(scene: Scene, d_world):
    """Radiance of environment (constant + envmap) emitters for escaped rays."""
    em = scene.emitters
    is_const = em.kind == EM_CONSTANT
    total = jnp.sum(
        jnp.where(is_const[:, None], em.radiance, 0.0), axis=0
    )
    out = jnp.broadcast_to(total, d_world.shape)
    if _has_envmap(scene):
        out = out + _env_lookup(scene, d_world)
    return out


def pdf_direct_env(scene: Scene, d_world):
    em = scene.emitters
    ne = em.kind.shape[0]
    has_const = jnp.any(em.kind == EM_CONSTANT)
    out = jnp.where(
        has_const, warp.square_to_uniform_sphere_pdf() / ne, 0.0
    ) * jnp.ones(d_world.shape[:-1])
    if _has_envmap(scene):
        out = out + env_pdf_direction(scene, d_world) / ne
    return out


# ---------------------------------------------------------------------------
# Preetham sky model baked to a lat-long envmap (src/emitters/sky.cpp,
# sun.cpp, sunsky.cpp). The reference evaluates Preetham/Hosek analytically
# per query; here we bake once at scene build into the shared envmap, which
# the importance-sampled envmap machinery then handles uniformly.
# ---------------------------------------------------------------------------
def make_sky_envmap(sun_dir, turbidity: float = 3.0, res: int = 128,
                    sun_scale: float = 1.0, sky_scale: float = 1.0,
                    with_sun: bool = True):
    """Host-side (numpy): Preetham analytic sky radiance on a lat-long grid.
    sun_dir: direction TO the sun (world, z-up). Returns (res, 2*res, 3)."""
    sun_dir = np.asarray(sun_dir, np.float64)
    sun_dir = sun_dir / np.linalg.norm(sun_dir)
    T = float(turbidity)

    theta_s = np.arccos(np.clip(sun_dir[2], -1.0, 1.0))
    # Preetham zenith values (xyY)
    chi = (4.0 / 9.0 - T / 120.0) * (np.pi - 2.0 * theta_s)
    Yz = (4.0453 * T - 4.9710) * np.tan(chi) - 0.2155 * T + 2.4192  # kcd/m^2
    ts = theta_s
    tv = np.array([ts ** 3, ts ** 2, ts, 1.0])
    xz = np.array([0.00166, -0.00375, 0.00209, 0.0]) @ tv * T * T + \
        np.array([-0.02903, 0.06377, -0.03202, 0.00394]) @ tv * T + \
        np.array([0.11693, -0.21196, 0.06052, 0.25886]) @ tv
    yz = np.array([0.00275, -0.00610, 0.00317, 0.0]) @ tv * T * T + \
        np.array([-0.04214, 0.08970, -0.04153, 0.00516]) @ tv * T + \
        np.array([0.15346, -0.26756, 0.06670, 0.26688]) @ tv

    def perez(A, B, C, D, E, ct, gamma):
        return ((1.0 + A * np.exp(B / np.maximum(ct, 0.01)))
                * (1.0 + C * np.exp(D * gamma) + E * np.cos(gamma) ** 2))

    # Perez coefficients (Y, x, y)
    AY, BY, CY, DY, EY = (0.1787 * T - 1.4630, -0.3554 * T + 0.4275,
                          -0.0227 * T + 5.3251, 0.1206 * T - 2.5771,
                          -0.0670 * T + 0.3703)
    Ax, Bx, Cx, Dx, Ex = (-0.0193 * T - 0.2592, -0.0665 * T + 0.0008,
                          -0.0004 * T + 0.2125, -0.0641 * T - 0.8989,
                          -0.0033 * T + 0.0452)
    Ay, By, Cy, Dy, Ey = (-0.0167 * T - 0.2608, -0.0950 * T + 0.0092,
                          -0.0079 * T + 0.2102, -0.0441 * T - 1.6537,
                          -0.0109 * T + 0.0529)

    H, W = res, 2 * res
    theta = (np.arange(H) + 0.5) / H * np.pi
    phi = (np.arange(W) + 0.5) / W * 2.0 * np.pi
    TT, PP = np.meshgrid(theta, phi, indexing="ij")
    ct = np.cos(TT)
    d = np.stack([np.sin(TT) * np.cos(PP), np.sin(TT) * np.sin(PP), ct], -1)
    cg = np.clip(d @ sun_dir, -1.0, 1.0)
    gamma = np.arccos(cg)

    vis = ct > 0.0
    ctc = np.maximum(ct, 0.01)
    fY = perez(AY, BY, CY, DY, EY, ctc, gamma) / \
        perez(AY, BY, CY, DY, EY, 1.0, theta_s)
    fx = perez(Ax, Bx, Cx, Dx, Ex, ctc, gamma) / \
        perez(Ax, Bx, Cx, Dx, Ex, 1.0, theta_s)
    fy = perez(Ay, By, Cy, Dy, Ey, ctc, gamma) / \
        perez(Ay, By, Cy, Dy, Ey, 1.0, theta_s)
    Y = np.maximum(Yz * fY, 0.0) * 1000.0 / 203.0  # normalize-ish to O(1..10)
    x = xz * fx
    y = yz * fy
    # xyY -> XYZ -> linear sRGB
    X = x / np.maximum(y, 1e-5) * Y
    Z = (1.0 - x - y) / np.maximum(y, 1e-5) * Y
    R = 3.2406 * X - 1.5372 * Y - 0.4986 * Z
    G = -0.9689 * X + 1.8758 * Y + 0.0415 * Z
    B = 0.0557 * X - 0.2040 * Y + 1.0570 * Z
    img = np.stack([R, G, B], -1).clip(0.0) * sky_scale
    img[~vis] *= 0.0

    if with_sun and theta_s < np.pi / 2:
        # sun disk (~0.5 deg) with simple turbidity attenuation (sun.cpp)
        sun_cos = np.cos(np.deg2rad(0.2665))
        disk = cg > sun_cos
        att = np.exp(-0.12 * T)  # crude broadband extinction
        img[disk] += np.array([1.0, 0.96, 0.88]) * 500.0 * att * sun_scale
    return img.astype(np.float32)
