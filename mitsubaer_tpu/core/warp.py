"""Square -> distribution warps (reference: mitsuba/core/warp.{h,cpp}).

All functions are batched: `sample` is (..., 2) uniform in [0,1)^2, outputs
are (..., 3) directions (local frame, +z up) or (..., 2) points, plus pdfs.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import INV_FOURPI, INV_PI, INV_TWOPI, safe_sqrt


def square_to_uniform_sphere(sample):
    z = 1.0 - 2.0 * sample[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf():
    return INV_FOURPI


def square_to_uniform_hemisphere(sample):
    z = sample[..., 0]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf():
    return INV_TWOPI


def square_to_cosine_hemisphere(sample):
    p = square_to_uniform_disk_concentric(sample)
    z = safe_sqrt(1.0 - p[..., 0] ** 2 - p[..., 1] ** 2)
    return jnp.stack([p[..., 0], p[..., 1], z], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return INV_PI * jnp.maximum(d[..., 2], 0.0)


def square_to_uniform_disk(sample):
    r = jnp.sqrt(sample[..., 0])
    phi = 2.0 * jnp.pi * sample[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric(sample):
    """Shirley-Chiu concentric disk mapping (warp.cpp:62)."""
    r1 = 2.0 * sample[..., 0] - 1.0
    r2 = 2.0 * sample[..., 1] - 1.0
    use_r1 = jnp.abs(r1) > jnp.abs(r2)
    r = jnp.where(use_r1, r1, r2)
    safe = jnp.where(r == 0.0, 1.0, r)
    phi = jnp.where(
        use_r1,
        (jnp.pi / 4.0) * (r2 / safe),
        (jnp.pi / 2.0) - (r1 / safe) * (jnp.pi / 4.0),
    )
    phi = jnp.where(r == 0.0, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_triangle(sample):
    """Barycentric warp (warp.cpp:88): returns (u, v) with u+v<=1."""
    a = safe_sqrt(1.0 - sample[..., 0])
    return jnp.stack([1.0 - a, a * sample[..., 1]], axis=-1)


def square_to_uniform_cone(cos_cutoff, sample):
    cos_theta = (1.0 - sample[..., 0]) + sample[..., 0] * cos_cutoff
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * sample[..., 1]
    return jnp.stack(
        [jnp.cos(phi) * sin_theta, jnp.sin(phi) * sin_theta, cos_theta], axis=-1
    )


def square_to_uniform_cone_pdf(cos_cutoff):
    return INV_TWOPI / (1.0 - cos_cutoff)


def square_to_hg(g, sample):
    """Henyey-Greenstein inverse-CDF sampling of cos(theta) about +z
    (reference: src/phase/hg.cpp:74-98). Returns direction relative to the
    *outgoing* convention used there (rotate with Frame(-wi) at call site)."""
    g = jnp.asarray(g)
    sqr_term = (1.0 - g * g) / (1.0 - g + 2.0 * g * sample[..., 0])
    cos_theta_aniso = (1.0 + g * g - sqr_term * sqr_term) / (2.0 * jnp.where(g == 0, 1.0, g))
    cos_theta = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * sample[..., 0], cos_theta_aniso)
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    phi = 2.0 * jnp.pi * sample[..., 1]
    return jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )


def hg_pdf(g, cos_theta):
    """HG phase value/pdf for the angle between wi and wo as dot(wi, wo)
    (reference hg.cpp:107: eval uses dot(pRec.wi, pRec.wo) where wi points
    toward the incoming source)."""
    temp = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g * g) / (temp * safe_sqrt(temp))
