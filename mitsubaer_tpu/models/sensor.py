"""Sensors: perspective pinhole camera ray generation + film-point lookup.

Reference: src/sensors/perspective.cpp. Conventions match Mitsuba's lookAt
frame: camera space x = "left", y = up, z = viewing direction; film row 0 is
the top of the image and film x grows to the right, so image-left maps to
camera +x (see SURVEY cbox: red wall at world +x appears on image left).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math import dot, normalize
from ..core.transform import apply_point, apply_vector
from ..scene.types import Scene, Sensor


class CameraRays(NamedTuple):
    o: jnp.ndarray  # (N, 3)
    d: jnp.ndarray  # (N, 3)


def sample_rays(sensor: Sensor, px, py, width, height, u_lens=None,
                kind_hint: int | None = None) -> CameraRays:
    """px, py: continuous pixel coordinates in [0, W] x [0, H].
    u_lens: optional (N, 2) uniforms for aperture sampling (thin lens).
    kind_hint: static sensor kind (RenderConfig.sensor_kind) — jit then
    compiles ONLY that camera model instead of all nine branchlessly.

    Kinds (reference src/sensors/): perspective (perspective.cpp), thinlens
    (thinlens.cpp — aperture disk + focus plane), orthographic
    (orthographic.cpp), spherical lat-long (spherical.cpp), radiancemeter
    (radiancemeter.cpp — one ray along +z)."""
    from ..scene.types import (
        SENSOR_FLUENCEMETER,
        SENSOR_IRRADIANCEMETER,
        SENSOR_ORTHOGRAPHIC,
        SENSOR_PERSPECTIVE_RDIST,
        SENSOR_RADIANCEMETER,
        SENSOR_SPHERICAL,
        SENSOR_TELECENTRIC,
        SENSOR_THINLENS,
    )

    ndc_x = 2.0 * px / width - 1.0   # -1 at image left
    ndc_y = 2.0 * py / height - 1.0  # -1 at image top
    ones = jnp.ones_like(ndc_x)
    zeros = jnp.zeros_like(ndc_x)

    def on(*ks):
        return kind_hint is None or kind_hint in ks

    # perspective
    d_persp = jnp.stack(
        [-ndc_x * sensor.tan_x, -ndc_y * sensor.tan_y, ones], axis=-1
    )
    o_persp = jnp.zeros(d_persp.shape, d_persp.dtype)
    d_cam, o_cam = d_persp, o_persp
    kind = sensor.kind

    if on(SENSOR_THINLENS, SENSOR_TELECENTRIC):
        # thin lens: aperture-disk origin, aim at the focus plane
        if u_lens is None:
            u_lens = jnp.stack([ndc_x * 0 + 0.5, ndc_y * 0 + 0.5], axis=-1)
        from ..core.warp import square_to_uniform_disk_concentric

        lens = square_to_uniform_disk_concentric(u_lens) * sensor.aperture
        focus_p = d_persp * sensor.focus
        o_lens = jnp.stack([lens[..., 0], lens[..., 1], zeros], axis=-1)
        d_lens = focus_p - o_lens
        d_cam = jnp.where(kind == SENSOR_THINLENS, d_lens, d_cam)
        o_cam = jnp.where(kind == SENSOR_THINLENS, o_lens, o_cam)

    if on(SENSOR_ORTHOGRAPHIC, SENSOR_TELECENTRIC):
        # orthographic: parallel rays, tan_x acts as the half-extent
        o_ortho = jnp.stack(
            [-ndc_x * sensor.tan_x, -ndc_y * sensor.tan_y, zeros], axis=-1
        )
        d_ortho = jnp.stack([zeros, zeros, ones], axis=-1)
        d_cam = jnp.where(kind == SENSOR_ORTHOGRAPHIC, d_ortho, d_cam)
        o_cam = jnp.where(kind == SENSOR_ORTHOGRAPHIC, o_ortho, o_cam)

    if on(SENSOR_SPHERICAL):
        # spherical: full lat-long panorama
        phi = (1.0 - px / width) * 2.0 * jnp.pi
        theta = py / height * jnp.pi
        st = jnp.sin(theta)
        d_sph = jnp.stack(
            [st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)], axis=-1)
        d_cam = jnp.where(kind == SENSOR_SPHERICAL, d_sph, d_cam)

    if on(SENSOR_RADIANCEMETER):
        d_meter = jnp.stack([zeros, zeros, ones], axis=-1)
        d_cam = jnp.where(kind == SENSOR_RADIANCEMETER, d_meter, d_cam)

    if on(SENSOR_PERSPECTIVE_RDIST):
        # radial distortion (perspective_rdist.cpp): 1 + kc0 r^2 + kc1 r^4
        r2 = ndc_x * ndc_x + ndc_y * ndc_y
        dist = 1.0 + sensor.kc[0] * r2 + sensor.kc[1] * r2 * r2
        d_rdist = jnp.stack(
            [-ndc_x * dist * sensor.tan_x, -ndc_y * dist * sensor.tan_y, ones],
            axis=-1)
        d_cam = jnp.where(kind == SENSOR_PERSPECTIVE_RDIST, d_rdist, d_cam)

    if on(SENSOR_TELECENTRIC):
        # telecentric.cpp: ortho footprint + per-point thin lens
        o_tele = o_ortho + jnp.stack([lens[..., 0], lens[..., 1], zeros],
                                     axis=-1)
        d_tele = (o_ortho + jnp.stack([zeros, zeros, ones], axis=-1)
                  * sensor.focus) - o_tele
        d_cam = jnp.where(kind == SENSOR_TELECENTRIC, d_tele, d_cam)
        o_cam = jnp.where(kind == SENSOR_TELECENTRIC, o_tele, o_cam)

    if on(SENSOR_FLUENCEMETER, SENSOR_IRRADIANCEMETER):
        u_f = jnp.stack(
            [px / jnp.maximum(width, 1), py / jnp.maximum(height, 1)],
            axis=-1)

    if on(SENSOR_FLUENCEMETER):
        # fluencemeter.cpp: uniform-sphere rays from the origin
        from ..core.warp import square_to_uniform_sphere

        d_flu = square_to_uniform_sphere(u_f % 1.0)
        d_cam = jnp.where(kind == SENSOR_FLUENCEMETER, d_flu, d_cam)

    if on(SENSOR_IRRADIANCEMETER):
        # irradiancemeter.cpp: cosine rays from the unit patch
        from ..core.warp import square_to_cosine_hemisphere

        d_irr = square_to_cosine_hemisphere(u_f % 1.0)
        o_irr = jnp.stack([ndc_x, ndc_y, zeros], axis=-1)
        d_cam = jnp.where(kind == SENSOR_IRRADIANCEMETER, d_irr, d_cam)
        o_cam = jnp.where(kind == SENSOR_IRRADIANCEMETER, o_irr, o_cam)

    d = normalize(apply_vector(sensor.to_world, d_cam))
    o = apply_point(sensor.to_world, o_cam)
    return CameraRays(o=o, d=d)


class FilmSample(NamedTuple):
    px: jnp.ndarray       # pixel x (continuous)
    py: jnp.ndarray
    valid: jnp.ndarray    # inside frustum & in front
    inv_pixel_omega: jnp.ndarray  # 1 / (solid angle subtended by one pixel
    #   in this direction): converts a radiance integral over the pixel
    #   footprint into the mean-radiance pixel value the camera pass computes
    d: jnp.ndarray        # unit direction from world point toward the camera


def project(sensor: Sensor, p_world, width, height) -> FilmSample:
    """Project a world point to film coordinates (for light-image splatting /
    t=1 BDPT connections; reference perspective.cpp samplePosition inverse)."""
    # world -> camera: invert rigid transform
    R = sensor.to_world[:3, :3]
    t = sensor.to_world[:3, 3]
    p_cam = (p_world - t) @ R  # R^T applied from the right (R orthonormal)
    z = p_cam[..., 2]
    valid = z > jnp.maximum(sensor.near, 1e-6)
    inv_z = 1.0 / jnp.where(valid, z, 1.0)
    ndc_x = -p_cam[..., 0] * inv_z / sensor.tan_x
    ndc_y = -p_cam[..., 1] * inv_z / sensor.tan_y
    px = (ndc_x + 1.0) * 0.5 * width
    py = (ndc_y + 1.0) * 0.5 * height
    valid &= (px >= 0) & (px < width) & (py >= 0) & (py < height)

    to_cam = t - p_world
    dist2 = jnp.sum(to_cam * to_cam, axis=-1)
    d = to_cam * jax_rsqrt(dist2)[..., None]
    # solid angle of one pixel seen along this direction:
    #   Omega_pix = (4 tanx tany / (W H)) * cos^3(theta)
    cos_theta = dot(-d, normalize(apply_vector(sensor.to_world, jnp.array([0.0, 0.0, 1.0]))))
    A = 4.0 * sensor.tan_x * sensor.tan_y
    inv_omega = (width * height) / jnp.maximum(A * cos_theta ** 3, 1e-12)
    return FilmSample(px=px, py=py, valid=valid, inv_pixel_omega=inv_omega, d=d)


def jax_rsqrt(x):
    import jax

    return jax.lax.rsqrt(jnp.maximum(x, 1e-20))
