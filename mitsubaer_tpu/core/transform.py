"""4x4 homogeneous transforms (reference: mitsuba/core/transform.{h,cpp}).

Transforms are plain (4,4) float32 arrays; application functions broadcast
over point batches. Scene loading composes these on the host (numpy), the
device only ever sees pre-composed matrices.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def identity():
    return np.eye(4, dtype=np.float32)


def translate(v):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = v
    return m


def scale(v):
    v = np.broadcast_to(np.asarray(v, np.float32), (3,))
    m = np.eye(4, dtype=np.float32)
    m[0, 0], m[1, 1], m[2, 2] = v
    return m


def rotate(axis, angle_deg):
    """Rotation about `axis` by `angle_deg` degrees (transform.cpp:218)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    s = np.sin(np.deg2rad(angle_deg))
    c = np.cos(np.deg2rad(angle_deg))
    x, y, z = axis
    K = np.array([[0, -z, y], [z, 0, -x], [-y, x, 0]])
    R = np.eye(3) + s * K + (1 - c) * (K @ K)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = R.astype(np.float32)
    return m


def look_at(origin, target, up):
    """Camera-to-world transform (transform.cpp:332 Transform::lookAt):
    +z looks from origin toward target, +y approx. up, left-handed frame as
    in Mitsuba (dir = normalize(target-origin), left = normalize(cross(up, dir)),
    newUp = cross(dir, left))."""
    origin = np.asarray(origin, np.float64)
    d = np.asarray(target, np.float64) - origin
    d = d / np.linalg.norm(d)
    up = np.asarray(up, np.float64)
    left = np.cross(up / np.linalg.norm(up), d)
    left = left / np.linalg.norm(left)
    new_up = np.cross(d, left)
    m = np.eye(4, dtype=np.float32)
    m[:3, 0] = left
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = origin
    return m


def compose(*mats):
    out = np.eye(4, dtype=np.float32)
    for m in mats:
        out = out @ np.asarray(m, np.float32)
    return out


def apply_point(m, p):
    """Apply (4,4) matrix to (..., 3) points."""
    m = jnp.asarray(m)
    r = p @ m[:3, :3].T + m[:3, 3]
    return r


def apply_vector(m, v):
    m = jnp.asarray(m)
    return v @ m[:3, :3].T


def apply_normal(m, n):
    """Normals transform by the inverse transpose."""
    m = jnp.asarray(m)
    inv = jnp.linalg.inv(m[:3, :3])
    return n @ inv
