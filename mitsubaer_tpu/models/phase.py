"""Phase functions: isotropic / Henyey-Greenstein / Rayleigh.

Reference: src/phase/{isotropic,hg,rayleigh}.cpp with the PhaseFunction
interface (include/mitsuba/render/phase.h:117).

Convention here: both `wi` and `wo` are PROPAGATION directions (wi = the
direction the incident ray travels, wo = the new travel direction). The
reference instead passes wi pointing back toward the source
(volpath.cpp builds pRec with -ray.d); the two agree via wi -> -wi, and we
match hg.cpp numerically: for g > 0 the lobe peaks at wo == wi (forward
scattering), pdf == eval (perfect importance sampling, hg.cpp:98-110).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import smalltab, warp
from ..core.math import INV_FOURPI, Frame, dot, safe_sqrt
from ..scene.types import PH_HG, PH_ISOTROPIC, PH_RAYLEIGH, PhaseTable


class PhaseSample(NamedTuple):
    wo: jnp.ndarray      # (N, 3) new propagation direction (world)
    pdf: jnp.ndarray     # (N,)
    weight: jnp.ndarray  # (N,) phase/pdf (= 1 for these models)


def _params(ph: PhaseTable, idx):
    i = jnp.clip(idx, 0, ph.kind.shape[0] - 1)
    return smalltab.take(ph.kind, i), smalltab.take(ph.g, i)


def _eval_kinds(kind, g, cos_forward):
    """cos_forward = dot(wi_prop, wo_prop); +1 = straight ahead."""
    v_iso = jnp.full_like(cos_forward, INV_FOURPI)
    # hg.cpp:107 with wi negated: (1-g^2) / (1+g^2-2g cos)^(3/2) / 4pi
    v_hg = warp.hg_pdf(g, -cos_forward)
    v_ray = 3.0 / (16.0 * jnp.pi) * (1.0 + cos_forward * cos_forward)
    out = jnp.where(kind == PH_HG, v_hg, v_iso)
    out = jnp.where(kind == PH_RAYLEIGH, v_ray, out)
    return out


def eval(ph: PhaseTable, idx, wi, wo):
    """Phase value (== pdf for these models)."""
    kind, g = _params(ph, idx)
    return _eval_kinds(kind, g, dot(wi, wo))


def pdf(ph: PhaseTable, idx, wi, wo):
    return eval(ph, idx, wi, wo)


def sample(ph: PhaseTable, idx, wi, u2) -> PhaseSample:
    kind, g = _params(ph, idx)
    frame = Frame.from_normal(wi)

    # HG: cos(theta) about +wi with mean +g (forward for g > 0)
    wo_hg = frame.to_world(warp.square_to_hg(g, u2))

    wo_iso = warp.square_to_uniform_sphere(u2)

    # Rayleigh: inverse CDF of (3/8)(1+c^2)/2 via Cardano
    z = 2.0 * (2.0 * u2[..., 0] - 1.0)
    A = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    c_ray = A - 1.0 / A
    s_ray = safe_sqrt(1.0 - c_ray * c_ray)
    phi = 2.0 * jnp.pi * u2[..., 1]
    wo_ray = frame.to_world(
        jnp.stack([s_ray * jnp.cos(phi), s_ray * jnp.sin(phi), c_ray], axis=-1)
    )

    wo = jnp.where((kind == PH_HG)[..., None], wo_hg, wo_iso)
    wo = jnp.where((kind == PH_RAYLEIGH)[..., None], wo_ray, wo)
    wo = jax.lax.stop_gradient(wo)
    p = _eval_kinds(kind, g, dot(wi, wo))
    # weight == 1 in value; writing it as eval/stop(pdf) keeps the pathwise
    # derivative w.r.t. phase parameters (g) attached; the matching score
    # term is restored via the log-pdf surrogate in the integrator.
    weight = p / jnp.maximum(jax.lax.stop_gradient(p), 1e-12)
    return PhaseSample(wo=wo, pdf=p, weight=weight)
