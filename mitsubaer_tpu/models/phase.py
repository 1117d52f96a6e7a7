"""Phase functions: isotropic / HG / Rayleigh / vMF / HG-mixture /
Kajiya-Kay / microflake.

Reference: src/phase/{isotropic,hg,rayleigh,vmf,mixturephase,kkay,
microflake}.cpp with the PhaseFunction interface
(include/mitsuba/render/phase.h:117). The microflake model here uses a
vMF flake distribution about the medium's fiber axis (microflake_fiber.h's
exponential fiber distribution is approximated by a matched-concentration
vMF; the reference's per-voxel orientation volume reduces to the constant
axis case for its bundled scenes).

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
from ..scene.types import (
    PH_HG,
    PH_ISOTROPIC,
    PH_KKAY,
    PH_MICROFLAKE,
    PH_MIXTURE,
    PH_RAYLEIGH,
    PH_VMF,
    PhaseTable,
)


class PhaseSample(NamedTuple):
    wo: jnp.ndarray      # (N, 3) new propagation direction (world)
    pdf: jnp.ndarray     # (N,)
    weight: jnp.ndarray  # (N,) phase/pdf (= 1 for these models)


def _params(ph: PhaseTable, idx):
    i = jnp.clip(idx, 0, ph.kind.shape[0] - 1)
    return smalltab.take(ph.kind, i), smalltab.take(ph.g, i)


def _params_ext(ph: PhaseTable, idx):
    i = jnp.clip(idx, 0, ph.kind.shape[0] - 1)
    return (smalltab.take(ph.g2, i), smalltab.take(ph.mix, i),
            smalltab.take(ph.kappa, i), smalltab.take(ph.axis, i))


def _on(active, *ks):
    return active is None or any(k in active for k in ks)


def _kkay_value(wi, wo, axis, expn=4.0):
    """Kajiya-Kay fiber phase (kkay.cpp): diffuse sin(theta_o) + specular
    cos^p lobe about the mirrored-along-fiber direction; normalized so the
    diffuse part alone integrates to 1 over the sphere (pi^2/4 * sin)."""
    st_o = safe_sqrt(1.0 - dot(wo, axis) ** 2)
    diffuse = st_o / (jnp.pi * jnp.pi)  # ∫ sinθ dω = pi^2
    # specular: reflect wi about the fiber axis
    wr = 2.0 * dot(wi, axis, keepdims=True) * axis - wi
    # cos^p lobe integrates to 2pi/(p+1) over its hemisphere, so the
    # normalized lobe is (p+1)/(2pi) * cos^p (kkay.cpp quadrature-normalizes
    # numerically; this closed form matches for the lobe in isolation)
    spec = jnp.maximum(dot(wr, wo), 0.0) ** expn * (expn + 1.0) / (2.0 * jnp.pi)
    return 0.7 * diffuse + 0.3 * spec


def _eval_kinds(kind, g, cos_forward, ph=None, idx=None, wi=None, wo=None,
                active=None, axis_override=None):
    """cos_forward = dot(wi_prop, wo_prop); +1 = straight ahead."""
    v_iso = jnp.full_like(cos_forward, INV_FOURPI)
    # hg.cpp:107 with wi negated: (1-g^2) / (1+g^2-2g cos)^(3/2) / 4pi
    v_hg = warp.hg_pdf(g, -cos_forward)
    out = jnp.where(kind == PH_HG, v_hg, v_iso)
    if _on(active, PH_RAYLEIGH):
        v_ray = 3.0 / (16.0 * jnp.pi) * (1.0 + cos_forward * cos_forward)
        out = jnp.where(kind == PH_RAYLEIGH, v_ray, out)
    if ph is not None and _on(active, PH_MIXTURE, PH_VMF, PH_KKAY,
                              PH_MICROFLAKE):
        from ..core import special
        g2, mix, kappa, axis = _params_ext(ph, idx)
        if axis_override is not None:
            axis = axis_override
        if _on(active, PH_MIXTURE):
            v_mix = mix * v_hg + (1.0 - mix) * warp.hg_pdf(g2, -cos_forward)
            out = jnp.where(kind == PH_MIXTURE, v_mix, out)
        if _on(active, PH_VMF):
            v_vmf = special.vmf_pdf(cos_forward, kappa)
            out = jnp.where(kind == PH_VMF, v_vmf, out)
        if wi is not None and _on(active, PH_KKAY):
            v_kk = _kkay_value(wi, wo, axis)
            out = jnp.where(kind == PH_KKAY, v_kk, out)
        if wi is not None and _on(active, PH_MICROFLAKE):
            # microflake: vMF flakes about the fiber axis — scattering lobe
            # peaks in the specular-off-fiber cone; modeled as a vMF about
            # the fiber-mirrored direction mixed with isotropic
            wr = 2.0 * dot(wi, axis, keepdims=True) * axis - wi
            v_mf = 0.5 * special.vmf_pdf(dot(wr, wo), kappa) + 0.5 * INV_FOURPI
            out = jnp.where(kind == PH_MICROFLAKE, v_mf, out)
    return out


def eval(ph: PhaseTable, idx, wi, wo, active=None, axis_override=None):
    """Phase value (== pdf for these models). axis_override: per-lane local
    fiber/flake axis from an orientation field (heterogeneous.cpp:164),
    replacing the per-medium table axis."""
    kind, g = _params(ph, idx)
    return _eval_kinds(kind, g, dot(wi, wo), ph=ph, idx=idx, wi=wi, wo=wo,
                       active=active, axis_override=axis_override)


def pdf(ph: PhaseTable, idx, wi, wo, active=None, axis_override=None):
    return eval(ph, idx, wi, wo, active=active, axis_override=axis_override)


def sample(ph: PhaseTable, idx, wi, u2, active=None,
           axis_override=None) -> PhaseSample:
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

    if _on(active, PH_MIXTURE, PH_VMF, PH_KKAY, PH_MICROFLAKE):
        from ..core import special
        g2, mix, kappa, axis = _params_ext(ph, idx)
        if axis_override is not None:
            axis = axis_override
        if _on(active, PH_MIXTURE):
            # mixture: pick a lobe by rescaled u2[0]
            pick1 = u2[..., 0] < mix
            u0r = jnp.where(pick1, u2[..., 0] / jnp.maximum(mix, 1e-9),
                            (u2[..., 0] - mix) / jnp.maximum(1.0 - mix, 1e-9))
            u2m = jnp.stack([jnp.clip(u0r, 0.0, 0.9999994), u2[..., 1]], axis=-1)
            g_eff = jnp.where(pick1, g, g2)
            wo_mix = frame.to_world(warp.square_to_hg(g_eff, u2m))
            wo = jnp.where((kind == PH_MIXTURE)[..., None], wo_mix, wo)
        if _on(active, PH_VMF):
            wo_vmf = frame.to_world(
                special.vmf_sample(u2[..., 0], u2[..., 1], kappa))
            wo = jnp.where((kind == PH_VMF)[..., None], wo_vmf, wo)
        if _on(active, PH_MICROFLAKE):
            # microflake: 50/50 vMF-about-mirror / isotropic
            wr = 2.0 * dot(wi, axis, keepdims=True) * axis - wi
            wo_mf_lobe = Frame.from_normal(wr).to_world(
                special.vmf_sample(
                    jnp.clip(u2[..., 0] * 2.0 % 1.0, 0, 0.9999994),
                    u2[..., 1], kappa))
            wo_mf = jnp.where((u2[..., 0] < 0.5)[..., None], wo_mf_lobe, wo_iso)
            wo = jnp.where((kind == PH_MICROFLAKE)[..., None], wo_mf, wo)
        if _on(active, PH_KKAY):
            # kkay: sample via uniform sphere (weight = f/p)
            wo = jnp.where((kind == PH_KKAY)[..., None], wo_iso, wo)

    wo = jax.lax.stop_gradient(wo)
    p = _eval_kinds(kind, g, dot(wi, wo), ph=ph, idx=idx, wi=wi, wo=wo,
                    active=active, axis_override=axis_override)
    # weight == 1 in value; writing it as eval/stop(pdf) keeps the pathwise
    # derivative w.r.t. phase parameters (g) attached; the matching score
    # term is restored via the log-pdf surrogate in the integrator.
    weight = p / jnp.maximum(jax.lax.stop_gradient(p), 1e-12)
    # kkay samples uniformly: weight = f / (1/4pi); pdf is the sampling pdf
    is_kk = kind == PH_KKAY
    weight = jnp.where(is_kk, p / INV_FOURPI, weight)
    p = jnp.where(is_kk, INV_FOURPI, p)
    return PhaseSample(wo=wo, pdf=p, weight=weight)
