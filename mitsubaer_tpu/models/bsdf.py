"""BSDF models, tagged-union dispatch over a parameter table.

Reference: include/mitsuba/render/bsdf.h:215 + src/bsdfs/*.cpp. Conventions
match Mitsuba: directions live in the local shading frame (+z = normal),
`wi` points toward the camera/previous vertex, `eval` returns f * |cos(wo)|,
`pdf` is a solid-angle density, `sample` returns weight = f*cos/pdf. Delta
lobes eval/pdf to zero and set the `delta` flag (integrators use it to skip
MIS). The h-dielectric (hdielectric.cpp:115) takes its IOR per-lane from the
RIF via `eta_override`.

Every lobe is evaluated branchlessly for the whole wavefront and selected by
the per-lane `kind` — with O(10) BSDF types this trades a few VPU flops for
zero divergence, the right trade on TPU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import smalltab, warp
from ..core.math import (
    INV_PI,
    abs_cos_theta,
    cos_theta,
    dot,
    fresnel_conductor,
    fresnel_dielectric,
    normalize,
    reflect_local,
    safe_sqrt,
)
from ..scene.types import (
    BSDF_CONDUCTOR,
    BSDF_DIELECTRIC,
    BSDF_DIFFUSE,
    BSDF_HDIELECTRIC,
    BSDF_MIRROR,
    BSDF_NULL,
    BSDF_PHONG,
    BSDF_PLASTIC,
    BSDF_ROUGHCONDUCTOR,
    BSDF_THINDIELECTRIC,
    BSDFs,
)


class BSDFSample(NamedTuple):
    wo: jnp.ndarray       # (N, 3) sampled outgoing direction (local frame)
    weight: jnp.ndarray   # (N, 3) f * cos / pdf
    pdf: jnp.ndarray      # (N,) solid-angle pdf (discrete prob for delta)
    delta: jnp.ndarray    # (N,) bool: sampled lobe is a Dirac delta
    eta: jnp.ndarray      # (N,) relative IOR of the sampled event (1 = none)
    null_passthrough: jnp.ndarray  # (N,) bool: null transmission event


def _params(bs: BSDFs, idx):
    i = jnp.clip(idx, 0, bs.kind.shape[0] - 1)
    take = lambda a: smalltab.take(a, i)
    return (
        jnp.where(idx >= 0, take(bs.kind), BSDF_NULL),
        take(bs.reflectance),
        take(bs.specular_r),
        take(bs.specular_t),
        take(bs.eta),
        take(bs.cond_eta),
        take(bs.cond_k),
        take(bs.alpha),
        take(bs.exponent),
    )


# --------------------------------------------------------------------------
# Microfacet helpers (GGX) — src/libcore microfacet.h analogue
# --------------------------------------------------------------------------
def _ggx_d(m, alpha):
    ct = cos_theta(m)
    ct2 = ct * ct
    a2 = alpha * alpha
    denom = jnp.pi * (ct2 * (a2 - 1.0) + 1.0) ** 2
    return jnp.where(ct > 0, a2 / jnp.maximum(denom, 1e-20), 0.0)


def _ggx_g1(v, m, alpha):
    ct = cos_theta(v)
    tan2 = jnp.maximum(1.0 - ct * ct, 0.0) / jnp.maximum(ct * ct, 1e-12)
    same_side = dot(v, m) * ct > 0
    lam = 0.5 * (-1.0 + jnp.sqrt(1.0 + alpha * alpha * tan2))
    return jnp.where(same_side, 1.0 / (1.0 + lam), 0.0)


def _ggx_sample(alpha, u):
    ct = 1.0 / jnp.sqrt(1.0 + alpha * alpha * u[..., 0] / jnp.maximum(1.0 - u[..., 0], 1e-9))
    st = safe_sqrt(1.0 - ct * ct)
    phi = 2.0 * jnp.pi * u[..., 1]
    return jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)


def _ggx_pdf_m(m, alpha):
    return _ggx_d(m, alpha) * jnp.maximum(cos_theta(m), 0.0)


# --------------------------------------------------------------------------
# eval / pdf (smooth lobes only)
# --------------------------------------------------------------------------
def eval(bs: BSDFs, idx, wi, wo, eta_override=None):
    kind, refl, spec_r, _, eta, ceta, ck, alpha, expn = _params(bs, idx)
    ci, co = cos_theta(wi), cos_theta(wo)
    front = (ci > 0) & (co > 0)

    f_diffuse = refl * (INV_PI * jnp.maximum(co, 0.0))[..., None]

    # plastic: diffuse part attenuated by (1-Fi)(1-Fo) with internal
    # scattering approximation omitted -> matches "nonlinear=false" plastic
    Fi, _ = fresnel_dielectric(ci, eta)
    Fo, _ = fresnel_dielectric(co, eta)
    f_plastic = refl * ((1.0 - Fi) * (1.0 - Fo) * INV_PI * jnp.maximum(co, 0.0))[..., None]

    # rough conductor (GGX)
    m = normalize(wi + wo)
    m = jnp.where((ci < 0)[..., None], -m, m)
    D = _ggx_d(m, alpha)
    G = _ggx_g1(wi, m, alpha) * _ggx_g1(wo, m, alpha)
    Fc = fresnel_conductor(dot(wi, m), ceta, ck)
    f_roughcond = spec_r * Fc * (D * G / jnp.maximum(4.0 * jnp.abs(ci), 1e-12))[..., None]
    # note: f*cos = spec * F * D*G / (4 |ci| |co|) * |co|

    # phong: (N+2)/2pi * spec * cos^N(alpha_r) + diffuse
    wr = reflect_local(wi)
    cos_r = jnp.maximum(dot(wr, wo), 0.0)
    f_phong = (
        refl * (INV_PI * jnp.maximum(co, 0.0))[..., None]
        + spec_r * ((expn + 2.0) / (2.0 * jnp.pi) * cos_r ** expn * jnp.maximum(co, 0.0))[..., None]
    )

    zero = jnp.zeros_like(f_diffuse)
    out = jnp.where((kind == BSDF_DIFFUSE)[..., None], f_diffuse, zero)
    out = jnp.where((kind == BSDF_PLASTIC)[..., None], f_plastic, out)
    out = jnp.where((kind == BSDF_ROUGHCONDUCTOR)[..., None], f_roughcond, out)
    out = jnp.where((kind == BSDF_PHONG)[..., None], f_phong, out)
    return jnp.where(front[..., None], out, zero)


def pdf(bs: BSDFs, idx, wi, wo, eta_override=None):
    kind, refl, spec_r, _, eta, ceta, ck, alpha, expn = _params(bs, idx)
    ci, co = cos_theta(wi), cos_theta(wo)
    front = (ci > 0) & (co > 0)

    p_cos = warp.square_to_cosine_hemisphere_pdf(wo)

    m = normalize(wi + wo)
    m = jnp.where((ci < 0)[..., None], -m, m)
    p_rough = _ggx_pdf_m(m, alpha) / jnp.maximum(4.0 * jnp.abs(dot(wo, m)), 1e-12)

    # plastic samples specular with prob F(ci): pdf of diffuse part
    Fi, _ = fresnel_dielectric(ci, eta)
    p_plastic = (1.0 - Fi) * p_cos

    wr = reflect_local(wi)
    cos_r = jnp.maximum(dot(wr, wo), 0.0)
    p_phong_spec = (expn + 1.0) / (2.0 * jnp.pi) * cos_r ** expn
    spec_w = jnp.max(spec_r, axis=-1) / jnp.maximum(
        jnp.max(spec_r, axis=-1) + jnp.max(refl, axis=-1), 1e-12
    )
    p_phong = spec_w * p_phong_spec + (1.0 - spec_w) * p_cos

    out = jnp.where(kind == BSDF_DIFFUSE, p_cos, 0.0)
    out = jnp.where(kind == BSDF_PLASTIC, p_plastic, out)
    out = jnp.where(kind == BSDF_ROUGHCONDUCTOR, p_rough, out)
    out = jnp.where(kind == BSDF_PHONG, p_phong, out)
    return jnp.where(front, out, 0.0)


# --------------------------------------------------------------------------
# sample
# --------------------------------------------------------------------------
def sample(bs: BSDFs, idx, wi, u2, u1, eta_override=None) -> BSDFSample:
    """Sample all lobes branchlessly and select by kind.

    u2: (N, 2) for direction, u1: (N,) for lobe selection."""
    kind, refl, spec_r, spec_t, eta, ceta, ck, alpha, expn = _params(bs, idx)
    if eta_override is not None:
        eta = jnp.where(kind == BSDF_HDIELECTRIC, eta_override, eta)
    ci = cos_theta(wi)
    n = wi.shape[0]
    ones3 = jnp.ones((n, 3), jnp.float32)

    # ---- diffuse ----
    wo_diff = warp.square_to_cosine_hemisphere(u2)
    wo_diff = jnp.where((ci < 0)[..., None], -wo_diff, wo_diff)  # reflect to wi side
    pdf_diff = warp.square_to_cosine_hemisphere_pdf(jnp.abs(wo_diff))
    w_diff = refl

    # ---- smooth dielectric (dielectric.cpp) ----
    F, cos_t = fresnel_dielectric(ci, eta)
    reflect_choice = u1 < F
    wo_refl = reflect_local(wi)
    eta_rel = jnp.where(ci > 0, eta, 1.0 / eta)
    # refracted direction in local frame: scaled tangential + cos_t on z
    scale_t = 1.0 / eta_rel
    wo_refr = jnp.stack(
        [-wi[..., 0] * scale_t, -wi[..., 1] * scale_t, cos_t], axis=-1
    )
    wo_refr = normalize(wo_refr)
    # radiance scaling for transmission: 1/eta_rel^2 (radiance compression)
    w_trans = spec_t * (scale_t * scale_t)[..., None]
    wo_diel = jnp.where(reflect_choice[..., None], wo_refl, wo_refr)
    w_diel = jnp.where(reflect_choice[..., None], spec_r, w_trans)
    pdf_diel = jnp.where(reflect_choice, F, 1.0 - F)
    eta_diel = jnp.where(reflect_choice, 1.0, eta_rel)

    # ---- thin dielectric (thindielectric.cpp): interaction with both faces,
    # transmission leaves direction unchanged ----
    R = jnp.where(F < 1.0, F * 2.0 / (1.0 + F), 1.0)
    thin_reflect = u1 < R
    wo_thin = jnp.where(thin_reflect[..., None], wo_refl, -wi)
    w_thin = jnp.where(thin_reflect[..., None], spec_r, spec_t)
    pdf_thin = jnp.where(thin_reflect, R, 1.0 - R)

    # ---- conductor / mirror ----
    Fc = fresnel_conductor(ci, ceta, ck)
    w_cond = spec_r * Fc
    w_mirror = spec_r

    # ---- null (medium boundary passthrough) ----
    wo_null = -wi
    w_null = ones3

    # ---- plastic: specular w.p. F, else cosine diffuse ----
    spec_choice = u1 < F
    wo_plastic = jnp.where(spec_choice[..., None], wo_refl, wo_diff)
    w_plastic = jnp.where(
        spec_choice[..., None],
        spec_r,
        refl * ((1.0 - fresnel_dielectric(cos_theta(wo_diff), eta)[0]) / jnp.maximum(1.0 - F, 1e-6))[..., None],
    )
    pdf_plastic = jnp.where(spec_choice, F, (1.0 - F) * pdf_diff)

    # ---- rough conductor (GGX) ----
    m = _ggx_sample(alpha, u2)
    m = jnp.where((ci < 0)[..., None], -m, m)
    wo_rough = 2.0 * dot(wi, m, keepdims=True) * m - wi
    pdf_m = _ggx_pdf_m(jnp.abs(m), alpha)
    pdf_rough = pdf_m / jnp.maximum(4.0 * jnp.abs(dot(wi, m)), 1e-12)
    G = _ggx_g1(wi, m, alpha) * _ggx_g1(wo_rough, m, alpha)
    Fcr = fresnel_conductor(dot(wi, m), ceta, ck)
    # weight = F * G * dot(wi, m) / (ci * cos_m) (Walter et al.)
    w_rough = spec_r * Fcr * jnp.where(
        (cos_theta(wo_rough) * ci > 0),
        G * jnp.abs(dot(wi, m)) / jnp.maximum(jnp.abs(ci) * jnp.abs(cos_theta(m)), 1e-12),
        0.0,
    )[..., None]

    # ---- phong ----
    spec_w = jnp.max(spec_r, axis=-1) / jnp.maximum(
        jnp.max(spec_r, axis=-1) + jnp.max(refl, axis=-1), 1e-12
    )
    phong_spec = u1 < spec_w
    wr = reflect_local(wi)
    # sample cos^n lobe around wr
    ct_lobe = u2[..., 0] ** (1.0 / (expn + 1.0))
    st_lobe = safe_sqrt(1.0 - ct_lobe * ct_lobe)
    phi = 2.0 * jnp.pi * u2[..., 1]
    lobe_local = jnp.stack(
        [st_lobe * jnp.cos(phi), st_lobe * jnp.sin(phi), ct_lobe], axis=-1
    )
    from ..core.math import Frame

    wo_ph_spec = Frame.from_normal(wr).to_world(lobe_local)
    wo_phong = jnp.where(phong_spec[..., None], wo_ph_spec, wo_diff)
    f_ph = eval(bs, idx, wi, wo_phong)
    p_ph = pdf(bs, idx, wi, wo_phong)
    w_phong = f_ph / jnp.maximum(p_ph, 1e-12)[..., None]

    # ---- select by kind ----
    def sel(vals):
        out = vals[BSDF_DIFFUSE]
        for k, v in vals.items():
            if k == BSDF_DIFFUSE:
                continue
            cond = kind == k
            out = jnp.where(
                cond[..., None] if v.ndim == out.ndim and out.ndim == 2 else cond, v, out
            )
        return out

    wo = sel({
        BSDF_DIFFUSE: wo_diff, BSDF_DIELECTRIC: wo_diel,
        BSDF_HDIELECTRIC: wo_diel, BSDF_THINDIELECTRIC: wo_thin,
        BSDF_CONDUCTOR: wo_refl, BSDF_MIRROR: wo_refl, BSDF_NULL: wo_null,
        BSDF_PLASTIC: wo_plastic, BSDF_ROUGHCONDUCTOR: wo_rough,
        BSDF_PHONG: wo_phong,
    })
    weight = sel({
        BSDF_DIFFUSE: w_diff, BSDF_DIELECTRIC: w_diel,
        BSDF_HDIELECTRIC: w_diel, BSDF_THINDIELECTRIC: w_thin,
        BSDF_CONDUCTOR: w_cond, BSDF_MIRROR: w_mirror, BSDF_NULL: w_null,
        BSDF_PLASTIC: w_plastic, BSDF_ROUGHCONDUCTOR: w_rough,
        BSDF_PHONG: w_phong,
    })
    pdf_out = sel({
        BSDF_DIFFUSE: pdf_diff, BSDF_DIELECTRIC: pdf_diel,
        BSDF_HDIELECTRIC: pdf_diel, BSDF_THINDIELECTRIC: pdf_thin,
        BSDF_CONDUCTOR: jnp.ones_like(ci), BSDF_MIRROR: jnp.ones_like(ci),
        BSDF_NULL: jnp.ones_like(ci), BSDF_PLASTIC: pdf_plastic,
        BSDF_ROUGHCONDUCTOR: pdf_rough, BSDF_PHONG: p_ph,
    })
    delta_kinds = (
        (kind == BSDF_DIELECTRIC) | (kind == BSDF_HDIELECTRIC)
        | (kind == BSDF_THINDIELECTRIC) | (kind == BSDF_CONDUCTOR)
        | (kind == BSDF_MIRROR) | (kind == BSDF_NULL)
    )
    delta = delta_kinds | ((kind == BSDF_PLASTIC) & spec_choice)
    eta_out = jnp.where(
        ((kind == BSDF_DIELECTRIC) | (kind == BSDF_HDIELECTRIC)) & ~reflect_choice,
        eta_diel,
        1.0,
    )
    null_pass = kind == BSDF_NULL

    # invalid sample (zero weight) handling
    bad = jnp.all(weight == 0.0, axis=-1) | (pdf_out <= 0.0)
    weight = jnp.where(bad[..., None], 0.0, weight)
    return BSDFSample(
        wo=wo, weight=weight, pdf=pdf_out, delta=delta, eta=eta_out,
        null_passthrough=null_pass,
    )
