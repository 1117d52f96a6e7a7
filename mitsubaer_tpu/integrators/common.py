"""Shared integrator machinery: contribution sinks (steady / transient /
bounce / CW-ToF), russian roulette, ray epsilons.

The contribution sink generalizes the reference's ImageBlock putSample with
decomposition (bdpt_wr.cpp, bdpt_proc.cpp:452-476): every light-path
contribution carries its optical path length and depth; depending on the
film decomposition it lands in the steady image, a time bin, a bounce bin,
or is weighted by the CW-ToF correlation function.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..scene.types import RenderConfig
from ..models import tof


class Sink(NamedTuple):
    steady: jnp.ndarray             # (N, 3)
    frames: Optional[jnp.ndarray]   # (HW, F, 3) or None
    pixel: Optional[jnp.ndarray]    # (N,) lane -> pixel index (for frames)


def new_sink(cfg: RenderConfig, n, pixel=None) -> Sink:
    frames = None
    if cfg.n_frames > 1:
        frames = jnp.zeros((cfg.height * cfg.width, cfg.n_frames, 3), jnp.float32)
    return Sink(steady=jnp.zeros((n, 3), jnp.float32), frames=frames, pixel=pixel)


def add_contribution(sink: Sink, cfg: RenderConfig, value, plen, depth, active,
                     log_p=None):
    """value: (N, 3); plen: (N,) optical path length; depth: (N,) int.

    log_p: attached log-density of the theta-dependent sampling decisions
    that produced this contribution (evaluated at the detached samples).
    When given, a zero-valued surrogate stop(value)*(log_p - stop(log_p)) is
    added so that d/dtheta recovers the score term E[W * dlog p] — together
    with the attached f/p weights this makes parameter gradients of the
    rendered image unbiased (differential path sampling)."""
    import jax

    # NaN firewall: a non-finite contribution carries no legitimate energy
    # (it is a numerical casualty on a masked/degenerate lane); dropping it
    # here keeps both the image and — critically — reverse-mode gradients
    # finite (NaN primals poison cotangents even under zero masks). The
    # reference instead traps FP exceptions in debug builds (MTS_DEBUG_FP).
    value = jnp.where(jnp.isfinite(value), value, 0.0)
    value = jnp.where(active[..., None], value, 0.0)
    if log_p is not None:
        score = (log_p - jax.lax.stop_gradient(log_p))[..., None]
        value = value + jax.lax.stop_gradient(value) * score
    if cfg.modulation != "none":
        w = tof.correlation_function(cfg, plen)
        return sink._replace(steady=sink.steady + value * w[..., None])
    if cfg.n_frames == 1:
        return sink._replace(steady=sink.steady + value)
    if cfg.decomposition == "bounce":
        key = depth.astype(jnp.float32)
    else:
        key = plen
    b = jnp.floor((key - cfg.min_bound) / cfg.bin_width).astype(jnp.int32)
    inside = (key >= cfg.min_bound) & (key < cfg.max_bound) & active
    b = jnp.clip(b, 0, cfg.n_frames - 1)
    frames = sink.frames.at[sink.pixel, b].add(
        jnp.where(inside[..., None], value, 0.0)
    )
    return sink._replace(frames=frames)


def russian_roulette(throughput, eta_scale, u, depth, cfg: RenderConfig):
    """Mitsuba-style RR (path.cpp:200-208): survive with
    q = min(max(throughput) * eta^2, 0.95) once depth >= rrDepth."""
    q = jnp.minimum(jnp.max(throughput, axis=-1) * eta_scale * eta_scale, 0.95)
    do_rr = depth >= cfg.rr_depth
    survive = jnp.where(do_rr, u < q, True)
    throughput = jnp.where(
        do_rr[..., None], throughput / jnp.maximum(q, 1e-6)[..., None], throughput
    )
    return throughput, survive


def scene_epsilon(scene):
    """Relative ray epsilon from scene extent (ShadowEpsilon analogue)."""
    diag = jnp.linalg.norm(scene.aabb_max - scene.aabb_min)
    return 1e-4 * jnp.maximum(diag, 1e-3)
