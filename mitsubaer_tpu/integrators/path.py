"""Surface path tracer with next-event estimation + MIS.

Reference: src/integrators/path/path.cpp (MIPathTracer). Same estimator
structure — emitter-hit MIS against direct sampling, NEE MIS against BSDF
sampling with the power heuristic, eta-aware russian roulette — recast as a
wavefront `lax.while_loop`: all lanes advance one bounce per iteration with
masked state, which keeps the whole batch inside one fused XLA program.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import smalltab
from ..core.math import Frame, dot, mis_weight_power, normalize
from ..models import bsdf as bsdf_m
from ..models import emitter as emitter_m
from ..models import texture as texture_m
from ..scene import intersect as isect
from ..scene.types import RenderConfig, Scene
from . import common


class _State(NamedTuple):
    o: jnp.ndarray
    d: jnp.ndarray
    throughput: jnp.ndarray
    sink: common.Sink
    active: jnp.ndarray
    depth: jnp.ndarray        # int32, starts at 1
    plen: jnp.ndarray         # accumulated (optical) path length
    eta_scale: jnp.ndarray
    last_pdf: jnp.ndarray     # pdf of the previous BSDF sample
    last_delta: jnp.ndarray   # previous bounce was a delta lobe
    sampler: tuple


def li(scene: Scene, cfg: RenderConfig, o, d, sampler, pixel=None):
    """Trace radiance along rays (o, d). Returns (sink, sampler)."""
    n = o.shape[0]
    eps = common.scene_epsilon(scene)
    sink = common.new_sink(cfg, n, pixel)

    state = _State(
        o=o,
        d=d,
        throughput=jnp.ones((n, 3), jnp.float32),
        sink=sink,
        active=jnp.ones((n,), bool),
        depth=jnp.ones((n,), jnp.int32),
        plen=jnp.zeros((n,), jnp.float32),
        eta_scale=jnp.ones((n,), jnp.float32),
        last_pdf=jnp.zeros((n,), jnp.float32),
        last_delta=jnp.ones((n,), bool),  # camera rays count as "specular"
        sampler=sampler,
    )

    def cond(s: _State):
        return jnp.any(s.active)

    def body(s: _State):
        smp = s.sampler
        hit = isect.intersect(scene.geo, s.o, s.d, jnp.full((n,), eps),
                              jnp.full((n,), isect.INF),
                              need_uv=cfg.has_textures)
        plen_at_hit = s.plen + jnp.where(hit.valid, hit.t, 0.0)

        # ----- escaped rays: environment -----
        escaped = s.active & ~hit.valid
        env = emitter_m.env_radiance(scene, s.d)
        env_pdf = emitter_m.pdf_direct_env(scene, s.d)
        w_env = jnp.where(s.last_delta, 1.0, mis_weight_power(s.last_pdf, env_pdf))
        hide = cfg.hide_emitters & (s.depth == 1)
        sink = common.add_contribution(
            s.sink, cfg, s.throughput * env * w_env[..., None], s.plen,
            s.depth, escaped & ~hide,
        )

        # ----- emitter hit -----
        shape_em = smalltab.take(scene.shapes.emitter, jnp.clip(hit.shape_id, 0, scene.shapes.emitter.shape[0] - 1))
        shape_em = jnp.where(hit.shape_id >= 0, shape_em, -1)
        hit_emitter = s.active & hit.valid & (shape_em >= 0)
        le = emitter_m.eval_hit(scene, shape_em, hit.ng, -s.d)
        lum_pdf = emitter_m.pdf_direct_hit(scene, shape_em, s.o, hit.p, hit.ng)
        w_hit = jnp.where(s.last_delta, 1.0, mis_weight_power(s.last_pdf, lum_pdf))
        sink = common.add_contribution(
            sink, cfg, s.throughput * le * w_hit[..., None], plen_at_hit,
            s.depth, hit_emitter & ~hide,
        )

        active = s.active & hit.valid & (s.depth < cfg.max_depth)

        # ----- local frame -----
        # flip shading normal to the incident side (two-sided shading for
        # diffuse walls; dielectric uses the signed cosine via the frame)
        ng = hit.ng
        bsdf_idx = smalltab.take(scene.shapes.bsdf, jnp.clip(hit.shape_id, 0, scene.shapes.bsdf.shape[0] - 1))
        bsdf_idx = jnp.where(hit.shape_id >= 0, bsdf_idx, -1)
        frame = Frame.from_normal(ng)
        # normal/bump-mapped shading frame (normalmap.cpp, bumpmap.cpp):
        # perturb in the UV-aligned tangent frame and rebuild the frame
        # around the world-space shading normal (cfg.has_normal_tex static)
        n_pert = texture_m.shading_normal(scene, bsdf_idx, hit.tex_uv,
                                          enabled=cfg.has_normal_tex)
        if n_pert is not None:
            tf_frame = texture_m.uv_tangent_frame(scene, hit)
            frame = Frame.from_normal(normalize(tf_frame.to_world(n_pert)))
        wi = frame.to_local(-s.d)
        act = cfg.bsdf_kinds or None
        rscale = texture_m.bsdf_refl_scale(scene, bsdf_idx, hit.tex_uv,
                                           hit.uv, enabled=cfg.has_textures)

        # ----- next-event estimation -----
        u2, smp = _next2(smp)
        u1, smp = _next1(smp)
        ds = emitter_m.sample_direct(scene, hit.p, u2, u1)
        wo_local = frame.to_local(ds.d)
        f_nee = bsdf_m.eval(scene.bsdfs, bsdf_idx, wi, wo_local,
                            refl_scale=rscale, active=act)
        bsdf_pdf_dir = bsdf_m.pdf(scene.bsdfs, bsdf_idx, wi, wo_local,
                                  refl_scale=rscale, active=act)
        vis_needed = active & (ds.pdf > 0) & jnp.any(f_nee > 0, axis=-1)
        shadow_o = hit.p + ds.d * eps
        blocked = isect.occluded(
            scene.geo, shadow_o, ds.d, jnp.full((n,), eps * 0.1), ds.dist - 2 * eps
        )
        w_nee = jnp.where(ds.delta, 1.0, mis_weight_power(ds.pdf, bsdf_pdf_dir))
        contrib = (
            s.throughput * f_nee * ds.value * (w_nee / jnp.maximum(ds.pdf, 1e-12))[..., None]
        )
        sink = common.add_contribution(
            sink, cfg, contrib, plen_at_hit + ds.dist, s.depth + 1,
            vis_needed & ~blocked,
        )

        # ----- BSDF sampling -----
        u2b, smp = _next2(smp)
        u1b, smp = _next1(smp)
        bs = bsdf_m.sample(scene.bsdfs, bsdf_idx, wi, u2b, u1b,
                           refl_scale=rscale, active=act)
        wo_world = frame.to_world(bs.wo)
        throughput = s.throughput * bs.weight
        dead = jnp.all(throughput <= 0, axis=-1)
        active = active & ~dead

        # ----- russian roulette -----
        eta_scale = s.eta_scale * bs.eta
        u_rr, smp = _next1(smp)
        throughput, survive = common.russian_roulette(
            throughput, eta_scale, u_rr, s.depth, cfg
        )
        active = active & survive

        new_o = hit.p + wo_world * eps
        return _State(
            o=jnp.where(active[..., None], new_o, s.o),
            d=jnp.where(active[..., None], wo_world, s.d),
            throughput=jnp.where(active[..., None], throughput, s.throughput),
            sink=sink,
            active=active,
            depth=jnp.where(active, s.depth + 1, s.depth),
            plen=jnp.where(active, plen_at_hit, s.plen),
            eta_scale=jnp.where(active, eta_scale, s.eta_scale),
            last_pdf=jnp.where(active, bs.pdf, s.last_pdf),
            last_delta=jnp.where(active, bs.delta, s.last_delta),
            sampler=smp,
        )

    final = jax.lax.while_loop(cond, body, state)
    return final.sink, final.sampler


def _next1(smp):
    from ..core import rng

    return rng.next_1d(smp)


def _next2(smp):
    from ..core import rng

    return rng.next_2d(smp)
