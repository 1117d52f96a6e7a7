"""Beam radiance estimate (BRE) volumetric photon mapping.

Reference: src/integrators/photonmapper/bre.cpp — the reference builds a
BeamRadianceEstimator over the volume photon map (per-photon radii from a
kNN pass, then each camera ray accumulates every photon disc it pierces,
weighted by transmittance to the disc). TPU-native redesign:

* Volume photons are traced with the same distance-sampling machinery the
  path tracers use (medium.cpp analogues in models/medium.py) and binned
  into the sorted uniform hash grid of integrators/photonmap.py — no
  kd-tree, no per-photon radii (fixed gather radius, the hash-grid cell).
* The beam query is evaluated by STRATIFIED QUADRATURE along the
  in-medium segment: M jittered points t_j, each performing a bounded
  27-cell gather with the 3D kernel and the segment transmittance
  Tr(0->t_j). In expectation over the jitter this equals the beam
  integral of the same kernel density estimate that bre.cpp accumulates
  photon-by-photon (the kernel is smoothed along t by the stratification
  — the standard consistency class of photon beam estimators), while
  every lane does identical bounded work.
* Heterogeneous transmittance along the camera beam uses fixed-step
  quadrature of the density (the same deterministic approximation the
  reference's Simpson-rule evalTransmittance performs,
  heterogeneous.cpp:264) — BRE is a consistent-biased estimator already.

Surface radiance (emitter hits + diffuse photon gather) reuses the
surface photon map of integrators/photonmap.py, matching how the
reference's volumetric photonmapper wraps the BRE.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng, smalltab
from ..core.math import Frame, dot
from ..models import bsdf as bsdf_m
from ..models import emitter as emitter_m
from ..models import medium as medium_m
from ..models import phase as phase_m
from ..models import sensor as sensor_m
from ..scene import intersect as isect
from ..scene.types import (
    BSDF_DIFFUSE,
    MED_HETEROGENEOUS,
    MED_HOMOGENEOUS,
    RenderConfig,
    Scene,
)
from . import common
from .photonmap import PhotonMap, gather_radiance, trace_photons
from .ptracer import _sample_emitter_ray
from .volpath import _is_null_surface, _shape_tables


def _build_map(pos, power, wi, ok, lo, hi, radius):
    res = 64
    extent = jnp.max(hi - lo)
    cell = jnp.maximum(jnp.asarray(radius, jnp.float32), extent / res)
    ci = jnp.clip(((pos - lo) / cell).astype(jnp.int32), 0, res - 1)
    cell_id = (ci[:, 2] * res + ci[:, 1]) * res + ci[:, 0]
    cell_id = jnp.where(ok, cell_id, res * res * res)
    order = jnp.argsort(cell_id)
    return PhotonMap(pos=pos[order], power=power[order], wi=wi[order],
                     valid=ok[order], cell_of=cell_id[order],
                     grid_min=lo, cell_size=cell, res=res)


def trace_volume_photons(scene: Scene, cfg: RenderConfig, n: int, seed,
                         pass_idx, radius, max_bounce: int = 8):
    """Trace light particles through media; deposit a volume photon at
    every medium scatter event (power = arriving throughput, the Jensen
    convention: the gather supplies the phase function and the sigma_s
    cancels against the in-scattering integral)."""
    eps = common.scene_epsilon(scene)
    act = cfg.bsdf_kinds or None
    pact = cfg.phase_kinds or None
    bricks = medium_m.DensityBricks(scene.media)
    smp = rng.make_sampler(jnp.asarray(seed, jnp.uint32) ^ jnp.uint32(0xBBE),
                           jnp.arange(n, dtype=jnp.uint32), pass_idx)
    o, d, tp, med, _, _, smp, _, _ = _sample_emitter_ray(scene, smp)
    alive = jnp.any(tp > 0, axis=-1)

    P_pos, P_pow, P_wi, P_ok = [], [], [], []
    for _b in range(max_bounce):
        hit = isect.intersect(scene.geo, o, d, jnp.full((n,), eps),
                              jnp.full((n,), isect.INF))
        _, t_scene = isect.ray_aabb(o, d, scene.aabb_min, scene.aabb_max)
        t_max = jnp.where(hit.valid, hit.t, jnp.maximum(t_scene, 0.0))
        kind, sa, ss, sw, scale = medium_m.params(scene.media, med)
        in_hom = alive & (kind == MED_HOMOGENEOUS)
        in_het = alive & (kind == MED_HETEROGENEOUS)
        u1, smp = rng.next_1d(smp)
        uc, smp = rng.next_1d(smp)
        hs, ht, hw, _ = medium_m.sample_distance_homogeneous(
            sa, ss, sw, t_max, u1, uc)
        wh, wt, ww, _, smp, _ = medium_m.sample_distance_woodcock(
            scene.media, sa, ss, scale, o, d, t_max, smp, in_het,
            bricks=bricks)
        scat = jnp.where(in_het, wh, in_hom & hs)
        t_ev = jnp.where(in_het, wt, jnp.where(in_hom, ht, t_max))
        w_ev = jnp.where(in_het[..., None], ww,
                         jnp.where(in_hom[..., None], hw, 1.0))

        # deposit at medium scatters (power BEFORE the event weight)
        m_p = o + t_ev[..., None] * d
        dep = alive & scat
        P_pos.append(m_p)
        P_pow.append(jnp.where(dep[..., None], tp, 0.0))
        P_wi.append(d)
        P_ok.append(dep)

        tp = tp * jnp.where(alive[..., None], w_ev, 1.0)

        # continue: phase sample at scatters, surface event otherwise
        u2, smp = rng.next_2d(smp)
        u1b, smp = rng.next_1d(smp)
        ps = phase_m.sample(scene.media.phase, med, d, u2, active=pact)
        b_idx, _, m_in, m_ex = _shape_tables(scene, hit.shape_id)
        is_null = _is_null_surface(scene, b_idx)
        on_surface = alive & ~scat & hit.valid
        frame = Frame.from_normal(hit.ng)
        bs = bsdf_m.sample(scene.bsdfs, b_idx, frame.to_local(-d), u2, u1b,
                           active=act)
        d_srf = jnp.where(is_null[..., None], d, frame.to_world(bs.wo))
        w_srf = jnp.where(is_null[..., None], 1.0, bs.weight)
        new_d = jnp.where(scat[..., None], ps.wo, d_srf)
        tp = tp * jnp.where(scat[..., None], ps.weight[..., None],
                            jnp.where(on_surface[..., None], w_srf, 1.0))
        entering = dot(new_d, hit.ng) < 0
        cross = on_surface & (
            is_null | (dot(new_d, hit.ng) * dot(-d, hit.ng) < 0))
        med = jnp.where(cross, jnp.where(entering, m_in, m_ex), med)
        vtx = jnp.where(scat[..., None], m_p, hit.p)
        o = vtx + new_d * eps
        d = new_d
        u_rr, smp = rng.next_1d(smp)
        tp_rr, survive = common.russian_roulette(
            tp, jnp.ones((n,)), u_rr, jnp.full((n,), _b + 1), cfg)
        keep_rr = survive | is_null
        tp = jnp.where(scat[..., None], tp, tp_rr)
        alive = (scat | on_surface) & jnp.any(tp > 0, -1) \
            & (scat | keep_rr)

    pos = jnp.concatenate(P_pos)
    power = jnp.concatenate(P_pow)
    wi = jnp.concatenate(P_wi)
    ok = jnp.concatenate(P_ok)
    return _build_map(pos, power, wi, ok, scene.aabb_min, scene.aabb_max,
                      radius)


def gather_beam(pm: PhotonMap, scene, med, x, w_out, radius,
                n_emitted, pact, max_per_cell: int = 16):
    """In-scattered radiance estimate at points x toward w_out:
    sum_p phase(wi_p -> w_out) * power_p / (4/3 pi r^3 N).

    The 27-neighbor x per-cell-budget loops run as lax.scan/fori_loop
    (compile-size: the fully unrolled form emits ~430 gather ops per
    call site and made the bre pass pathological to compile)."""
    res = pm.res
    ci = ((x - pm.grid_min) / pm.cell_size).astype(jnp.int32)
    r2 = radius * radius
    M = pm.cell_of.shape[0]
    offs = jnp.asarray([[dx, dy, dz]
                        for dz in (-1, 0, 1)
                        for dy in (-1, 0, 1)
                        for dx in (-1, 0, 1)], jnp.int32)

    def cell_body(total, off):
        cc = ci + off
        inb = jnp.all((cc >= 0) & (cc < res), axis=-1)
        cid = (cc[:, 2] * res + cc[:, 1]) * res + cc[:, 0]
        cid = jnp.where(inb, cid, res * res * res)
        start = jnp.searchsorted(pm.cell_of, cid)

        def k_body(k, tot):
            j = jnp.minimum(start + k, M - 1)
            in_cell = (jnp.take(pm.cell_of, j) == cid) & inb
            pj = jnp.take(pm.pos, j, axis=0)
            d2 = jnp.sum((pj - x) ** 2, axis=-1)
            wp = jnp.take(pm.wi, j, axis=0)
            rho = phase_m.eval(scene.media.phase, med, wp, w_out,
                              active=pact)
            sel = in_cell & (d2 < r2)
            return tot + jnp.where(
                sel[..., None],
                jnp.take(pm.power, j, axis=0) * rho[..., None], 0.0)

        return jax.lax.fori_loop(0, max_per_cell, k_body, total), None

    total, _ = jax.lax.scan(cell_body, jnp.zeros_like(x), offs)
    vol = (4.0 / 3.0) * jnp.pi * r2 * radius
    return total / (vol * n_emitted)


def _segment_tau(scene, bricks, med, o, d, seg, n_steps: int = 16):
    """Deterministic optical depth along [0, seg]: analytic for homogeneous,
    midpoint quadrature of the density grid for heterogeneous. Returns
    (tau at the k/n_steps prefix points (n, n_steps+1, 3), tau_total)."""
    kind, sa, ss, _, scale = medium_m.params(scene.media, med)
    st = sa + ss
    ts = jnp.linspace(0.0, 1.0, n_steps + 1)[None, :] * seg[:, None]
    mid = 0.5 * (ts[:, 1:] + ts[:, :-1])
    p_mid = o[:, None, :] + mid[..., None] * d[:, None, :]
    dens = bricks.lookup(p_mid.reshape(-1, 3)).reshape(mid.shape) \
        * scale[:, None]
    dt = (ts[:, 1:] - ts[:, :-1])
    dtau_het = dens * dt                         # (n, S) scalar density
    cum_het = jnp.concatenate(
        [jnp.zeros_like(ts[:, :1]), jnp.cumsum(dtau_het, axis=1)], axis=1)
    is_het = (kind == MED_HETEROGENEOUS)[:, None, None]
    is_hom = (kind == MED_HOMOGENEOUS)[:, None, None]
    tau = jnp.where(is_het, cum_het[..., None] * st[:, None, :],
                    jnp.where(is_hom, ts[..., None] * st[:, None, :], 0.0))
    return ts, tau


@functools.partial(jax.jit, static_argnames=("cfg", "n_photons"),
                   keep_unused=True)
def _bre_pass(scene: Scene, cfg: RenderConfig, n_photons: int, seed,
              pass_idx, radius):
    H, W = cfg.height, cfg.width
    npix = H * W
    eps = common.scene_epsilon(scene)
    act = cfg.bsdf_kinds or None
    pact = cfg.phase_kinds or None
    bricks = medium_m.DensityBricks(scene.media)
    vol_pm = trace_volume_photons(scene, cfg, n_photons, seed, pass_idx,
                                  radius)
    srf_pm = trace_photons(scene, cfg, n_photons, seed, pass_idx, radius)

    pixel = jnp.arange(npix, dtype=jnp.uint32)
    smp = rng.make_sampler(seed, pixel, pass_idx, n_samples=max(cfg.spp, 1))
    jit2, smp = rng.next_2d(smp)
    px = (pixel % W).astype(jnp.float32) + jit2[:, 0]
    py = (pixel // W).astype(jnp.float32) + jit2[:, 1]
    rays = sensor_m.sample_rays(scene.sensor, px, py, W, H)
    o, d = rays.o, rays.d
    med = jnp.broadcast_to(scene.camera_medium, (npix,)).astype(jnp.int32)

    tp = jnp.ones((npix, 3), jnp.float32)
    L = jnp.zeros((npix, 3), jnp.float32)
    alive = jnp.ones((npix,), bool)
    hit_p = jnp.zeros((npix, 3))
    hit_n = jnp.zeros((npix, 3))
    hit_refl = jnp.zeros((npix, 3))
    found = jnp.zeros((npix,), bool)
    M_BEAM = 8   # stratified beam-quadrature points per segment

    for bounce in range(4):
        hit = isect.intersect(scene.geo, o, d, jnp.full((npix,), eps),
                              jnp.full((npix,), isect.INF))
        _, t_scene = isect.ray_aabb(o, d, scene.aabb_min, scene.aabb_max)
        seg = jnp.where(hit.valid, hit.t, jnp.maximum(t_scene, 0.0))
        kind, _, _, _, _ = medium_m.params(scene.media, med)
        in_med = alive & (kind >= 0) & (kind != -1) \
            & ((kind == MED_HOMOGENEOUS) | (kind == MED_HETEROGENEOUS))

        # ---- beam term over this segment (all M_BEAM stratified points
        # batched into ONE bounded gather: the unrolled-per-point version
        # multiplied the 27-cell x budget gather by M_BEAM and made
        # compile times explode) ----
        ts, tau = _segment_tau(scene, bricks, med, o, d, seg)
        u_b, smp = rng.next_1d(smp)
        S = ts.shape[1] - 1
        jf = (jnp.arange(M_BEAM, dtype=jnp.float32) + 0.5) / M_BEAM
        fj = jf[None, :] + (u_b[:, None] - 0.5) / M_BEAM    # (npix, M)
        fidx = jnp.clip(fj * S, 0.0, S - 1e-3)
        i0 = fidx.astype(jnp.int32)
        fr = (fidx - i0.astype(jnp.float32))[..., None]
        tau0 = jnp.take_along_axis(tau, i0[..., None].repeat(3, 2), axis=1)
        tau1 = jnp.take_along_axis(tau, (i0 + 1)[..., None].repeat(3, 2),
                                   axis=1)
        tau_j = tau0 * (1 - fr) + tau1 * fr                 # (npix, M, 3)
        t_j = fj * seg[:, None]
        x_j = (o[:, None, :] + t_j[..., None] * d[:, None, :]
               ).reshape(-1, 3)
        med_r = jnp.repeat(med, M_BEAM)
        wout_r = jnp.repeat(-d, M_BEAM, axis=0)
        g = gather_beam(vol_pm, scene, med_r, x_j, wout_r, radius,
                        n_photons, pact).reshape(npix, M_BEAM, 3)
        beam = jnp.sum(jnp.exp(-tau_j) * g, axis=1) \
            * (seg / M_BEAM)[..., None]
        L = L + jnp.where(in_med[..., None], tp * beam, 0.0)
        tau_seg = tau[:, -1]
        tp = tp * jnp.where(in_med[..., None], jnp.exp(-tau_seg), 1.0)

        # ---- surface event ----
        on_surface = alive & hit.valid
        b_idx, e_idx, m_in, m_ex = _shape_tables(scene, hit.shape_id)
        is_null = _is_null_surface(scene, b_idx)
        le = emitter_m.eval_hit(scene, e_idx, hit.ng, -d)
        L = L + jnp.where((on_surface & (e_idx >= 0))[..., None],
                          tp * le, 0.0)
        nb = scene.bsdfs.kind.shape[0]
        bk = jnp.where(b_idx >= 0, smalltab.take(
            scene.bsdfs.kind, jnp.clip(b_idx, 0, nb - 1)), -1)
        refl = smalltab.take(scene.bsdfs.reflectance,
                             jnp.clip(b_idx, 0, nb - 1))
        diffuse_hit = on_surface & (bk == BSDF_DIFFUSE) & ~found & ~is_null
        hit_p = jnp.where(diffuse_hit[..., None], hit.p, hit_p)
        hit_n = jnp.where(diffuse_hit[..., None], hit.ng, hit_n)
        hit_refl = jnp.where(diffuse_hit[..., None], tp * refl, hit_refl)
        found = found | diffuse_hit

        frame = Frame.from_normal(hit.ng)
        u2, smp = rng.next_2d(smp)
        u1, smp = rng.next_1d(smp)
        bs = bsdf_m.sample(scene.bsdfs, b_idx, frame.to_local(-d), u2, u1,
                           active=act)
        new_d = jnp.where(is_null[..., None], d, frame.to_world(bs.wo))
        w = jnp.where(is_null[..., None], 1.0, bs.weight)
        cont = on_surface & ~found & (bs.delta | is_null)
        entering = dot(new_d, hit.ng) < 0
        cross = on_surface & (
            is_null | (dot(new_d, hit.ng) * dot(-d, hit.ng) < 0))
        med = jnp.where(cross & cont, jnp.where(entering, m_in, m_ex), med)
        tp = jnp.where(cont[..., None], tp * w, tp)
        o = jnp.where(cont[..., None], hit.p + new_d * eps, o)
        d = jnp.where(cont[..., None], new_d, d)
        alive = cont

    Lp = gather_radiance(srf_pm, hit_p, hit_n, hit_refl, radius, n_photons)
    L = L + jnp.where(found[..., None], Lp, 0.0)
    return L


def render_bre(scene: Scene, cfg: RenderConfig, seed: int = 0,
               n_photons: int | None = None,
               initial_radius: float | None = None, alpha: float = 0.7):
    """BRE volumetric photon-map render; cfg.spp controls progressive
    iterations with Knaus-Zwicker radius shrink. Returns (H, W, 3)."""
    H, W = cfg.height, cfg.width
    if n_photons is None:
        n_photons = max(H * W, 1 << 16)
    if initial_radius is None:
        ext = float(np.asarray(scene.aabb_max - scene.aabb_min).max())
        initial_radius = 0.03 * ext
    img = jnp.zeros((H * W, 3), jnp.float32)
    r2 = initial_radius ** 2
    iters = max(cfg.spp // 4, 1)
    for i in range(iters):
        img = img + _bre_pass(scene, cfg, n_photons, jnp.uint32(seed),
                              jnp.uint32(i), jnp.float32(np.sqrt(r2)))
        r2 = r2 * (i + 1 + alpha) / (i + 2)
    return (img / iters).reshape(H, W, 3)
