"""Bidirectional path tracer with per-(s,t) connections and MIS.

Reference: src/integrators/bdpt/bdpt_proc.cpp:140-480 (the reference's
primary integrator — all bundled ER/transient scenes render through it) on
top of libbidir's PathVertex/PathEdge (vertex.cpp, edge.cpp). TPU redesign:

* Subpaths are FIXED-DEPTH stacked arrays (n, K, ...) built by `lax.scan`
  random walks — no pointer-chasing vertex lists; every lane walks in
  lockstep with masked liveness (the wavefront analogue of
  Path::alternatingRandomWalkFromPixel, path.cpp:115).
* The (s,t) double loop is STATIC (python), so each connection compiles to
  one masked visibility ray + arithmetic over the whole wavefront.
* MIS weights use the area-measure pdf-ratio recursion (Path::miWeight;
  same structure as pbrt-v3 MISWeight) from stored pdfFwd/pdfRev with the
  four junction pdfs recomputed per (s,t); delta vertices gate terms
  exactly like vertex.cpp's EDeltaDirection logic.
* t=1 strategies splat to the light image through the sensor projection
  (putLightSample, bdpt_wr.cpp:50-73) — one scatter-add per s.
* Per-vertex path-length prefixes support transient binning of each
  (s,t) contribution at its total length (bdpt_proc.cpp:147-189,455-476).

Vertex indexing follows Veach/pbrt: camera vertices z_0..z_{t-1} with z_0
the pinhole; light vertices y_0..y_{s-1} with y_0 on the emitter. The
stored camera array cam[k] = z_{k+1} (the pinhole is implicit: delta
position, never connectible, t'=0 strategies impossible); the stored light
array lt[k] = y_{k+1}, with y_0 kept separately in LightStart.

Scope: surface transport (area + point emitters, every surface BSDF).
Volumetric paths ride the volpath/wavefront family; curved-ER connections
(edge.cpp:473 -> the BVP) live in volpath_er.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng, smalltab
from ..core.math import Frame, dot, normalize
from ..models import bsdf as bsdf_m
from ..models import emitter as emitter_m
from ..models import sensor as sensor_m
from ..scene import intersect as isect
from ..scene.types import EM_AREA, EM_POINT, RenderConfig, Scene
from . import common


class SubPath(NamedTuple):
    """Stacked surface-vertex arrays; array index k = k-th SURFACE vertex of
    the walk (pbrt vertex k+1)."""
    p: jnp.ndarray        # (n, K, 3)
    ng: jnp.ndarray       # (n, K, 3)
    d_in: jnp.ndarray     # (n, K, 3) unit direction the walk ARRIVED along
    beta: jnp.ndarray     # (n, K, 3) cumulative weight up to this vertex
    pdf_fwd: jnp.ndarray  # (n, K) area pdf of generating this vertex
    pdf_rev: jnp.ndarray  # (n, K) area pdf of regenerating it backward
    delta: jnp.ndarray    # (n, K) ARRIVED via a delta lobe
    spec: jnp.ndarray     # (n, K) vertex's own BSDF sampled a delta lobe
    bsdf: jnp.ndarray     # (n, K) int32
    emitter: jnp.ndarray  # (n, K) int32
    valid: jnp.ndarray    # (n, K)
    plen: jnp.ndarray     # (n, K) path length from the walk origin


class LightStart(NamedTuple):
    p: jnp.ndarray         # (n, 3) y_0
    ng: jnp.ndarray        # (n, 3)
    beta1: jnp.ndarray     # (n, 3) cumulative weight at y_1
    inv_pdf_pos: jnp.ndarray  # (n,) 1 / (area pdf * pick)
    pdf_pos: jnp.ndarray   # (n,)
    pdf_dir: jnp.ndarray   # (n,) emission solid-angle pdf
    radiance: jnp.ndarray  # (n, 3) emitted radiance / intensity
    is_area: jnp.ndarray
    delta_pos: jnp.ndarray
    emitter: jnp.ndarray


def _remap0(x):
    return jnp.where(x > 0, x, 1.0)


def _to_area(pdf_dir, p_from, p_to, ng_to):
    dvec = p_to - p_from
    d2 = jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12)
    w = dvec / jnp.sqrt(d2)[..., None]
    cos_t = jnp.abs(dot(w, ng_to))
    return pdf_dir * cos_t / d2


def _surface_walk(scene, cfg, o0, d0, beta1, pdf0_dir, origin_p, origin_ng,
                  smp, K: int, eps):
    """Walk K surface vertices from ray (o0, d0) started at origin_p.

    pdf0_dir: solid-angle pdf of d0 (-> pdf_fwd of array vertex 0 in area
    measure). origin_ng: normal at the origin (light emission) or zeros
    (camera pinhole) for the origin's reverse-pdf conversion."""
    n = o0.shape[0]
    act = cfg.bsdf_kinds or None

    def body(carry, _):
        o, d, beta, pdf_dir, alive, plen, prev_delta, smp = carry
        hit = isect.intersect(scene.geo, o, d, jnp.full((n,), eps),
                              jnp.full((n,), isect.INF))
        valid = alive & hit.valid
        sid = jnp.clip(hit.shape_id, 0, scene.shapes.bsdf.shape[0] - 1)
        b_idx = jnp.where(valid, smalltab.take(scene.shapes.bsdf, sid), -1)
        e_idx = jnp.where(valid, smalltab.take(scene.shapes.emitter, sid), -1)
        pdf_fwd_area = _to_area(pdf_dir, o, hit.p, hit.ng)
        plen_here = plen + jnp.where(valid, hit.t, 0.0)

        frame = Frame.from_normal(hit.ng)
        wi_l = frame.to_local(-d)
        u2, smp = rng.next_2d(smp)
        u1, smp = rng.next_1d(smp)
        bs = bsdf_m.sample(scene.bsdfs, b_idx, wi_l, u2, u1, active=act)
        wo_w = frame.to_world(bs.wo)
        # density of regenerating the INCOMING direction from the sampled
        # outgoing one (reverse walk), used for the predecessor's pdf_rev
        pdf_rev_dir = bsdf_m.pdf(scene.bsdfs, b_idx, bs.wo, wi_l, active=act)
        beta_next = beta * bs.weight
        cont = valid & (b_idx >= 0) & jnp.any(bs.weight > 0, axis=-1)

        vert = dict(p=hit.p, ng=hit.ng, d_in=d, beta=beta,
                    pdf_fwd=jnp.where(valid, pdf_fwd_area, 0.0),
                    pdf_rev_dir=jnp.where(valid, pdf_rev_dir, 0.0),
                    prev_p=o - d * eps,  # un-offset origin (approx)
                    delta=prev_delta, spec=bs.delta,
                    bsdf=b_idx, emitter=e_idx, valid=valid, plen=plen_here)
        o2 = hit.p + wo_w * eps
        return (o2, wo_w, beta_next, bs.pdf, cont, plen_here, bs.delta,
                smp), vert

    init = (o0, d0, beta1, pdf0_dir, jnp.ones((n,), bool),
            jnp.zeros((n,), jnp.float32), jnp.zeros((n,), bool), smp)
    carry, verts = jax.lax.scan(body, init, None, length=K)
    smp = carry[-1]
    tr = lambda a: jnp.moveaxis(a, 0, 1)
    p = tr(verts["p"])
    ng = tr(verts["ng"])
    pdf_rev_dir = tr(verts["pdf_rev_dir"])
    # pdf_rev[k] = area pdf of vertex k as re-generated from vertex k+1:
    # the walk computed the reverse DIRECTION pdf at k+1; convert at k.
    pdf_rev = jnp.zeros((n, K))
    if K > 1:
        rev_area = _to_area(pdf_rev_dir[:, 1:],
                            p[:, 1:], p[:, :-1], ng[:, :-1])
        pdf_rev = pdf_rev.at[:, :-1].set(rev_area)
    # reverse pdf ONTO the walk origin (light y_0) from array vertex 0
    rev_to_origin = _to_area(pdf_rev_dir[:, 0], p[:, 0], origin_p, origin_ng)
    sub = SubPath(
        p=p, ng=ng, d_in=tr(verts["d_in"]), beta=tr(verts["beta"]),
        pdf_fwd=tr(verts["pdf_fwd"]), pdf_rev=pdf_rev,
        delta=tr(verts["delta"]), spec=tr(verts["spec"]),
        bsdf=tr(verts["bsdf"]), emitter=tr(verts["emitter"]),
        valid=tr(verts["valid"]), plen=tr(verts["plen"]),
    )
    return sub, rev_to_origin, smp


def _sample_light_vertex(scene, smp):
    """y_0 + emission ray (Scene::sampleEmitterRay; area + point kinds)."""
    from ..core import warp

    em = scene.emitters
    ne = em.kind.shape[0]
    u_sel, smp = rng.next_1d(smp)
    u_pos, smp = rng.next_2d(smp)
    u_dir, smp = rng.next_2d(smp)
    n = u_sel.shape[0]
    e_idx = jnp.clip((u_sel * ne).astype(jnp.int32), 0, ne - 1)
    u_tri = jnp.minimum(u_sel * ne - e_idx, 0.9999994)
    kind = smalltab.take(em.kind, e_idx)
    radiance = smalltab.take(em.radiance, e_idx)
    pos = smalltab.take(em.position, e_idx)

    p_area, n_area, pdf_area = emitter_m._sample_area_position(
        scene, e_idx, u_pos, u_tri)
    d_cos = Frame.from_normal(n_area).to_world(
        warp.square_to_cosine_hemisphere(u_dir))
    d_sph = warp.square_to_uniform_sphere(u_dir)

    is_area = kind == EM_AREA
    p0 = jnp.where(is_area[..., None], p_area, pos)
    ng0 = jnp.where(is_area[..., None], n_area, d_sph)
    d0 = jnp.where(is_area[..., None], d_cos, d_sph)
    cos0 = jnp.maximum(dot(d0, n_area), 1e-8)
    pdf_pos = jnp.where(is_area, pdf_area, 1.0) / ne
    pdf_dir = jnp.where(is_area, cos0 / jnp.pi,
                        warp.square_to_uniform_sphere_pdf())
    beta1 = jnp.where(
        is_area[..., None],
        radiance * (cos0 / jnp.maximum(pdf_pos * pdf_dir, 1e-12))[..., None],
        radiance / jnp.maximum(pdf_pos * pdf_dir, 1e-12)[..., None])
    return LightStart(
        p=p0, ng=ng0, beta1=beta1,
        inv_pdf_pos=1.0 / jnp.maximum(pdf_pos, 1e-12), pdf_pos=pdf_pos,
        pdf_dir=pdf_dir, radiance=radiance, is_area=is_area,
        delta_pos=kind == EM_POINT, emitter=e_idx,
    ), d0, smp


def _bsdf_pdf_at(scene, cfg, sub, k, wi_w, wo_w):
    act = cfg.bsdf_kinds or None
    frame = Frame.from_normal(sub.ng[:, k])
    return bsdf_m.pdf(scene.bsdfs, sub.bsdf[:, k], frame.to_local(wi_w),
                      frame.to_local(wo_w), active=act)


def _bsdf_f_at(scene, cfg, sub, k, wi_w, wo_w):
    act = cfg.bsdf_kinds or None
    frame = Frame.from_normal(sub.ng[:, k])
    return bsdf_m.eval(scene.bsdfs, sub.bsdf[:, k], frame.to_local(wi_w),
                       frame.to_local(wo_w), active=act)


def _mis_weight(scene, cam, lt, light0, s, t, ov_cam, ov_cam2, ov_lt,
                ov_lt2, rev_lt_origin, npix):
    """Balance-heuristic MIS over strategies with the same path length.

    pbrt-v3 MISWeight structure on z_1..z_{t-1} (= cam[0..t-2]) and
    y_0..y_{s-1} (= light0 + lt[0..s-2]); junction reverse pdfs supplied:
      ov_cam  = pdfRev of z_{t-1}, ov_cam2 = pdfRev of z_{t-2}
      ov_lt   = pdfRev of y_{s-1}, ov_lt2  = pdfRev of y_{s-2}
    rev_lt_origin: stored pdfRev of y_0 as regenerated from y_1.

    Count-weighted balance heuristic (Veach 9.2.4): the light-image family
    (t'=1) draws npix-times more samples per pixel estimate than the
    per-pixel families (every light subpath can splat anywhere), so its
    pdf is weighted by npix in the balance — and a t=1 strategy's
    competitors are each down-weighted by 1/npix."""
    n = cam.p.shape[0] if t >= 2 else lt.p.shape[0]
    sum_ri = jnp.zeros((n,))
    F = jnp.zeros((n,), bool)

    def cam_fwd(i):   # pbrt z_i, i>=1
        return cam.pdf_fwd[:, i - 1]

    def cam_rev(i):
        if i == t - 1:
            return ov_cam
        if i == t - 2:
            return ov_cam2
        return cam.pdf_rev[:, i - 1]

    def cam_delta(i):
        # z_{t-1} is the junction: connectible by construction of the
        # strategy loop (delta-spec vertices produce zero f anyway)
        if i == t - 1:
            return F
        return cam.delta[:, i - 1]

    ri = jnp.ones((n,))
    for i in range(t - 1, 0, -1):
        ri = ri * _remap0(cam_rev(i)) / _remap0(cam_fwd(i))
        d_here = cam_delta(i)
        d_prev = cam_delta(i - 1) if i - 1 >= 1 else F  # z_0 pinhole: the
        # t'=1 light-image strategy IS valid (splat), so no delta gate
        scale = npix if i == 1 else 1.0  # t'=1 family sample-count weight
        sum_ri = sum_ri + jnp.where(~d_here & ~d_prev, ri * scale, 0.0)

    def lt_fwd(i):    # pbrt y_i
        return light0.pdf_pos if i == 0 else lt.pdf_fwd[:, i - 1]

    def lt_rev(i):
        if i == s - 1:
            return ov_lt
        if i == s - 2:
            return ov_lt2
        return rev_lt_origin if i == 0 else lt.pdf_rev[:, i - 1]

    def lt_delta(i):
        if i == s - 1:
            return F
        return light0.delta_pos if i == 0 else lt.delta[:, i - 1]

    ri = jnp.ones((n,))
    for i in range(s - 1, -1, -1):
        ri = ri * _remap0(lt_rev(i)) / _remap0(lt_fwd(i))
        d_here = lt_delta(i)
        d_light_origin = light0.delta_pos if i == 0 else lt_delta(i - 1)
        sum_ri = sum_ri + jnp.where(~d_here & ~d_light_origin, ri, 0.0)

    if t == 1:
        # this strategy's own sample count is npix x larger
        sum_ri = sum_ri / npix
    return 1.0 / (1.0 + sum_ri)


def render_bdpt(scene: Scene, cfg: RenderConfig, seed: int = 0,
                t_max: int = None, s_max: int = None):
    """Full bidirectional render; returns the (H, W, 3) image (steady) or
    (H, W, 3*frames) for transient decompositions."""
    import functools

    H, W = cfg.height, cfg.width
    npix = H * W
    T_MAX = t_max or min(cfg.max_depth, 8)     # camera surface vertices
    S_MAX = s_max or min(cfg.max_depth, 8)     # light vertices incl y_0

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def one_pass(scene, eye_img, splat_img, cfg, seed, pass_idx):
        return _bdpt_pass(scene, eye_img, splat_img, cfg, T_MAX, S_MAX,
                          seed, pass_idx)

    nF = cfg.n_frames
    eye = jnp.zeros((npix, 3 * nF), jnp.float32)
    splat = jnp.zeros((npix, 3 * nF), jnp.float32)
    for i in range(cfg.spp):
        eye, splat = one_pass(scene, eye, splat, cfg, jnp.uint32(seed),
                              jnp.uint32(i))
    # eye image: spp camera paths per pixel; light image: npix*spp light
    # subpaths each able to splat anywhere -> divide by the total count
    img = eye / cfg.spp + splat / (cfg.spp * npix)
    return img.reshape(H, W, 3 * nF)


def _transient_slot(cfg, contrib, plen, base):
    """Scatter a contribution into its transient frame (steady: identity)."""
    nF = cfg.n_frames
    if nF == 1:
        return base + contrib
    idx = jnp.clip(((plen - cfg.min_bound) / cfg.bin_width).astype(jnp.int32),
                   0, nF - 1)
    oh = jax.nn.one_hot(idx, nF)                       # (n, F)
    return base + (oh[..., None] * contrib[:, None, :]).reshape(
        contrib.shape[0], -1)


def _strategy_on(s, t):
    """Debug filter: BDPT_ONLY='s,t' isolates one strategy (weights
    forced to 1 via BDPT_NOMIS=1)."""
    import os
    only = os.environ.get("BDPT_ONLY")
    if not only:
        return True
    ss, tt = only.split(",")
    return int(ss) == s and int(tt) == t


def _nomis():
    import os
    return bool(os.environ.get("BDPT_NOMIS"))


def _bdpt_pass(scene, eye_img, splat_img, cfg, T_MAX, S_MAX, seed, pass_idx):
    H, W = cfg.height, cfg.width
    npix = H * W
    n = npix
    eps = common.scene_epsilon(scene)
    cam_p = scene.sensor.to_world[:3, 3]
    act = cfg.bsdf_kinds or None
    mod_w = None
    if cfg.modulation != "none":
        from ..models import tof as tof_m
        mod_w = lambda plen: tof_m.correlation_function(cfg, plen)

    lane = jnp.arange(n, dtype=jnp.uint32)
    smp = rng.make_sampler(jnp.asarray(seed, jnp.uint32), lane, pass_idx)

    # ---------------- camera subpath ----------------
    u_jit, smp = rng.next_2d(smp)
    px = (lane % W).astype(jnp.float32) + u_jit[:, 0]
    py = (lane // W).astype(jnp.float32) + u_jit[:, 1]
    rays = sensor_m.sample_rays(
        scene.sensor, px, py, W, H,
        kind_hint=(cfg.sensor_kind if cfg.sensor_kind >= 0 else None))
    # camera direction pdf: uniform over the pixel's solid angle
    fs0 = sensor_m.project(scene.sensor, rays.o + rays.d, W, H)
    pdf_cam_dir = fs0.inv_pixel_omega
    cam, _, smp = _surface_walk(
        scene, cfg, rays.o, rays.d, jnp.ones((n, 3)), pdf_cam_dir,
        rays.o, jnp.zeros((n, 3)), smp, T_MAX, eps)

    # ---------------- light subpath ----------------
    light0, d0, smp = _sample_light_vertex(scene, smp)
    lt, rev_lt_origin, smp = _surface_walk(
        scene, cfg, light0.p + d0 * eps, d0, light0.beta1, light0.pdf_dir,
        light0.p, light0.ng, smp, max(S_MAX - 1, 1), eps)

    F = jnp.zeros((n,), bool)
    ones = jnp.ones((n,))

    # ---------------- s = 0: camera path hits an emitter ----------------
    for t in range(2, T_MAX + 2):
        k = t - 2                      # array index of z_{t-1}
        if k >= T_MAX or t - 1 > cfg.max_depth:
            break
        if not _strategy_on(0, t):
            continue
        e_idx = cam.emitter[:, k]
        ok = cam.valid[:, k] & (e_idx >= 0)
        wo = -cam.d_in[:, k]
        Le = emitter_m.eval_hit(scene, e_idx, cam.ng[:, k], wo)
        contrib = cam.beta[:, k] * Le
        # junction pdfs: z_{t-1} regenerated as a light origin; z_{t-2}
        # regenerated by emission from z_{t-1}
        earea = smalltab.take(scene.emitters.area,
                              jnp.clip(e_idx, 0, scene.emitters.area.shape[0] - 1))
        ne = scene.emitters.kind.shape[0]
        pdf_light_origin = 1.0 / jnp.maximum(earea * ne, 1e-12)
        if t >= 3:
            prev_p = cam.p[:, k - 1]
            prev_ng = cam.ng[:, k - 1]
        else:
            prev_p = jnp.broadcast_to(cam_p, (n, 3))
            prev_ng = jnp.zeros((n, 3))
        cos_l = jnp.maximum(dot(normalize(prev_p - cam.p[:, k]),
                                cam.ng[:, k]), 0.0)
        pdf_emit_dir = cos_l / jnp.pi
        ov_cam2 = _to_area(pdf_emit_dir, cam.p[:, k], prev_p, prev_ng) \
            if t >= 3 else ones
        w = ones if _nomis() else _mis_weight(
            scene, cam, lt, light0, 0, t, pdf_light_origin, ov_cam2, ones,
            ones, rev_lt_origin, npix)
        val = contrib * w[..., None]
        ok = ok & jnp.all(jnp.isfinite(val), -1)
        eye_img = _transient_slot(
            cfg, jnp.where(ok[..., None], val, 0.0),
            cam.plen[:, k], eye_img)

    # ---------------- t >= 2, s >= 1 connections ----------------
    for t in range(2, T_MAX + 2):
        kc = t - 2
        if kc >= T_MAX:
            break
        for s in range(1, S_MAX + 1):
            if s + t - 1 > cfg.max_depth or not _strategy_on(s, t):
                continue
            if s == 1:
                yp, yng = light0.p, light0.ng
                y_valid = jnp.ones((n,), bool)
            else:
                kl = s - 2
                if kl >= lt.p.shape[1]:
                    continue
                yp, yng = lt.p[:, kl], lt.ng[:, kl]
                y_valid = lt.valid[:, kl]
            zp, zng = cam.p[:, kc], cam.ng[:, kc]
            ok = cam.valid[:, kc] & y_valid
            dvec = yp - zp
            d2 = jnp.maximum(jnp.sum(dvec * dvec, -1), 1e-12)
            dist = jnp.sqrt(d2)
            wconn = dvec / dist[..., None]
            # camera-side f
            f_c = _bsdf_f_at(scene, cfg, cam, kc, -cam.d_in[:, kc], wconn)
            # light-side f (and Le for s=1)
            # NOTE bsdf_m.eval returns f * |cos(wo)|, so f_c already carries
            # the camera-side cosine and f_y (s>=2) the light-side cosine;
            # the remaining geometric factor is only the 1/d^2 (+ emission
            # cosine for s=1 area lights, which has no BSDF to carry it)
            if s == 1:
                cos_y = jnp.maximum(dot(-wconn, light0.ng), 0.0)
                f_y_over_cos = jnp.where(
                    light0.is_area[..., None],
                    light0.radiance * jnp.where(cos_y > 0, 1.0, 0.0)[..., None],
                    light0.radiance)  # point: intensity, no cos
                beta_y = light0.inv_pdf_pos[..., None] * jnp.ones((n, 3))
                G = jnp.where(light0.is_area, cos_y / d2, 1.0 / d2)
            else:
                f_y_over_cos = _bsdf_f_at(scene, cfg, lt, kl,
                                          -lt.d_in[:, kl], -wconn)
                G = 1.0 / d2
                beta_y = lt.beta[:, kl]
            contrib = (cam.beta[:, kc] * f_c * beta_y * f_y_over_cos
                       * G[..., None])
            any_c = jnp.any(contrib > 0, -1)
            ok = ok & any_c
            blocked = isect.occluded(
                scene.geo, zp + wconn * eps, wconn,
                jnp.full((n,), eps * 0.5), dist - 2 * eps)
            ok = ok & ~blocked

            # ---- junction reverse pdfs ----
            # z_{t-1} from y_{s-1}
            if s == 1:
                cos_y1 = jnp.maximum(dot(-wconn, light0.ng), 1e-8)
                pdf_y_dir = jnp.where(light0.is_area, cos_y1 / jnp.pi,
                                      1.0 / (4.0 * jnp.pi))
            else:
                pdf_y_dir = _bsdf_pdf_at(scene, cfg, lt, kl,
                                         -lt.d_in[:, kl], -wconn)
            ov_cam = _to_area(pdf_y_dir, yp, zp, zng)
            # z_{t-2} from z_{t-1} (scattering backward given wconn in)
            pdf_z_back = _bsdf_pdf_at(scene, cfg, cam, kc, wconn,
                                      -cam.d_in[:, kc])
            if t >= 3:
                ov_cam2 = _to_area(pdf_z_back, zp, cam.p[:, kc - 1],
                                   cam.ng[:, kc - 1])
            else:
                ov_cam2 = ones
            # y_{s-1} from z_{t-1}
            pdf_z_dir = _bsdf_pdf_at(scene, cfg, cam, kc,
                                     -cam.d_in[:, kc], wconn)
            ov_lt = _to_area(pdf_z_dir, zp, yp, yng)
            # y_{s-2} from y_{s-1}
            if s >= 2:
                if s == 2:
                    prev_lp, prev_lng = light0.p, light0.ng
                else:
                    prev_lp, prev_lng = lt.p[:, kl - 1], lt.ng[:, kl - 1]
                pdf_y_back = _bsdf_pdf_at(scene, cfg, lt, kl, -wconn,
                                          -lt.d_in[:, kl]) if s >= 2 else ones
                ov_lt2 = _to_area(pdf_y_back, yp, prev_lp, prev_lng)
            else:
                ov_lt2 = ones
            w = ones if _nomis() else _mis_weight(
                scene, cam, lt, light0, s, t, ov_cam, ov_cam2, ov_lt,
                ov_lt2, rev_lt_origin, npix)
            plen_tot = cam.plen[:, kc] + dist + \
                (lt.plen[:, kl] if s >= 2 else 0.0)
            val = contrib * w[..., None]
            if mod_w is not None:
                val = val * mod_w(plen_tot)[..., None]
            ok = ok & jnp.all(jnp.isfinite(val), -1)
            eye_img = _transient_slot(
                cfg, jnp.where(ok[..., None], val, 0.0), plen_tot, eye_img)

    # ---------------- t = 1: light image ----------------
    for s in range(1, S_MAX + 2):
        if s > cfg.max_depth:
            break
        if not _strategy_on(s, 1):
            continue
        if s == 1:
            kl = -1
            yp, yng = light0.p, light0.ng
            ok = jnp.ones((n,), bool)
        else:
            kl = s - 2
            if kl >= lt.p.shape[1]:
                break
            yp, yng = lt.p[:, kl], lt.ng[:, kl]
            ok = lt.valid[:, kl]
        to_c = jnp.broadcast_to(cam_p, (n, 3)) - yp
        d2 = jnp.maximum(jnp.sum(to_c * to_c, -1), 1e-12)
        dist = jnp.sqrt(d2)
        d_c = to_c / dist[..., None]
        fs = sensor_m.project(scene.sensor, yp, W, H)
        ok = ok & fs.valid
        if s == 1:
            # y_0 itself: emitted radiance toward the camera over pdf_pos
            cos_y0 = jnp.maximum(dot(d_c, light0.ng), 0.0)
            f_y = jnp.where(
                light0.is_area[..., None],
                light0.radiance * cos_y0[..., None], 0.0)
            beta_y = light0.inv_pdf_pos[..., None] * jnp.ones((n, 3))
            ok = ok & light0.is_area & (cos_y0 > 0)
        else:
            f_y = _bsdf_f_at(scene, cfg, lt, kl, -lt.d_in[:, kl], d_c)
            beta_y = lt.beta[:, kl]
        blocked = isect.occluded(
            scene.geo, yp + d_c * eps, d_c, jnp.full((n,), eps * 0.5),
            dist - 2 * eps)
        ok = ok & ~blocked
        val = (beta_y * f_y
               * (fs.inv_pixel_omega / d2)[..., None])
        # junction pdfs: y_{s-1} regenerated from the camera
        pdf_cam_dir2 = fs.inv_pixel_omega
        ov_lt = _to_area(pdf_cam_dir2, jnp.broadcast_to(cam_p, (n, 3)),
                         yp, yng)
        if s >= 3:
            prev_lp, prev_lng = ((light0.p, light0.ng) if s == 3 else
                                 (lt.p[:, kl - 1], lt.ng[:, kl - 1]))
            pdf_y_back = _bsdf_pdf_at(scene, cfg, lt, kl, d_c,
                                      -lt.d_in[:, kl])
            ov_lt2 = _to_area(pdf_y_back, yp, prev_lp, prev_lng)
        elif s == 2:
            # y_0 regenerated from y_1: the junction at y_{s-1}=y_1 changes
            # y_1's incoming to the camera direction; its backward pdf onto
            # y_0 is the BSDF pdf at y_1 from d_c toward y_0
            pdf_y0 = _bsdf_pdf_at(scene, cfg, lt, 0, d_c,
                                  normalize(light0.p - lt.p[:, 0]))
            ov_lt2 = _to_area(pdf_y0, lt.p[:, 0], light0.p, light0.ng)
        else:
            ov_lt2 = ones
        w = ones if _nomis() else _mis_weight(
            scene, cam, lt, light0, s, 1, ones, ones, ov_lt, ov_lt2,
            rev_lt_origin, npix)
        plen_tot = (lt.plen[:, kl] if s >= 2 else 0.0) + dist
        val = val * w[..., None]
        if mod_w is not None:
            val = val * mod_w(plen_tot)[..., None]
        ok = ok & jnp.all(jnp.isfinite(val), -1)
        val = jnp.where(ok[..., None], val, 0.0)
        pxi = jnp.clip(fs.px.astype(jnp.int32), 0, W - 1)
        pyi = jnp.clip(fs.py.astype(jnp.int32), 0, H - 1)
        pix_id = pyi * W + pxi
        nF = cfg.n_frames
        if nF == 1:
            splat_img = splat_img.at[pix_id].add(val)
        else:
            fidx = jnp.clip(((plen_tot - cfg.min_bound)
                             / cfg.bin_width).astype(jnp.int32), 0, nF - 1)
            flat = jnp.zeros_like(splat_img).at[pix_id].add(
                (jax.nn.one_hot(fidx, nF)[..., None]
                 * val[:, None, :]).reshape(n, -1))
            splat_img = splat_img + flat

    return eye_img, splat_img
