"""Accurate single scattering through a refractive boundary.

Reference: src/subsurface/singlescatter.cpp (Holzschuch 2015, "Accurate
computation of single scattering in participating media with refractive
boundaries", 1696 LoC): for a shape holding a participating medium behind a
smooth dielectric boundary, integrate the single-scatter transport with
EXACT refracted connections — for every point x on the refracted camera
ray, find the boundary point B such that light -> B refracts precisely to
x, and weigh by the refraction-aware geometry factor.

TPU redesign:
* The camera ray refracts at the entry point analytically; interior
  distances are sampled along the refracted chord.
* The refracted connection solves Snell's law on the boundary. This
  implementation is EXACT for sphere boundaries: the connection lies in
  the plane through (center, x, light), so the boundary point reduces to
  one angle phi solved by a bracketed bisection (24 iterations, batched
  over the wavefront) — replacing the reference's per-triangle Newton
  iteration (singlescatter.cpp:117) which needs mesh adjacency walks that
  are the wrong shape for a vector machine. Mesh boundaries: roadmap
  (COVERAGE.md).
* The generalized geometry factor |d omega_x / dA_light| (the refractive
  replacement of 1/d^2; Walter et al. 2009 derivation used by the
  reference's Jacobian chain) is evaluated by re-solving the connection
  for two orthogonally displaced light positions — three cheap bisections
  per sample instead of the analytic derivative chain.
* Fresnel transmittances apply at both crossings; the two radiance
  compression factors (1/eta^2 entering camera-side, eta^2 exiting
  light-side along the reversed connection) cancel for the through-path.

Validated against volpath on the same scene: vol(sigma_s) - vol(0) isolates
the scattered transport, which at small sigma_s is single-scatter up to
O(sigma_s^2) (tests/test_singlescatter.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from ..core.math import dot, fresnel_dielectric, normalize, refract
from ..models import medium as medium_m
from ..models import phase as phase_m
from ..models import sensor as sensor_m
from ..scene import intersect as isect
from ..scene.types import RenderConfig, Scene
from . import common


def _find_target(scene: Scene):
    """First sphere shape with a dielectric boundary and interior medium."""
    sph_shape = np.asarray(scene.geo.sph_shape_id)
    interior = np.asarray(scene.shapes.interior)
    for i in range(sph_shape.shape[0]):
        sid = int(sph_shape[i])
        if sid >= 0 and interior[sid] >= 0:
            return i, sid, int(interior[sid])
    raise ValueError("singlescatter: no sphere shape with interior medium")


def _solve_phi(c, R, eta, x, l, iters: int = 24):
    """Boundary angle of the refracted connection in the (c, x, l) plane.

    x inside the sphere, l outside. Returns (B, ok). Bracketing: at phi=0
    (B radially above x) the interior angle is 0 so g = -sin_o <= 0; at
    phi = angle(x->l azimuth) the exterior angle is ~0 so g >= 0."""
    u = x - c
    ru = jnp.linalg.norm(u, axis=-1, keepdims=True)
    u = u / jnp.maximum(ru, 1e-9)
    w = (l - c) - dot(l - c, u, keepdims=True) * u
    nw = jnp.linalg.norm(w, axis=-1, keepdims=True)
    # degenerate colinear case: any perpendicular plane works. Build a true
    # perpendicular via cross with whichever axis u is least aligned with
    # (stack of [u_y,-u_x,u_z] is NOT orthogonal to u when u ~ ±z).
    ax = jnp.where(jnp.abs(u[..., :1]) < 0.9,
                   jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    alt = jnp.cross(u, ax)
    v = jnp.where(nw > 1e-6, w / jnp.maximum(nw, 1e-9), normalize(alt))
    phi_l = jnp.arccos(jnp.clip(dot(normalize(l - c), u), -1.0, 1.0))

    def g(phi):
        B = c + R * (u * jnp.cos(phi)[..., None] + v * jnp.sin(phi)[..., None])
        n = (B - c) / R
        wi = normalize(B - x)          # interior, x -> B
        wo = normalize(l - B)          # exterior, B -> l
        sin_i = jnp.linalg.norm(jnp.cross(wi, n), axis=-1)
        sin_o = jnp.linalg.norm(jnp.cross(wo, n), axis=-1)
        return eta * sin_i - sin_o

    lo = jnp.zeros(x.shape[:-1])
    hi = jnp.maximum(phi_l, 1e-6)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        gm = g(mid)
        hi2 = jnp.where(gm > 0, mid, hi)
        lo2 = jnp.where(gm > 0, lo, mid)
        lo, hi = lo2, hi2
    phi = 0.5 * (lo + hi)
    B = c + R * (u * jnp.cos(phi)[..., None] + v * jnp.sin(phi)[..., None])
    ok = jnp.abs(g(phi)) < 1e-3
    return B, ok


def render_singlescatter(scene: Scene, cfg: RenderConfig, seed: int = 0,
                         n_dist: int = 4):
    """Single-scatter-only image of the target refractive sphere; returns
    (H, W, 3). n_dist: interior distance samples per camera sample."""
    H, W = cfg.height, cfg.width
    npix = H * W
    eps = common.scene_epsilon(scene)
    si, sid, med_id = _find_target(scene)
    c = scene.geo.sph_center[si]
    R = scene.geo.sph_radius[si]
    b_idx = int(np.asarray(scene.shapes.bsdf)[sid])
    eta = float(np.asarray(scene.bsdfs.eta)[b_idx]) if b_idx >= 0 else 1.5
    kind, sa, ss, _, _ = medium_m.params(
        scene.media, jnp.full((1,), med_id, jnp.int32))
    sigma_t = (sa + ss)[0]
    sigma_s = ss[0]
    em = scene.emitters
    li = int(np.argmax(np.asarray(em.kind) >= 0))
    l_pos = em.position[li]
    I = em.radiance[li]

    def one_spp(s_idx):
        pixel = jnp.arange(npix, dtype=jnp.uint32)
        smp = rng.make_sampler(jnp.asarray(seed, jnp.uint32) ^ jnp.uint32(0x55C),
                               pixel, jnp.full((npix,), s_idx, jnp.uint32))
        u_jit, smp = rng.next_2d(smp)
        px = (pixel % W).astype(jnp.float32) + u_jit[:, 0]
        py = (pixel // W).astype(jnp.float32) + u_jit[:, 1]
        rays = sensor_m.sample_rays(scene.sensor, px, py, W, H)

        # entry point on the sphere
        oc = rays.o - c[None, :]
        b = jnp.sum(oc * rays.d, -1)
        ct = jnp.sum(oc * oc, -1) - R * R
        disc = b * b - ct
        t_e = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
        hit_sph = (disc > 0) & (t_e > eps)
        E = rays.o + t_e[..., None] * rays.d
        nE = (E - c[None, :]) / R
        F_E, _ = fresnel_dielectric(dot(-rays.d, nE), eta)
        d_in, tir_in = refract(-rays.d, nE, eta)
        ok0 = hit_sph & ~tir_in
        # interior chord length
        bi = jnp.sum((E - c[None, :]) * d_in, -1)
        t_exit = -2.0 * bi                      # chord of the sphere
        t_exit = jnp.maximum(t_exit, 1e-6)

        Lsum = jnp.zeros((npix, 3), jnp.float32)
        for k in range(n_dist):
            u_t, smp = rng.next_1d(smp)
            # exponential distance limited to the chord (mean channel)
            st_m = jnp.mean(sigma_t)
            denom = 1.0 - jnp.exp(-st_m * t_exit)
            t = -jnp.log1p(-u_t * denom) / st_m
            pdf_t = st_m * jnp.exp(-st_m * t) / jnp.maximum(denom, 1e-12)
            x = E + t[..., None] * d_in
            tr_in = jnp.exp(-sigma_t[None, :] * t[..., None])

            lb = jnp.broadcast_to(l_pos, x.shape)
            B, okc = _solve_phi(c[None, :], R, eta, x, lb)
            # geometry factor by re-solving for displaced light positions
            dlb = normalize(lb - B)
            a1 = jnp.where(jnp.abs(dlb[..., :1]) < 0.9,
                           jnp.asarray([1.0, 0, 0]), jnp.asarray([0, 1.0, 0]))
            uu = normalize(jnp.cross(dlb, jnp.broadcast_to(a1, dlb.shape)))
            vv = jnp.cross(dlb, uu)
            delta = 3e-3 * R
            B_u, _ = _solve_phi(c[None, :], R, eta, x, lb + delta * uu)
            B_v, _ = _solve_phi(c[None, :], R, eta, x, lb + delta * vv)
            w0 = normalize(B - x)
            w_u = normalize(B_u - x)
            w_v = normalize(B_v - x)
            G = jnp.linalg.norm(
                jnp.cross((w_u - w0) / delta, (w_v - w0) / delta), axis=-1)

            nB = (B - c[None, :]) / R
            w_out = normalize(lb - B)
            F_B, _ = fresnel_dielectric(dot(w_out, nB), eta)
            d_Bx = jnp.linalg.norm(B - x, axis=-1)
            tr_conn = jnp.exp(-sigma_t[None, :] * d_Bx[..., None])
            rho = phase_m.eval(scene.media.phase,
                               jnp.full((npix,), med_id, jnp.int32),
                               d_in, w0)
            val = (tr_in * tr_conn * sigma_s[None, :] * I[None, :]
                   * ((1.0 - F_E) * (1.0 - F_B) * rho * G
                      / jnp.maximum(pdf_t, 1e-12))[..., None])
            ok = ok0 & okc & jnp.all(jnp.isfinite(val), -1) & (G > 0)
            Lsum = Lsum + jnp.where(ok[..., None], val, 0.0)
        return Lsum / n_dist

    img = jnp.zeros((npix, 3), jnp.float32)
    f = jax.jit(one_spp)
    for s in range(cfg.spp):
        img = img + f(jnp.uint32(s))
    return (img / jnp.float32(cfg.spp)).reshape(H, W, 3)


# ---------------------------------------------------------------------------
# Mesh-boundary variant (r5): per-triangle planar refraction solves
# ---------------------------------------------------------------------------
def _solve_planar(p0, n, eta, x, l, iters: int = 24):
    """Refraction point B on the plane (p0, n) such that l -> B refracts to
    x (x on the opposite side of the plane from l). The reference solves
    this per boundary triangle by Newton (singlescatter.cpp:117); here a
    bracketed bisection along the projected chord — B lies on the segment
    between the plane projections of l and x (the plane of incidence).
    Returns (B, ok). Shapes broadcast: works for (T, n, 3) batches."""
    hx = dot(x - p0, n, keepdims=True)
    hl = dot(l - p0, n, keepdims=True)
    x_p = x - hx * n
    l_p = l - hl * n
    ok_side = (hx[..., 0] * hl[..., 0]) < 0  # opposite sides

    def g(s):
        B = l_p + s[..., None] * (x_p - l_p)
        wi = normalize(x - B)          # interior, B -> x
        wo = normalize(l - B)          # exterior, B -> l
        sin_i = jnp.linalg.norm(jnp.cross(wi, n), axis=-1)
        sin_o = jnp.linalg.norm(jnp.cross(wo, n), axis=-1)
        return eta * sin_i - sin_o

    # bracket: at s=0 (under l) sin_o = 0 -> g >= 0; at s=1 sin_i = 0 ->
    # g <= 0 (same structure as _solve_phi's bracket)
    lo = jnp.zeros(x.shape[:-1])
    hi = jnp.ones(x.shape[:-1])
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        gm = g(mid)
        hi = jnp.where(gm < 0, mid, hi)
        lo = jnp.where(gm < 0, lo, mid)
    s = 0.5 * (lo + hi)
    B = l_p + s[..., None] * (x_p - l_p)
    ok = ok_side & (jnp.abs(g(s)) < 1e-3)
    return B, ok


def _find_mesh_target(scene: Scene):
    """First MESH shape with an interior medium; returns (shape_id, med)."""
    interior = np.asarray(scene.shapes.interior)
    tri_shape = np.asarray(scene.geo.shape_id)
    for sid in np.unique(tri_shape):
        if interior[int(sid)] >= 0:
            return int(sid), int(interior[int(sid)])
    raise ValueError("singlescatter_mesh: no mesh shape with interior medium")


def render_singlescatter_mesh(scene: Scene, cfg: RenderConfig, seed: int = 0,
                              n_dist: int = 4):
    """Single-scatter through a TRIANGLE-MESH refractive boundary
    (singlescatter.cpp:117 triangle Newton, TPU bisection form): every
    boundary triangle's planar refraction point is solved for every lane
    at once ((T, n)-vectorized), masked by the barycentric inside-test,
    and all valid solutions contribute (Holzschuch enumerates the same
    candidate set). Returns (H, W, 3)."""
    H, W = cfg.height, cfg.width
    npix = H * W
    eps = common.scene_epsilon(scene)
    sid, med_id = _find_mesh_target(scene)
    tri_ids = np.argwhere(np.asarray(scene.geo.shape_id) == sid).ravel()
    T = len(tri_ids)
    v0 = jnp.asarray(np.asarray(scene.geo.v0)[tri_ids])
    e1 = jnp.asarray(np.asarray(scene.geo.e1)[tri_ids])
    e2 = jnp.asarray(np.asarray(scene.geo.e2)[tri_ids])
    ng = jnp.asarray(np.asarray(scene.geo.ng)[tri_ids])

    b_idx = int(np.asarray(scene.shapes.bsdf)[sid])
    eta = float(np.asarray(scene.bsdfs.eta)[b_idx]) if b_idx >= 0 else 1.5
    kind, sa, ss, _, _ = medium_m.params(
        scene.media, jnp.full((1,), med_id, jnp.int32))
    sigma_t = (sa + ss)[0]
    sigma_s = ss[0]
    em = scene.emitters
    li = int(np.argmax(np.asarray(em.kind) >= 0))
    l_pos = em.position[li]
    I = em.radiance[li]

    def connect(x, lb, d_in):
        """(T, n)-vectorized refracted-connection sum incl. per-triangle
        phase values at the scatter vertex."""
        n = x.shape[0]
        xb = jnp.broadcast_to(x[None], (T, n, 3))
        lbb = jnp.broadcast_to(lb[None], (T, n, 3))
        p0 = jnp.broadcast_to(v0[:, None], (T, n, 3))
        nrm = jnp.broadcast_to(ng[:, None], (T, n, 3))
        e1b = e1[:, None]
        e2b = e2[:, None]
        B, okp = _solve_planar(p0, nrm, eta, xb, lbb)
        d = B - p0
        d00 = dot(e1b, e1b)
        d01 = dot(e1b, e2b)
        d11 = dot(e2b, e2b)
        d20 = dot(d, e1b)
        d21 = dot(d, e2b)
        den = jnp.maximum(d00 * d11 - d01 * d01, 1e-12)
        bu = (d11 * d20 - d01 * d21) / den
        bv = (d00 * d21 - d01 * d20) / den
        inside = (bu >= -1e-4) & (bv >= -1e-4) & (bu + bv <= 1 + 1e-4)
        ok = okp & inside
        # geometry factor by displaced-light re-solves (same scheme as the
        # sphere-exact path)
        dlb = normalize(lbb - B)
        a1 = jnp.where(jnp.abs(dlb[..., :1]) < 0.9,
                       jnp.asarray([1.0, 0, 0]), jnp.asarray([0, 1.0, 0]))
        uu = normalize(jnp.cross(dlb, jnp.broadcast_to(a1, dlb.shape)))
        vv = jnp.cross(dlb, uu)
        delta = 3e-3
        B_u, _ = _solve_planar(p0, nrm, eta, xb, lbb + delta * uu)
        B_v, _ = _solve_planar(p0, nrm, eta, xb, lbb + delta * vv)
        w0 = normalize(B - xb)
        G = jnp.linalg.norm(jnp.cross(
            (normalize(B_u - xb) - w0) / delta,
            (normalize(B_v - xb) - w0) / delta), axis=-1)
        w_out = normalize(lbb - B)
        F_B, _ = fresnel_dielectric(jnp.abs(dot(w_out, nrm)), eta)
        d_Bx = jnp.linalg.norm(B - xb, axis=-1)
        tr_conn = jnp.exp(-sigma_t[None, None, :] * d_Bx[..., None])
        d_in_b = jnp.broadcast_to(d_in[None], (T, n, 3))
        rho = phase_m.eval(scene.media.phase,
                           jnp.full((T, n), med_id, jnp.int32), d_in_b, w0)
        val = tr_conn * ((1.0 - F_B) * G * rho)[..., None]
        return jnp.sum(jnp.where((ok & (G > 0))[..., None], val, 0.0),
                       axis=0)

    def one_spp(s_idx):
        pixel = jnp.arange(npix, dtype=jnp.uint32)
        smp = rng.make_sampler(
            jnp.asarray(seed, jnp.uint32) ^ jnp.uint32(0x55D),
            pixel, jnp.full((npix,), s_idx, jnp.uint32))
        u_jit, smp = rng.next_2d(smp)
        px = (pixel % W).astype(jnp.float32) + u_jit[:, 0]
        py = (pixel // W).astype(jnp.float32) + u_jit[:, 1]
        rays = sensor_m.sample_rays(scene.sensor, px, py, W, H)
        hit = isect.intersect(scene.geo, rays.o, rays.d,
                              jnp.full((npix,), eps),
                              jnp.full((npix,), isect.INF))
        on_tgt = hit.valid & (hit.shape_id == sid)
        nE = hit.ng
        F_E, _ = fresnel_dielectric(dot(-rays.d, nE), eta)
        d_in, tir_in = refract(-rays.d, nE, eta)
        ok0 = on_tgt & ~tir_in
        E = hit.p
        # exit chord: re-intersect from just inside
        hit2 = isect.intersect(scene.geo, E + d_in * (2 * eps), d_in,
                               jnp.full((npix,), eps),
                               jnp.full((npix,), isect.INF))
        t_exit = jnp.where(hit2.valid & (hit2.shape_id == sid),
                           hit2.t, 1e-3)
        t_exit = jnp.maximum(t_exit, 1e-6)

        Lsum = jnp.zeros((npix, 3), jnp.float32)
        for k in range(n_dist):
            u_t, smp = rng.next_1d(smp)
            st_m = jnp.mean(sigma_t)
            denom = 1.0 - jnp.exp(-st_m * t_exit)
            t = -jnp.log1p(-u_t * denom) / st_m
            pdf_t = st_m * jnp.exp(-st_m * t) / jnp.maximum(denom, 1e-12)
            x = E + t[..., None] * d_in
            tr_in = jnp.exp(-sigma_t[None, :] * t[..., None])
            lb = jnp.broadcast_to(l_pos, x.shape)
            conn = connect(x, lb, d_in)
            val = (tr_in * conn * sigma_s[None, :] * I[None, :]
                   * ((1.0 - F_E) / jnp.maximum(pdf_t, 1e-12))[..., None])
            ok = ok0 & jnp.all(jnp.isfinite(val), -1)
            Lsum = Lsum + jnp.where(ok[..., None], val, 0.0)
        return Lsum / n_dist

    img = jnp.zeros((npix, 3), jnp.float32)
    f = jax.jit(one_spp)
    for s in range(cfg.spp):
        img = img + f(jnp.uint32(s))
    return (img / jnp.float32(cfg.spp)).reshape(H, W, 3)
