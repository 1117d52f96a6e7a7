"""Whole-path Pallas renderer for bounded-scattering-volume scenes.

The wavefront engine's pass structure leaves tracking slots ~20% occupied
(PERF.md): lanes stall between event passes, and every XLA pass pays full
width. This module runs the ENTIRE per-sample walk of the reference's
headline volumetric benchmark scene class
(scenes/volumetric/BoundedScatteringVolume_directionalsource.xml — a
null-boundary box of heterogeneous HG medium lit by a collimated beam,
perspective camera, no other geometry) inside ONE Pallas kernel:

  camera regeneration -> box entry -> Woodcock free flight
  (stochastic-trilinear taps, megatrack.py) -> HG scatter with
  equiangular collimated-beam NEE -> shadow ratio tracking -> escape ->
  film accumulation -> next sample,

as a per-lane state machine stepped by a while loop. A lane that
finishes a sample regenerates the next one in the same trip, so
occupancy stays ~100% until a lane exhausts its spp; the per-block tail
is small because each lane's total trip count is a SUM over sppc iid
samples (CLT: the block max approaches the block mean as spp grows —
the averaging that per-sample kernels lack). Exactly one density tap
runs per trip (extension OR shadow, selected by mode), so the trip cost
stays at the megapass's ~3-4.5 ns/lane.

Estimator identity: the walk replicates integrators/wavefront.py's event
algebra for this scene class step for step — spectral Woodcock weights
(w_real/w_null against the mean-channel majorant), equiangular beam
sampling + packed beam-tau rows (volpath.py sample_beam_point /
build_beam_tau), HG sampling/eval (hg.cpp:74-107), Mitsuba-style RR
(path.cpp:200-208), depth gating, and the lane-rotation pixel mapping +
epoch film fold. The density tap is the stochastic-trilinear one-voxel
tap (see megatrack.py — provably the same marginal estimator). Segment /
tap counters follow the wavefront engine's conventions so the bench
metric stays comparable.

Applicability is gated host-side (`supported()`): one heterogeneous
medium, all-null geometry, exactly one collimated emitter, perspective
sensor, box filter, steady state, iso/HG phase. Everything else renders
through the general engines.

Mosaic notes: atan2/tan are not lowered — the equiangular warp uses a
minimax atan polynomial (max err ~1e-5 rad) and tan = sin/cos.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import medium as medium_m
from ..scene.types import (
    EM_COLLIMATED,
    MED_HETEROGENEOUS,
    PH_HG,
    PH_ISOTROPIC,
    SENSOR_PERSPECTIVE,
    RenderConfig,
    Scene,
)
from . import common, megatrack
from .volpath import build_beam_tau, get_beam

BEAM_N = 256          # beam-tau table rows (volpath.build_beam_tau)

# params vector layout (f32, SMEM)
_P_CAMR = 0           # 0:9   camera rotation, row major
_P_CAMO = 9           # 9:12  camera origin
_P_TANX = 12
_P_TANY = 13
_P_BMIN = 14          # 14:17 box aabb min
_P_BMAX = 17          # 17:20 box aabb max
_P_BEAMO = 20        # beam origin
_P_BEAMD = 23        # beam direction
_P_BEAMP = 26        # beam power
_P_BS0 = 29
_P_BS1 = 30
_P_G = 31            # HG g (0 => isotropic)
_P_SSU = 32          # 32:35 sigma_s (unscaled: sigma_s(y) = ssu*dens_tab)
_P_STCS = 35         # 35:38 sigma_t color * scale (null factors)
_P_STMS = 38         # sigma_t mean * scale (collision test)
_P_MAJ = 39          # media.majorant * max(sigma_t color) (world units)
_P_DMIN = 40         # 40:43 density aabb min
_P_INVH = 43         # 43:46 (res-1)/extent per axis
_P_WR = 46           # 46:49 w_real = sigma_s / sigma_t_mean
_P_EPS = 49
_P_NP = 50


def supported(scene: Scene, cfg: RenderConfig) -> bool:
    """Host-side gate (needs concrete scene values)."""
    import numpy as np

    try:
        if cfg.engine not in ("wavefront", "auto"):
            return False
        if cfg.integrator not in ("volpath", "volpath_simple"):
            return False
        if cfg.filter != "box" or cfg.n_frames != 1:
            return False
        if cfg.decomposition != "steadystate":
            return False
        em_kind = np.asarray(scene.emitters.kind)
        if not (em_kind.size == 1 and em_kind[0] == EM_COLLIMATED):
            return False
        if int(np.asarray(scene.sensor.kind)) != SENSOR_PERSPECTIVE:
            return False
        med_kind = np.asarray(scene.media.kind)
        if not (med_kind.size == 1 and med_kind[0] == MED_HETEROGENEOUS):
            return False
        ph = int(np.asarray(scene.media.phase.kind)[0])
        if ph not in (PH_HG, PH_ISOTROPIC):
            return False
        sb = np.asarray(scene.shapes.bsdf)
        if sb.size and np.any(sb >= 0):
            return False
        if not megatrack.MegaTable.fits(scene.media):
            return False
        if int(np.asarray(scene.camera_medium)) != -1:
            return False
        return True
    except Exception:
        return False


def _hash(x):
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def _unif(bits):
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) \
        * jnp.float32(5.9604644775390625e-08)


def _atan(x):
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1.0), ax)
    z2 = z * z
    at = z * (0.9998660 + z2 * (-0.3302995 + z2 * (0.1801410
              + z2 * (-0.0851330 + z2 * 0.0208351))))
    at = jnp.where(inv, 1.5707963267948966 - at, at)
    return jnp.where(x < 0, -at, at)


def _kernel(B, sppc, max_depth, rr_depth, W_img, H_img, npix, stride, res,
            nb, max_trips, params_ref, seed_ref, tab_ref, beam_ref,
            out_ref, st_s, pend_s):
    nx, ny, nz = res
    nbx, nby, nbz = nb
    R = nbx * nby * nbz
    Wb = megatrack.W

    def P(i):
        return params_ref[i]

    def P3(i):
        return jnp.stack([params_ref[i], params_ref[i + 1],
                          params_ref[i + 2]]).reshape(3, 1)

    seed = seed_ref[0]
    lane = (jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
            + B * pl.program_id(0))
    laneu = lane.astype(jnp.uint32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, B), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (Wb, B), 0)
    iota_beam = jax.lax.broadcasted_iota(jnp.int32, (BEAM_N, B), 0)
    iota_ep = jax.lax.broadcasted_iota(jnp.int32, (sppc * 3, B), 0) // 3
    iota_ch = jax.lax.broadcasted_iota(jnp.int32, (sppc * 3, B), 0) % 3

    camR = [P(_P_CAMR + i) for i in range(9)]
    g = P(_P_G)
    g_safe = jnp.where(jnp.abs(g) < 1e-4, jnp.float32(1.0), g)
    stm_s = P(_P_STMS)
    maj = jnp.maximum(P(_P_MAJ), 1e-12)
    stc_s = P3(_P_STCS)
    ssu = P3(_P_SSU)
    w_real = P3(_P_WR)
    eps = P(_P_EPS)
    bmin = P3(_P_BMIN)
    bmax = P3(_P_BMAX)
    dmin = P3(_P_DMIN)
    invh = P3(_P_INVH)
    beam_o = P3(_P_BEAMO)
    beam_d = P3(_P_BEAMD)
    beam_pw = P3(_P_BEAMP)
    bs0 = P(_P_BS0)
    bs1 = P(_P_BS1)
    resx = jnp.float32(nx - 1)
    resy = jnp.float32(ny - 1)
    resz = jnp.float32(nz - 1)
    INV4PI = jnp.float32(0.07957747154594767)

    def hg_eval(cos_fwd):
        """phase eval with cos_forward = dot(wi, wo) (phase.py:76-82)."""
        temp = jnp.maximum(1.0 + g * g - 2.0 * g * cos_fwd, 1e-12)
        v = INV4PI * (1.0 - g * g) / (temp * jnp.sqrt(temp))
        return jnp.where(jnp.abs(g) < 1e-4, INV4PI, v)

    def ray_aabb(o, d):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12,
                              jnp.where(d < 0, -1e-12, 1e-12), d)
        ta = (bmin - o) * inv
        tb = (bmax - o) * inv
        t0 = jnp.max(jnp.minimum(ta, tb), axis=0, keepdims=True)
        t1 = jnp.min(jnp.maximum(ta, tb), axis=0, keepdims=True)
        return t0, t1

    def tap(p, u3x, u3y, u3z):
        xv = (p - dmin) * invh
        px_ = xv[0:1, :]
        py_ = xv[1:2, :]
        pz_ = xv[2:3, :]
        inside = ((px_ >= 0.0) & (px_ <= resx) & (py_ >= 0.0)
                  & (py_ <= resy) & (pz_ >= 0.0) & (pz_ <= resz))
        px_ = jnp.clip(px_, 0.0, resx)
        py_ = jnp.clip(py_, 0.0, resy)
        pz_ = jnp.clip(pz_, 0.0, resz)

        def corner(v, u, hi):
            base = jnp.floor(v)
            c = base + (u < v - base).astype(jnp.float32)
            return jnp.minimum(c, hi).astype(jnp.int32)

        cx = corner(px_, u3x, resx)
        cy = corner(py_, u3y, resy)
        cz = corner(pz_, u3z, resz)
        r_idx = ((cz >> 3) * nby + (cy >> 3)) * nbx + (cx >> 3)
        j_idx = (((cz & 7) * 8) + (cy & 7)) * 8 + (cx & 7)
        oh_r = (iota_r == r_idx).astype(jnp.float32).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            tab_ref[:], oh_r, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        oh_j = (iota_j == j_idx).astype(jnp.float32)
        S = jnp.sum(rows * oh_j, axis=0, keepdims=True)
        return jnp.where(inside, S, 0.0)

    def body(carry):
        # per-lane state lives in the VMEM scratch st_s: ref READS give
        # Mosaic sublane-replicated (1,B) layouts, which the one-hot
        # broadcasts ((R,B)/(96,B) compares) require — loop-carried
        # vectors are sublane-pinned and those broadcasts fail to lower
        # ("Sublane broadcast not implemented"). Rows:
        #   0 m, 1 t, 2 t_end, 3 depth, 4 idx, 5 sh_seg, 6 sh_t,
        #   7 cont_ok, 8 segs, 9 taps, 10 ctr (f32; trip counts stay well
        #   under 2^24), 11:14 p, 14:17 d, 17:20 tp, 20:23 L, 23:26 sh_o,
        #   26:29 sh_d, 29:32 sh_tr, 32:35 sh_val, 35:38 cont_p,
        #   38:41 cont_d
        trips, _done = carry
        m = st_s[0:1, :]
        t = st_s[1:2, :]
        t_end = st_s[2:3, :]
        depth = st_s[3:4, :]
        idx = st_s[4:5, :]
        sh_seg = st_s[5:6, :]
        sh_t = st_s[6:7, :]
        cont_ok = st_s[7:8, :]
        segs = st_s[8:9, :]
        taps = st_s[9:10, :]
        ctrf = st_s[10:11, :]
        p = st_s[11:14, :]
        d = st_s[14:17, :]
        tp = st_s[17:20, :]
        L = st_s[20:23, :]
        sh_o = st_s[23:26, :]
        sh_d = st_s[26:29, :]
        sh_tr = st_s[29:32, :]
        sh_val = st_s[32:35, :]
        cont_p = st_s[35:38, :]
        cont_d = st_s[38:41, :]
        m0 = m                                    # mode at trip start

        ctr = ctrf.astype(jnp.int32).astype(jnp.uint32)
        bits = []
        b = (laneu ^ jnp.uint32(0x9E3779B9)) + ctr * jnp.uint32(0x85EBCA6B) \
            + seed
        for k in range(9):
            b = _hash(b + jnp.uint32((0x68E31DA4 + 0x3504F333 * k)
                                     & 0xFFFFFFFF))
            bits.append(b)
        u = [_unif(x) for x in bits]
        ctrf = ctrf + jnp.where(m < 2.5, 9.0, 0.0)

        # ================= mode 0: regenerate =================
        regen = m == 0.0
        has_more = idx + 1.0 < jnp.float32(sppc)
        start = regen & has_more
        m = jnp.where(regen & ~has_more, 3.0, m)
        idx = idx + jnp.where(start, 1.0, 0.0)
        idxi = idx.astype(jnp.int32)
        pix = (lane + idxi * stride) % npix
        fx = (pix % W_img).astype(jnp.float32) + u[0]
        fy = (pix // W_img).astype(jnp.float32) + u[1]
        ndc_x = 2.0 * fx / jnp.float32(W_img) - 1.0
        ndc_y = 2.0 * fy / jnp.float32(H_img) - 1.0
        dc_x = -ndc_x * P(_P_TANX)
        dc_y = -ndc_y * P(_P_TANY)
        dw = jnp.concatenate([
            camR[0] * dc_x + camR[1] * dc_y + camR[2],
            camR[3] * dc_x + camR[4] * dc_y + camR[5],
            camR[6] * dc_x + camR[7] * dc_y + camR[8],
        ], axis=0)
        dw = dw / jnp.sqrt(jnp.sum(dw * dw, axis=0, keepdims=True))
        ow = P3(_P_CAMO) * jnp.ones((3, B), jnp.float32)
        t0c, t1c = ray_aabb(ow, dw)
        t0c = jnp.maximum(t0c, 0.0)
        hitbox = (t1c > t0c + 2.0 * eps) & start
        p = jnp.where(start, ow + (t0c + eps) * dw, p)
        d = jnp.where(start, dw, d)
        t = jnp.where(start, 0.0, t)
        t_end = jnp.where(start, t1c - t0c - 2.0 * eps, t_end)
        tp = jnp.where(start, 1.0, tp)
        depth = jnp.where(start, 1.0, depth)
        L = jnp.where(start, 0.0, L)
        m = jnp.where(hitbox, 1.0, m)     # miss: stay 0 (L=0 sample done)
        segs = segs + jnp.where(start, 1.0, 0.0) \
            + jnp.where(hitbox, 1.0, 0.0)

        # ============ one density tap serves ext OR shadow ============
        trk = m == 1.0
        shd = m0 == 2.0
        t_new = t - jnp.log(jnp.maximum(1.0 - u[2], 1e-12)) / maj
        sh_new = sh_t - jnp.log(jnp.maximum(1.0 - u[2], 1e-12)) / maj
        x_ext = p + t_new * d
        x_sh = sh_o + sh_new * sh_d
        pos = jnp.where(shd, x_sh, x_ext)
        S = tap(pos, u[3], u[4], u[5])
        taps = taps + jnp.where(trk | shd, 1.0, 0.0)

        # ================= mode 1: extension =================
        esc = t_new >= t_end
        p_real = S * stm_s / maj
        real = trk & (u[6] < p_real) & ~esc
        nullc = trk & ~esc & ~real
        factor = jnp.maximum(1.0 - S * stc_s / maj, 0.0)
        w_null = factor / jnp.maximum(1.0 - p_real, 1e-12)
        tp = jnp.where(nullc, tp * w_null, tp)
        t = jnp.where(trk, jnp.minimum(t_new, t_end), t)
        fin_esc = trk & esc
        segs = segs + jnp.where(fin_esc, 1.0, 0.0)  # vacuum exit leg

        x = p + t * d
        tp = jnp.where(real, tp * w_real, tp)
        depth_ok = depth < jnp.float32(max_depth)
        die_depth = real & ~depth_ok

        # ---- beam NEE (equiangular, volpath.py:179-196) ----
        delta = jnp.sum((x - beam_o) * beam_d, axis=0, keepdims=True)
        closest = beam_o + delta * beam_d
        hdist = jnp.sqrt(jnp.maximum(
            jnp.sum((x - closest) ** 2, axis=0, keepdims=True), 1e-12))
        th_a = _atan((bs0 - delta) / hdist)
        th_b = _atan((bs1 - delta) / hdist)
        th = th_a + u[7] * (th_b - th_a)
        s_rel = hdist * jnp.sin(th) / jnp.maximum(jnp.abs(jnp.cos(th)),
                                                  1e-9) \
            * jnp.where(jnp.cos(th) < 0, -1.0, 1.0)
        s_b = delta + s_rel
        pdf_sb = hdist / jnp.maximum(
            (th_b - th_a) * (hdist * hdist + s_rel * s_rel), 1e-12)
        y = beam_o + s_b * beam_d
        to_x = x - y
        dist_b = jnp.sqrt(jnp.maximum(
            jnp.sum(to_x * to_x, axis=0, keepdims=True), 1e-12))
        d_yp = to_x / dist_b
        fb = (s_b - bs0) / jnp.maximum(bs1 - bs0, 1e-9) \
            * jnp.float32(BEAM_N) - 0.5
        fb = jnp.clip(fb, 0.0, jnp.float32(BEAM_N - 1))
        ib = jnp.floor(fb)
        frb = fb - ib
        oh_b = (iota_beam == ib.astype(jnp.int32)).astype(jnp.float32)
        brow = jax.lax.dot_general(
            beam_ref[:], oh_b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        tau_b = brow[0:3, :] + brow[3:6, :] * frb
        tau_b = jnp.where(s_b < bs0, 0.0, tau_b)
        tr_beam = jnp.exp(-tau_b)
        sigs_y = ssu * brow[6:7, :]            # table dens already scaled
        rho_y = hg_eval(jnp.sum(beam_d * d_yp, axis=0, keepdims=True))
        bval = beam_pw * tr_beam * sigs_y * rho_y \
            / jnp.maximum(pdf_sb * dist_b * dist_b, 1e-12)
        f_x = hg_eval(jnp.sum(d * -d_yp, axis=0, keepdims=True))
        val = tp * f_x * bval
        nee_ok = real & depth_ok \
            & (jnp.max(val, axis=0, keepdims=True) > 0.0)

        # ---- HG/iso continuation direction ----
        sqr = (1.0 - g * g) / (1.0 - g + 2.0 * g * u[0])
        cth_a = (1.0 + g * g - sqr * sqr) / (2.0 * g_safe)
        cth = jnp.where(jnp.abs(g) < 1e-4, 1.0 - 2.0 * u[0], cth_a)
        sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
        phi = jnp.float32(6.283185307179586) * u[1]
        lx = sth * jnp.cos(phi)
        ly = sth * jnp.sin(phi)
        dz = d[2:3, :]
        sgn = jnp.where(dz >= 0.0, 1.0, -1.0)
        a_f = -1.0 / (sgn + dz)
        b_f = d[0:1, :] * d[1:2, :] * a_f
        new_d = jnp.concatenate([
            lx * (1.0 + sgn * d[0:1, :] * d[0:1, :] * a_f) + ly * b_f
            + cth * d[0:1, :],
            lx * (sgn * b_f) + ly * (sgn + d[1:2, :] * d[1:2, :] * a_f)
            + cth * d[1:2, :],
            lx * (-sgn * d[0:1, :]) + ly * (-d[1:2, :]) + cth * d[2:3, :],
        ], axis=0)

        # ---- RR (common.russian_roulette, eta_scale=1) ----
        q = jnp.minimum(jnp.max(tp, axis=0, keepdims=True), 0.95)
        do_rr = depth >= jnp.float32(rr_depth)
        survive = ~do_rr | (u[8] < q)
        tp = jnp.where(real & do_rr, tp / jnp.maximum(q, 1e-6), tp)
        cont_after = real & depth_ok & survive
        depth = jnp.where(real & depth_ok, depth + 1.0, depth)

        cont_p = jnp.where(real, x, cont_p)
        cont_d = jnp.where(real, new_d, cont_d)
        cont_ok = jnp.where(real, jnp.where(cont_after, 1.0, 0.0), cont_ok)
        go_shadow = nee_ok
        m = jnp.where(go_shadow, 2.0, m)
        sh_o = jnp.where(go_shadow, y + d_yp * eps, sh_o)
        sh_d = jnp.where(go_shadow, d_yp, sh_d)
        sh_seg = jnp.where(go_shadow, dist_b - 2.0 * eps, sh_seg)
        sh_t = jnp.where(go_shadow, 0.0, sh_t)
        sh_tr = jnp.where(go_shadow, 1.0, sh_tr)
        sh_val = jnp.where(go_shadow, val, sh_val)
        segs = segs + jnp.where(go_shadow, 1.0, 0.0)
        resume_now = real & ~nee_ok & cont_after
        die_now = (real & ~nee_ok & ~cont_after) | die_depth

        # ================= mode 2: shadow (trip-start lanes) ============
        sh_esc = sh_new >= sh_seg
        upd = shd & ~sh_esc
        fac2 = factor                          # same S serves the shadow tap
        sh_tr = jnp.where(upd, sh_tr * fac2, sh_tr)
        sh_t = jnp.where(shd, jnp.minimum(sh_new, sh_seg), sh_t)
        tr_dead = jnp.max(sh_tr, axis=0, keepdims=True) <= 0.0
        sh_done = shd & (sh_esc | tr_dead)
        L = L + jnp.where(sh_done & ~tr_dead, sh_val * sh_tr, 0.0)
        res_sh = sh_done & (cont_ok > 0.5)
        die_sh = sh_done & ~(cont_ok > 0.5)

        # ---- resume the stashed continuation ----
        res_any = resume_now | res_sh
        p = jnp.where(res_any, cont_p + cont_d * eps, p)
        d = jnp.where(res_any, cont_d, d)
        _, t1r = ray_aabb(p, d)
        t = jnp.where(res_any, 0.0, t)
        t_end = jnp.where(res_any, jnp.maximum(t1r - eps, 0.0), t_end)
        m = jnp.where(res_any, 1.0, m)
        segs = segs + jnp.where(res_any, 1.0, 0.0)

        # ---- flush finished samples ----
        fin = fin_esc | die_now | die_sh
        oh_ep = (iota_ep == idxi).astype(jnp.float32) \
            * jnp.where(fin, 1.0, 0.0)
        Lrow = jnp.where(iota_ch == 0, L[0:1, :],
                         jnp.where(iota_ch == 1, L[1:2, :], L[2:3, :]))
        pend_s[:] = pend_s[:] + oh_ep * Lrow
        m = jnp.where(fin, 0.0, m)
        L = jnp.where(fin, 0.0, L)

        st_s[0:1, :] = m
        st_s[1:2, :] = t
        st_s[2:3, :] = t_end
        st_s[3:4, :] = depth
        st_s[4:5, :] = idx
        st_s[5:6, :] = sh_seg
        st_s[6:7, :] = sh_t
        st_s[7:8, :] = cont_ok
        st_s[8:9, :] = segs
        st_s[9:10, :] = taps
        st_s[10:11, :] = ctrf
        st_s[11:14, :] = p
        st_s[14:17, :] = d
        st_s[17:20, :] = tp
        st_s[20:23, :] = L
        st_s[23:26, :] = sh_o
        st_s[26:29, :] = sh_d
        st_s[29:32, :] = sh_tr
        st_s[32:35, :] = sh_val
        st_s[35:38, :] = cont_p
        st_s[38:41, :] = cont_d
        return (trips + 1, jnp.min(m))

    def cond(carry):
        return (carry[0] < max_trips) & (carry[1] < 2.5)

    st_s[:] = jnp.zeros((48, B), jnp.float32)
    st_s[4:5, :] = jnp.full((1, B), -1.0, jnp.float32)   # idx
    st_s[14:17, :] = jnp.ones((3, B), jnp.float32)       # d (any unit-ish)
    pend_s[:] = jnp.zeros((sppc * 3, B), jnp.float32)
    out = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))
    trips = out[0]
    out_ref[0:sppc * 3, :] = pend_s[:]
    out_ref[sppc * 3:sppc * 3 + 1, :] = st_s[8:9, :]
    out_ref[sppc * 3 + 1:sppc * 3 + 2, :] = st_s[9:10, :]
    out_ref[sppc * 3 + 2:sppc * 3 + 3, :] = jnp.broadcast_to(
        trips.astype(jnp.float32), (1, B))
    out_ref[sppc * 3 + 3:sppc * 3 + 4, :] = st_s[4:5, :]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "sppc", "B", "interpret"),
                   keep_unused=True)
def render_boxwalk(scene: Scene, cfg: RenderConfig, sppc: int, seed,
                   pass_idx, B: int = 1024, interpret: bool = False):
    """One sppc-sample pass; returns ((npix,3) radiance sum, stats) with
    render_wavefront-compatible stats (segments, taps, iters, unfinished).
    """
    H, W_img = cfg.height, cfg.width
    npix = H * W_img
    stride = 104729 % npix
    assert sppc <= 64, "boxwalk: epoch rows capped at 64 spp per pass"

    mega = megatrack.MegaTable(scene.media)
    bricks = medium_m.DensityBricks(scene.media, dtype=jnp.bfloat16)
    beam = get_beam(scene)
    beam_tab = jnp.transpose(build_beam_tau(scene, beam, bricks,
                                            n=BEAM_N))      # (8, 256)
    _, sa, ss, _, scale = medium_m.params(
        scene.media, jnp.zeros((1,), jnp.int32))
    sa, ss, scale = sa[0], ss[0], scale[0]
    stc_u = sa + ss
    stm_u = jnp.mean(stc_u)
    majorant = jnp.maximum(scene.media.majorant * jnp.max(stc_u), 1e-6)
    w_real = ss / jnp.maximum(stm_u, 1e-12)
    eps = common.scene_epsilon(scene)
    g = scene.media.phase.g[0] \
        * (scene.media.phase.kind[0] == PH_HG).astype(jnp.float32)

    Rm = scene.sensor.to_world[:3, :3]
    cam_o = scene.sensor.to_world[:3, 3]
    params = jnp.concatenate([
        Rm.reshape(-1), cam_o,
        scene.sensor.tan_x.reshape(1), scene.sensor.tan_y.reshape(1),
        scene.aabb_min, scene.aabb_max,
        beam.o, beam.d, beam.power,
        beam.s0.reshape(1), beam.s1.reshape(1),
        g.reshape(1),
        ss, stc_u * scale,
        (stm_u * scale).reshape(1), majorant.reshape(1),
        scene.media.density.aabb_min, mega.inv_h,
        w_real,
        eps.reshape(1),
    ]).astype(jnp.float32)

    seed_u = (jnp.asarray(seed, jnp.uint32)
              ^ (jnp.asarray(pass_idx, jnp.uint32)
                 * jnp.uint32(0x9E3779B9) + jnp.uint32(0x7F4A7C15)))
    npad = -(-npix // B) * B
    max_trips = sppc * (8 * cfg.max_depth + 48) + 256
    kern = functools.partial(
        _kernel, B, sppc, cfg.max_depth, cfg.rr_depth, W_img, H, npix,
        stride, mega.res, mega.nb, max_trips)
    out = pl.pallas_call(
        kern,
        grid=(npad // B,),
        out_shape=jax.ShapeDtypeStruct((sppc * 3 + 4, npad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(mega.table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(beam_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((sppc * 3 + 4, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((48, B), jnp.float32),
            pltpu.VMEM((sppc * 3, B), jnp.float32),
        ],
        interpret=interpret,
    )(params, jnp.reshape(seed_u, (1,)), mega.table, beam_tab)
    out = out[:, :npix]
    film = jnp.zeros((npix, 3), jnp.float32)
    pend = out[:sppc * 3].reshape(sppc, 3, npix)
    for j in range(sppc):
        film = film + jnp.roll(jnp.transpose(pend[j]), j * stride, axis=0)
    segs = jnp.sum(out[sppc * 3]).astype(jnp.uint32)
    taps = jnp.sum(out[sppc * 3 + 1]).astype(jnp.uint32)
    iters = jnp.max(out[sppc * 3 + 2]).astype(jnp.int32)
    unfinished = jnp.sum(
        out[sppc * 3 + 3] < (sppc - 1)).astype(jnp.uint32)
    return film, (segs, taps, iters, unfinished)
