"""Irradiance caching (reference: src/integrators/misc/irrcache.cpp —
Ward/Krivanek cache wrapped around a diffuse base integrator).

TPU-native redesign: the reference's octree of lazily-inserted records
with pointer traversal is replaced by a DENSE two-pass scheme that maps
onto the MXU/VPU instead of branchy tree walks:

1. **Record pass**: cache sites are a stratified subsample of the first
   diffuse camera hits (every k-th pixel). Each site's indirect
   irradiance is estimated by cosine-weighted hemisphere sampling with
   full path-traced incident radiance (path.li, hide_emitters-style
   direct exclusion via a one-bounce offset) — the reference's
   "final gathering" with its base integrator. The harmonic-mean hit
   distance of the gather rays gives the record validity radius R_i
   (irrcache.cpp's classic Ward criterion).
2. **Interpolation pass**: every pixel evaluates ALL records' Ward
   weights w_i = 1/(|x-x_i|/R_i + sqrt(1-n.n_i)) in one dense
   (npix, S) computation and blends records with w_i > 1/alpha;
   pixels with no valid record fall back to the nearest record
   (a dense argmax — no octree, no divergent queries).

Direct lighting + emitter hits render analytically on top (one-sample
NEE), matching the reference's separation where the cache serves only
indirect diffuse irradiance. Biased-smooth like the original; the test
gates the mean against the unbiased path tracer.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng, smalltab, warp
from ..core.math import Frame, dot
from ..models import bsdf as bsdf_m
from ..models import emitter as emitter_m
from ..models import sensor as sensor_m
from ..scene import intersect as isect
from ..scene.types import BSDF_DIFFUSE, RenderConfig, Scene
from . import common
from .path import li as path_li
from .volpath import _is_null_surface, _shape_tables

INV_PI = 0.3183098861837907


@functools.partial(jax.jit, static_argnames=("cfg", "n_sites", "n_hemi"),
                   keep_unused=True)
def _irrcache_pass(scene: Scene, cfg: RenderConfig, seed, pass_idx,
                   n_sites: int = 256, n_hemi: int = 32,
                   alpha: float = 0.35):
    H, W = cfg.height, cfg.width
    npix = H * W
    eps = common.scene_epsilon(scene)
    act = cfg.bsdf_kinds or None

    # ---- camera hits ----
    pixel = jnp.arange(npix, dtype=jnp.uint32)
    smp = rng.make_sampler(seed, pixel, pass_idx, n_samples=max(cfg.spp, 1))
    jit2, smp = rng.next_2d(smp)
    px = (pixel % W).astype(jnp.float32) + jit2[:, 0]
    py = (pixel // W).astype(jnp.float32) + jit2[:, 1]
    rays = sensor_m.sample_rays(scene.sensor, px, py, W, H)
    hit = isect.intersect(scene.geo, rays.o, rays.d,
                          jnp.full((npix,), eps), jnp.full((npix,),
                                                           isect.INF))
    b_idx, e_idx, _, _ = _shape_tables(scene, hit.shape_id)
    is_null = _is_null_surface(scene, b_idx)
    nb = scene.bsdfs.kind.shape[0]
    bk = jnp.where(b_idx >= 0, smalltab.take(
        scene.bsdfs.kind, jnp.clip(b_idx, 0, nb - 1)), -1)
    refl = smalltab.take(scene.bsdfs.reflectance, jnp.clip(b_idx, 0, nb - 1))
    diffuse = hit.valid & (bk == BSDF_DIFFUSE) & ~is_null

    L = jnp.zeros((npix, 3), jnp.float32)
    env = emitter_m.env_radiance(scene, rays.d)
    L = L + jnp.where(hit.valid[..., None], 0.0, env)
    le = emitter_m.eval_hit(scene, e_idx, hit.ng, -rays.d)
    L = L + jnp.where((hit.valid & (e_idx >= 0))[..., None], le, 0.0)

    # ---- direct NEE at diffuse hits ----
    u2, smp = rng.next_2d(smp)
    u1, smp = rng.next_1d(smp)
    ds = emitter_m.sample_direct(scene, hit.p, u2, u1)
    frame = Frame.from_normal(hit.ng)
    f = bsdf_m.eval(scene.bsdfs, b_idx, frame.to_local(-rays.d),
                    frame.to_local(ds.d), active=act)
    shit = isect.intersect(scene.geo, hit.p + ds.d * eps, ds.d,
                           jnp.full((npix,), eps * 0.5),
                           jnp.maximum(ds.dist - 2 * eps, 0.0))
    vis = ~shit.valid
    ok = diffuse & vis & (ds.pdf > 0)
    L = L + jnp.where(ok[..., None],
                      f * ds.value / jnp.maximum(ds.pdf, 1e-12)[..., None],
                      0.0)

    # ---- record pass: stratified site subset of the diffuse hits ----
    stride = max(npix // n_sites, 1)
    site_pix = (jnp.arange(n_sites) * stride + stride // 2) % npix
    sp = jnp.take(hit.p, site_pix, axis=0)
    sn = jnp.take(hit.ng, site_pix, axis=0)
    s_ok = jnp.take(diffuse, site_pix)

    # hemisphere gather: n_sites x n_hemi cosine-weighted rays
    lane = jnp.arange(n_sites * n_hemi, dtype=jnp.uint32)
    gs = rng.make_sampler(seed ^ jnp.uint32(0x1CC), lane, pass_idx)
    ug, gs = rng.next_2d(gs)
    wo_l = warp.square_to_cosine_hemisphere(ug)
    sfr = Frame.from_normal(jnp.repeat(sn, n_hemi, axis=0))
    wo_w = sfr.to_world(wo_l)
    go = jnp.repeat(sp, n_hemi, axis=0) + wo_w * eps
    # incident radiance via the base path integrator (indirect only:
    # direct hits of emitters at depth 1 are already covered by NEE, so
    # hide them from the gather like the reference's indirectOnly mode)
    # hide_emitters=True: a gather ray seeing the light directly is
    # DIRECT irradiance at the site, already added by the camera NEE
    gcfg = cfg._replace(max_depth=max(cfg.max_depth - 1, 2),
                        hide_emitters=True)
    sink, gs = path_li(scene, gcfg, go, wo_w, gs)
    Li_in = sink.steady
    ghit = isect.intersect(scene.geo, go, wo_w,
                           jnp.full((n_sites * n_hemi,), eps),
                           jnp.full((n_sites * n_hemi,), isect.INF))
    # E = pi * mean(Li) under cosine sampling; R = harmonic mean distance
    Ei = jnp.pi * jnp.mean(Li_in.reshape(n_sites, n_hemi, 3), axis=1)
    inv_t = jnp.where(ghit.valid, 1.0 / jnp.maximum(ghit.t, 1e-4), 0.0)
    denom = jnp.sum(inv_t.reshape(n_sites, n_hemi), axis=1)
    Ri = jnp.where(denom > 0, n_hemi / jnp.maximum(denom, 1e-6), 1e3)
    ext = jnp.max(scene.aabb_max - scene.aabb_min)
    Ri = jnp.clip(Ri, 0.01 * ext, 0.5 * ext)

    # ---- dense Ward interpolation over all records ----
    dx = hit.p[:, None, :] - sp[None, :, :]          # (npix, S, 3)
    dist = jnp.linalg.norm(dx, axis=-1)
    ndot = jnp.clip(jnp.sum(hit.ng[:, None, :] * sn[None, :, :], -1),
                    -1.0, 1.0)
    wi = 1.0 / jnp.maximum(dist / Ri[None, :]
                           + jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0)), 1e-6)
    wi = jnp.where(s_ok[None, :] & (ndot > 0), wi, 0.0)
    use = wi > (1.0 / alpha)
    wsel = jnp.where(use, wi, 0.0)
    wsum = jnp.sum(wsel, axis=1)
    E_blend = jnp.einsum("ps,sc->pc", wsel, Ei) \
        / jnp.maximum(wsum, 1e-12)[..., None]
    # fallback: nearest record by weight
    near = jnp.argmax(wi, axis=1)
    E_near = jnp.take(Ei, near, axis=0)
    E = jnp.where((wsum > 0)[..., None], E_blend, E_near)

    L = L + jnp.where(diffuse[..., None], refl * INV_PI * E, 0.0)
    return L


def render_irrcache(scene: Scene, cfg: RenderConfig, seed: int = 0,
                    n_sites: int = 256, n_hemi: int = 32):
    """Irradiance-cached render; cfg.spp averages independent passes
    (jittered primaries + fresh records). Returns (H, W, 3)."""
    H, W = cfg.height, cfg.width
    img = jnp.zeros((H * W, 3), jnp.float32)
    passes = max(cfg.spp // 4, 1)
    for i in range(passes):
        img = img + _irrcache_pass(scene, cfg, jnp.uint32(seed),
                                   jnp.uint32(i), n_sites=n_sites,
                                   n_hemi=n_hemi)
    return (img / passes).reshape(H, W, 3)
