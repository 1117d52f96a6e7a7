"""Render driver: pixels -> camera rays -> integrator -> filtered film.

Replaces the reference's RenderJob/BlockedRenderProcess/Scheduler pipeline
(renderjob.cpp, renderproc.cpp, sched.cpp): there are no work units — the
whole image is one wavefront, jitted once, looped over spp passes on the
host with a donated film accumulator. Multi-chip sharding wraps this same
pass function in shard_map (parallel/driver.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import rng
from ..models import film as film_m
from ..models import sensor as sensor_m
from ..scene.types import RenderConfig, Scene
from . import path as path_m


def get_integrator(name: str):
    if name == "path":
        return path_m.li
    if name in ("volpath", "volpath_simple"):
        from . import volpath as volpath_m

        return functools.partial(volpath_m.li, simple=name.endswith("simple"))
    if name == "direct":
        return functools.partial(path_m.li, )  # direct = path with maxDepth 2
    if name == "ao":
        from . import misc as misc_m

        return misc_m.ao_li
    raise ValueError(f"unknown integrator {name}")


def _sampler_mode(name: str) -> int:
    return {"independent": rng.INDEPENDENT, "lds": rng.LDS,
            "ldsampler": rng.LDS, "stratified": rng.INDEPENDENT}.get(name, rng.INDEPENDENT)


@functools.partial(jax.jit, static_argnames=("cfg", "sppc"), donate_argnums=(1,))
def render_pass(scene: Scene, accum, cfg: RenderConfig, sppc: int, seed, pass_idx):
    """One spp chunk: sppc samples for every pixel."""
    H, W = cfg.height, cfg.width
    npix = H * W
    pixel = jnp.tile(jnp.arange(npix, dtype=jnp.uint32), (sppc,))
    sample_index = jnp.repeat(
        pass_idx * sppc + jnp.arange(sppc, dtype=jnp.uint32), npix
    )
    smp = rng.make_sampler(seed, pixel, sample_index, mode=_sampler_mode(cfg.sampler))

    jitter, smp = rng.next_2d(smp)  # position inside pixel (film dimension 0)
    px = (pixel % W).astype(jnp.float32) + jitter[:, 0]
    py = (pixel // W).astype(jnp.float32) + jitter[:, 1]
    rays = sensor_m.sample_rays(scene.sensor, px, py, W, H)

    if cfg.integrator == "direct":
        cfg = cfg._replace(max_depth=2, integrator="path")
    integrator = get_integrator(cfg.integrator)
    sink, _ = integrator(scene, cfg, rays.o, rays.d, smp, pixel=pixel)

    values = sink.steady.reshape(sppc, H, W, 3)
    jit_r = jitter.reshape(sppc, H, W, 2)
    if cfg.n_frames == 1:
        accum = film_m.splat(accum, values, jit_r, cfg.filter)
    else:
        # steady part of the sink is still splatted into frame 0 (e.g. CW-ToF
        # collapses to one frame); time-binned contributions land directly.
        accum = film_m.splat(accum, values, jit_r, cfg.filter)
        if sink.frames is not None:
            fr = sink.frames.reshape(H, W, cfg.n_frames * 3)
            # box-accumulated bins: weight channel already counts samples via
            # the steady splat; frames are averaged by the same weight.
            accum = accum.at[..., 0 : cfg.n_frames * 3].add(fr)
    return accum


def render(scene: Scene, cfg: RenderConfig = None, spp: int = None, seed: int = 0,
           spp_per_pass: int = None):
    """Render to a developed (H, W, 3*F) image."""
    if cfg is None:
        cfg = RenderConfig()
    if spp is not None:
        cfg = cfg._replace(spp=spp)
    npix = cfg.width * cfg.height
    if spp_per_pass is None:
        # bound wavefront to ~2^21 lanes to fit memory comfortably
        spp_per_pass = max(1, min(cfg.spp, (1 << 21) // max(npix, 1)))
    accum = film_m.new_accumulator(cfg)
    done = 0
    pass_idx = 0
    while done < cfg.spp:
        sppc = min(spp_per_pass, cfg.spp - done)
        accum = render_pass(
            scene, accum, cfg, sppc,
            jnp.asarray(seed, jnp.uint32), jnp.asarray(pass_idx, jnp.uint32),
        )
        done += sppc
        pass_idx += 1
    return film_m.develop(accum)
