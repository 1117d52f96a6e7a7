"""Microbench: unrolled MT intersect, (N,3)-vector form vs component form."""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mitsubaer_tpu.scene import presets, intersect as isect

res = 512
scene, cfg = presets.volumetric_box(res=res, spp=1, heterogeneous=True,
                                    density_res=64)
scene = jax.device_put(scene)
geo = scene.geo
n = res * res
print("tris:", geo.v0.shape[0])


def vec_form(geo, o, d):
    nl = o.shape[0]
    best_t = jnp.full((nl,), isect.INF)
    best_prim = jnp.zeros((nl,), jnp.int32)
    best_u = jnp.zeros((nl,))
    best_v = jnp.zeros((nl,))
    for i in range(geo.v0.shape[0]):
        tv0, te1, te2 = geo.v0[i], geo.e1[i], geo.e2[i]
        pvec = jnp.cross(d, te2[None, :])
        det = pvec @ te1
        ok = jnp.abs(det) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        tvec = o - tv0[None, :]
        u = jnp.sum(tvec * pvec, -1) * inv
        qvec = jnp.cross(tvec, te1[None, :])
        v = jnp.sum(d * qvec, -1) * inv
        t = (qvec @ te2) * inv
        hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
        closer = hit & (t < best_t)
        best_t = jnp.where(closer, t, best_t)
        best_prim = jnp.where(closer, i, best_prim)
        best_u = jnp.where(closer, u, best_u)
        best_v = jnp.where(closer, v, best_v)
    return best_t, best_prim, best_u, best_v


def bench(name, fn):
    @partial(jax.jit, static_argnums=(0,))
    def run(k, seed):
        key = jax.random.PRNGKey(seed)
        o = jax.random.normal(key, (n, 3)) * 0.1 + jnp.array([-3.0, 0, 0])
        d0 = jax.random.normal(jax.random.fold_in(key, 1), (n, 3))
        d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)

        def body(i, c):
            o2 = o + c[..., None] * 1e-6
            t, p, u, v = fn(geo, o2, d0)
            return c + t * 0.0 + u + v

        return jax.lax.fori_loop(0, k, body, jnp.zeros((n,))).sum()

    float(run(2, 0)); float(run(12, 0))
    ts = []
    for r in range(3):
        t0 = time.perf_counter(); float(run(2, r)); t1 = time.perf_counter()
        float(run(12, r)); t2 = time.perf_counter()
        ts.append((t2 - t1 - (t1 - t0)) / 10)
    print(f"{name}: {min(ts)*1e3:.3f} ms/call", flush=True)


bench("component", lambda g, o, d: isect._tri_unrolled_hit(g, o, d))
bench("vector   ", vec_form)
