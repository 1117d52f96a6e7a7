"""TPU: fused-Pallas vs XLA trilinear equivalence + tracking-iter timing."""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial
import jax, jax.numpy as jnp, numpy as np
from mitsubaer_tpu.scene import presets
from mitsubaer_tpu.models import medium as medium_m

scene, cfg = presets.volumetric_box(res=256, spp=4, heterogeneous=True, density_res=64)
scene = jax.device_put(scene)
bricks = medium_m.DensityBricks(scene.media, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
p = jnp.asarray(rng.uniform(-1.1, 1.1, (1 << 18, 3)), jnp.float32)

@jax.jit
def f_fused(p):
    return bricks.lookup(p, fused=True)

@jax.jit
def f_xla(p):
    return bricks.lookup(p, fused=False)

a = np.asarray(f_fused(p)); b = np.asarray(f_xla(p))
print("max abs diff", np.abs(a - b).max(), "mean val", b.mean())

@partial(jax.jit, static_argnums=(1, 2))
def loop(p, k, fused, salt):
    def body(i, acc):
        q = p * (1.0 + 1e-6 * acc) + salt * 1e-9
        return acc * 0.5 + bricks.lookup(q, fused=fused).sum()
    return jax.lax.fori_loop(0, k, body, jnp.float32(0))

def t(fused, ks=4, kb=24, reps=3):
    float(loop(p, ks, fused, jnp.float32(0))); float(loop(p, kb, fused, jnp.float32(0)))
    ts, tb = [], []
    for r in range(reps):
        t0 = time.perf_counter(); float(loop(p, ks, fused, jnp.float32(r))); ts.append(time.perf_counter()-t0)
        t0 = time.perf_counter(); float(loop(p, kb, fused, jnp.float32(r))); tb.append(time.perf_counter()-t0)
    return (min(tb)-min(ts))/(kb-ks)

print(f"xla tap:   {t(False)*1e3:.3f} ms / 262144 taps")
print(f"fused tap: {t(True)*1e3:.3f} ms / 262144 taps")
