"""On-device microbench v3: robust against axon async weirdness.
Each op is repeated K times INSIDE one jit via fori_loop (data-dependent
chain prevents elimination); per-op time = (t(K_big) - t(K_small)) / dK,
with every call synced by pulling the scalar to host."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def dev(x):
    return jax.block_until_ready(jax.device_put(x))


def run_sync(f, *args):
    return float(f(*args))


def rate(f, args, K_small=4, K_big=24, reps=5):
    """f(K, *args) runs the op K times chained. Returns seconds per op."""
    run_sync(f, K_small, *args)
    run_sync(f, K_big, *args)
    ts, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run_sync(f, K_small, *args)
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_sync(f, K_big, *args)
        tb.append(time.perf_counter() - t0)
    return (min(tb) - min(ts)) / (K_big - K_small)


NZ = NY = NX = 64
NCELL = NZ * NY * NX
grid_np = rng.standard_normal((NZ, NY, NX)).astype(np.float32)
flat = dev(grid_np.reshape(-1))
N = 1 << 20


def perturb(idx, i, rows):
    return (idx + i * 1664525) % rows


from functools import partial


@partial(jax.jit, static_argnums=0)
def g_scalar(K, tbl, idx0):
    def body(i, acc):
        idx = perturb(idx0 + acc.astype(jnp.int32)[..., None][..., 0] * 0, i, tbl.shape[0])
        # cheap data dependence: shift indices by last acc bit
        return acc + jnp.take(tbl, idx).sum()
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))


def make_row_bench(width):
    tbl = dev(rng.standard_normal((4096, width)).astype(np.float32))
    idx0 = dev(rng.integers(0, 4096, N).astype(np.int32))

    @partial(jax.jit, static_argnums=0)
    def g(K, tbl, idx0):
        def body(i, acc):
            idx = perturb(idx0, i + (acc > 1e30).astype(jnp.int32), 4096)
            return acc + jnp.take(tbl, idx, axis=0)[:, 0].sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return g, (tbl, idx0)


def bench_gathers():
    print(f"== gather rates (in-jit repeated), N={N} ==")
    idx0 = dev(rng.integers(0, NCELL, N).astype(np.int32))

    @partial(jax.jit, static_argnums=0)
    def gs(K, tbl, idx0):
        def body(i, acc):
            idx = perturb(idx0, i + (acc > 1e30).astype(jnp.int32), NCELL)
            return acc + jnp.take(tbl, idx).sum()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    dt = rate(gs, (flat, idx0))
    print(f"  scalar gather (262144-table): {dt*1e3:.3f} ms/op -> {N/dt/1e6:.1f} Mrows/s")

    for width in [8, 16, 128]:
        g, args = make_row_bench(width)
        dt = rate(g, args)
        print(f"  row gather width {width} (4096-table): {dt*1e3:.3f} ms/op -> {N/dt/1e6:.1f} Mrows/s")


def bench_elementwise():
    print("== VPU / HBM reference ops ==")
    x0 = dev(rng.standard_normal((N,)).astype(np.float32))

    @partial(jax.jit, static_argnums=0)
    def ew(K, x):
        def body(i, v):
            return v * 0.9999 + 0.001
        return jax.lax.fori_loop(0, K, body, x).sum()

    dt = rate(ew, (x0,), K_small=8, K_big=108)
    print(f"  (N,) fma: {dt*1e6:.1f} us/op -> {N/dt/1e9:.2f} Gelem/s")

    x1 = dev(rng.standard_normal((N, 8)).astype(np.float32))

    @partial(jax.jit, static_argnums=0)
    def ew8(K, x):
        def body(i, v):
            return v * 0.9999 + 0.001
        return jax.lax.fori_loop(0, K, body, x).sum()

    dt = rate(ew8, (x1,), K_small=8, K_big=108)
    print(f"  (N,8) fma: {dt*1e6:.1f} us/op -> {8*N/dt/1e9:.2f} Gelem/s")


def bench_trilinear():
    print("== trilinear (in-jit repeated) ==")
    cells_np = np.empty((NZ-1, NY-1, NX-1, 8), np.float32)
    k = 0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                cells_np[..., k] = grid_np[dz:dz+NZ-1, dy:dy+NY-1, dx:dx+NX-1]
                k += 1
    cells = dev(cells_np.reshape(-1, 8))
    p0 = dev(rng.uniform(-0.45, 0.45, (N, 3)).astype(np.float32))

    def tri(cells, p):
        res = jnp.array([NX, NY, NZ], jnp.float32)
        h = 1.0 / (res - 1.0)
        x = jnp.clip((p + 0.5) / h, 0.0, res - 1.0)
        cell = jnp.minimum(jnp.floor(x), res - 2.0).astype(jnp.int32)
        t = x - cell.astype(jnp.float32)
        cx, cy, cz = cell[..., 0], cell[..., 1], cell[..., 2]
        row = jnp.take(cells, (cz * (NY-1) + cy) * (NX-1) + cx, axis=0)
        tx, ty, tz = t[..., 0:1], t[..., 1:2], t[..., 2:3]
        kk = jnp.arange(8)
        w = (jnp.where(kk & 1, tx, 1-tx) * jnp.where(kk & 2, ty, 1-ty)
             * jnp.where(kk & 4, tz, 1-tz))
        return jnp.sum(row * w, axis=-1)

    @partial(jax.jit, static_argnums=0)
    def gt(K, cells, p0):
        def body(i, carry):
            acc, shift = carry
            p = p0 * (1.0 - 0.001 * shift)
            v = tri(cells, p)
            return (acc + v.sum(), shift + 1.0)
        return jax.lax.fori_loop(0, K, body, (jnp.float32(0), jnp.float32(0)))[0]

    dt = rate(gt, (cells, p0))
    print(f"  cellrow8 trilinear: {dt*1e3:.3f} ms/op -> {N/dt/1e6:.1f} Mtaps/s")


def bench_intersect():
    print("== intersect 12 tris (in-jit repeated) ==")
    from mitsubaer_tpu.scene import presets
    scene, _ = presets.volumetric_box(res=64, spp=1, heterogeneous=True,
                                      density_res=64)
    scene = jax.device_put(scene)
    geo = scene.geo
    o0 = dev(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    d_ = rng.standard_normal((N, 3)); d_ /= np.linalg.norm(d_, -1, keepdims=True)
    d0 = dev(d_.astype(np.float32))
    v0n, e1n, e2n = np.asarray(geo.v0), np.asarray(geo.e1), np.asarray(geo.e2)

    def isect_unrolled(o, d):
        best = jnp.full(o.shape[:1], 3e38)
        for i in range(v0n.shape[0]):
            tv0 = jnp.asarray(v0n[i]); te1 = jnp.asarray(e1n[i]); te2 = jnp.asarray(e2n[i])
            pvec = jnp.cross(d, te2[None, :])
            det = pvec @ te1
            ok = jnp.abs(det) > 1e-12
            inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            tvec = o - tv0[None, :]
            u = jnp.sum(tvec * pvec, -1) * inv
            qvec = jnp.cross(tvec, te1[None, :])
            v = jnp.sum(d * qvec, -1) * inv
            t = (qvec @ te2) * inv
            hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
            best = jnp.minimum(best, jnp.where(hit, t, 3e38))
        return best

    @partial(jax.jit, static_argnums=0)
    def gi(K, o0, d0):
        def body(i, carry):
            acc, sh = carry
            o = o0 + sh * 0.001
            t = isect_unrolled(o, d0)
            return (acc + jnp.minimum(t, 100.0).sum(), sh + 1.0)
        return jax.lax.fori_loop(0, K, body, (jnp.float32(0), jnp.float32(0)))[0]

    dt = rate(gi, (o0, d0))
    print(f"  unrolled 12 tris: {dt*1e3:.3f} ms/op -> {N/dt/1e6:.1f} Mrays/s")

    from mitsubaer_tpu.scene import intersect as isect_m

    @partial(jax.jit, static_argnums=0)
    def gc(K, o0, d0):
        def body(i, carry):
            acc, sh = carry
            o = o0 + sh * 0.001
            h = isect_m.intersect(geo, o, d0, jnp.zeros((N,)), jnp.full((N,), 3e38))
            return (acc + jnp.minimum(h.t, 100.0).sum(), sh + 1.0)
        return jax.lax.fori_loop(0, K, body, (jnp.float32(0), jnp.float32(0)))[0]

    dt = rate(gc, (o0, d0), K_small=2, K_big=10)
    print(f"  current intersect: {dt*1e3:.3f} ms/op -> {N/dt/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    print(jax.devices())
    bench_elementwise()
    bench_gathers()
    bench_trilinear()
    bench_intersect()
