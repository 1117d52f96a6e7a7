"""Single-scatter-through-refractive-boundary integrator
(integrators/singlescatter.py; reference src/subsurface/singlescatter.cpp).

Validation design: at eta = 1 the boundary is inert and the exact
single-scatter has a closed quadrature (straight connections, interior-only
attenuation) — this anchors the whole estimator (entry refraction, distance
sampling, connection solve, geometry factor, phase, transmittances) against
an absolute reference. The eta > 1 bending is checked via the Snell
residual inside the solve plus smoke structure."""
import numpy as np
import jax
import jax.numpy as jnp

from mitsubaer_tpu.core import transform as tf
from mitsubaer_tpu.integrators.singlescatter import render_singlescatter
from mitsubaer_tpu.scene.build import SceneBuilder
from mitsubaer_tpu.scene import types as T


def _scene(eta=1.0, sigma_s=0.4, sigma_a=0.05, res=8):
    b = SceneBuilder()
    med = b.add_medium(kind=T.MED_HOMOGENEOUS,
                       sigma_a=(sigma_a,) * 3, sigma_s=(sigma_s,) * 3,
                       phase_kind=T.PH_ISOTROPIC)
    bs = b.add_bsdf(kind=T.BSDF_DIELECTRIC, eta=eta)
    b.add_sphere((0.0, 0.0, 0.0), 1.0, bsdf=bs, interior=med)
    b.add_emitter(T.EM_POINT, radiance=(10.0, 10.0, 10.0),
                  position=(2.5, 1.5, 0.0))
    b.set_perspective_sensor(
        to_world=tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), fov_deg=35)
    b.config = b.config._replace(width=res, height=res, spp=4, filter="box")
    return b.build(), b.config


def _quadrature_eta1(scene, cfg, res, nq=600):
    """Exact eta=1 single scatter by dense quadrature per pixel center."""
    from mitsubaer_tpu.models import sensor as sensor_m

    npix = res * res
    pix = np.arange(npix)
    px = (pix % res) + 0.5
    py = (pix // res) + 0.5
    rays = sensor_m.sample_rays(scene.sensor, jnp.asarray(px, jnp.float32),
                                jnp.asarray(py, jnp.float32), res, res)
    o = np.asarray(rays.o); d = np.asarray(rays.d)
    c = np.zeros(3); R = 1.0
    l = np.array([2.5, 1.5, 0.0])
    sig = 0.45  # sigma_t
    ss = 0.4
    oc = o - c
    b = np.sum(oc * d, -1)
    ct = np.sum(oc * oc, -1) - R * R
    disc = b * b - ct
    hit = disc > 0
    t0 = -b - np.sqrt(np.maximum(disc, 0))
    t1 = -b + np.sqrt(np.maximum(disc, 0))
    out = np.zeros((npix, 3))
    for i in np.nonzero(hit)[0]:
        ts = np.linspace(t0[i], t1[i], nq)
        x = o[i] + ts[:, None] * d[i]
        tin = ts - t0[i]
        to_l = l[None, :] - x
        dist = np.linalg.norm(to_l, axis=-1)
        w = to_l / dist[:, None]
        # interior length of the straight connection: x to sphere exit
        bb = np.sum((x - c) * w, -1)
        cc = np.sum((x - c) ** 2, -1) - R * R
        t_exit = -bb + np.sqrt(np.maximum(bb * bb - cc, 0))
        rho = 1.0 / (4 * np.pi)
        f = ss * rho * np.exp(-sig * tin) * np.exp(-sig * t_exit) \
            * 10.0 / dist ** 2
        out[i, :] = np.trapezoid(f, ts)
    return out.reshape(res, res, 3)


def test_eta1_matches_quadrature():
    res = 8
    scene, cfg = _scene(eta=1.0, res=res)
    img = np.asarray(render_singlescatter(scene, cfg._replace(spp=32),
                                          seed=0, n_dist=4))
    ref = _quadrature_eta1(scene, cfg, res)
    m_img, m_ref = img.mean(), ref.mean()
    assert np.isfinite(img).all()
    assert abs(m_img - m_ref) / m_ref < 0.08, (m_img, m_ref)
    mask = ref[..., 0] > 0.2 * ref[..., 0].max()
    rel = np.abs(img[..., 0] - ref[..., 0])[mask] / ref[..., 0][mask]
    assert np.median(rel) < 0.15


def test_eta133_smoke_and_snell():
    scene, cfg = _scene(eta=1.33, res=8)
    img = np.asarray(render_singlescatter(scene, cfg._replace(spp=8),
                                          seed=0))
    assert np.isfinite(img).all()
    assert img.mean() > 0
    # Snell residual at the solved boundary point
    from mitsubaer_tpu.integrators.singlescatter import _solve_phi

    x = jnp.asarray([[0.2, -0.1, 0.3]])
    l = jnp.asarray([[2.5, 1.5, 0.0]])
    B, ok = _solve_phi(jnp.zeros((1, 3)), 1.0, 1.33, x, l)
    B = np.asarray(B)[0]
    n = B / np.linalg.norm(B)
    wi = (B - np.asarray(x)[0]); wi /= np.linalg.norm(wi)
    wo = (np.asarray(l)[0] - B); wo /= np.linalg.norm(wo)
    sin_i = np.linalg.norm(np.cross(wi, n))
    sin_o = np.linalg.norm(np.cross(wo, n))
    assert bool(np.asarray(ok)[0])
    assert abs(1.33 * sin_i - sin_o) < 1e-3


def _icosphere(r=1.0, subdiv=2):
    """Subdivided octahedron sphere mesh (outward winding)."""
    v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                  [0, 0, 1], [0, 0, -1]], np.float64)
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]], np.int64)
    for _ in range(subdiv):
        nv = list(map(tuple, v))
        index = {tuple(p): i for i, p in enumerate(map(tuple, v))}
        nf = []

        def mid(i, j):
            p = tuple((np.array(nv[i]) + np.array(nv[j])) / 2.0)
            if p not in index:
                index[p] = len(nv)
                nv.append(p)
            return index[p]

        for a, b_, c in f:
            ab, bc, ca = mid(a, b_), mid(b_, c), mid(c, a)
            nf += [[a, ab, ca], [ab, b_, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.array(nv, np.float64)
        f = np.array(nf, np.int64)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True) * r
    return v.astype(np.float32), f.astype(np.int32)


def _mesh_scene(eta=1.33, sigma_s=0.4, sigma_a=0.05, res=8, subdiv=3):
    b = SceneBuilder()
    med = b.add_medium(kind=T.MED_HOMOGENEOUS,
                       sigma_a=(sigma_a,) * 3, sigma_s=(sigma_s,) * 3,
                       phase_kind=T.PH_ISOTROPIC)
    bs = b.add_bsdf(kind=T.BSDF_DIELECTRIC, eta=eta)
    v, f = _icosphere(1.0, subdiv)
    b.add_mesh(v, f, bsdf=bs, interior=med)
    b.add_emitter(T.EM_POINT, radiance=(10.0, 10.0, 10.0),
                  position=(2.5, 1.5, 0.0))
    b.set_perspective_sensor(
        to_world=tf.look_at([0, 0, -4], [0, 0, 0], [0, 1, 0]), fov_deg=35)
    b.config = b.config._replace(width=res, height=res, spp=4, filter="box")
    return b.build(), b.config


def test_mesh_boundary_matches_sphere_exact():
    """Triangle-mesh boundary singlescatter (per-triangle planar refraction,
    singlescatter.cpp:117) agrees with the sphere-exact solver on a finely
    tessellated sphere."""
    from mitsubaer_tpu.integrators.singlescatter import (
        render_singlescatter_mesh)

    eta = 1.33
    s_sph, c_sph = _scene(eta=eta, res=8)
    s_msh, c_msh = _mesh_scene(eta=eta, res=8, subdiv=3)
    a = np.asarray(render_singlescatter(s_sph, c_sph, seed=0, n_dist=8))
    m = np.asarray(render_singlescatter_mesh(s_msh, c_msh, seed=0, n_dist=8))
    assert np.isfinite(m).all()
    am, mm = a.mean(), m.mean()
    assert mm > 0
    assert abs(mm - am) / am < 0.15, (am, mm)


def test_dipole_smoke_and_sanity():
    """Dipole BSSRDF (subsurface/dipole.cpp): finite translucent image;
    more absorption -> dimmer; R_d monotonically decreasing in r."""
    from mitsubaer_tpu.integrators.dipole import rd_dipole, render_dipole

    r = np.linspace(0.01, 2.0, 64, dtype=np.float32)[:, None]
    sa = np.full((1, 3), 0.05, np.float32)
    ssp = np.full((1, 3), 2.0, np.float32)
    rd = np.asarray(rd_dipole(jnp.asarray(r), jnp.asarray(sa),
                              jnp.asarray(ssp), 1.3))
    assert (rd > 0).all()
    assert (np.diff(rd[:, 0]) < 0).all()          # decreasing in r

    s1, c1 = _mesh_scene(eta=1.3, sigma_s=2.0, sigma_a=0.05, res=8,
                         subdiv=2)
    img1 = np.asarray(render_dipole(s1, c1._replace(spp=2), seed=0,
                                    n_cache=512, chunk=256))
    assert np.isfinite(img1).all() and img1.max() > 0
    s2, c2 = _mesh_scene(eta=1.3, sigma_s=2.0, sigma_a=0.8, res=8,
                         subdiv=2)
    img2 = np.asarray(render_dipole(s2, c2._replace(spp=2), seed=0,
                                    n_cache=512, chunk=256))
    assert img2.mean() < img1.mean()              # absorption dims it
