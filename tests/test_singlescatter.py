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
