"""XML scene loader tests against the reference's bundled scenes."""
import os

import numpy as np
import pytest

from mitsubaer_tpu.scene import types as T
from mitsubaer_tpu.scene import xml as xml_m

REF = "/root/reference/scenes"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference scenes not mounted"
)


class TestCbox:
    @pytest.fixture(scope="class")
    def loaded(self):
        return xml_m.load_scene(os.path.join(REF, "cbox/cbox.xml"))

    def test_geometry(self, loaded):
        scene, cfg = loaded
        # 8 obj shapes fan-triangulated: walls 2 each (ceiling 4) + boxes 10+10
        assert scene.geo.v0.shape[0] == 38

    def test_film_and_sampler(self, loaded):
        scene, cfg = loaded
        assert (cfg.width, cfg.height) == (512, 512)
        assert cfg.spp == 64
        assert cfg.sampler == "lds"
        assert cfg.filter == "gaussian"

    def test_bounce_decomposition(self, loaded):
        scene, cfg = loaded
        assert cfg.decomposition == "bounce"
        assert cfg.max_bound == 30.0
        assert cfg.n_frames == 30

    def test_spectra_converted(self, loaded):
        scene, cfg = loaded
        # red wall reflectance: R channel dominates
        refl = np.asarray(scene.bsdfs.reflectance)
        assert any(r[0] > 4 * r[1] for r in refl), refl
        # area emitter radiance warm and bright
        rad = np.asarray(scene.emitters.radiance)[0]
        assert rad[0] > rad[1] > rad[2] and rad[0] > 15

    def test_maxdepth(self, loaded):
        _, cfg = loaded
        assert cfg.max_depth == 40

    def test_renders(self, loaded):
        from mitsubaer_tpu.integrators import render

        scene, cfg = loaded
        cfg = cfg._replace(width=24, height=24, spp=4, max_depth=4,
                           integrator="path", decomposition="steadystate")
        img = np.asarray(render.render(scene, cfg))
        assert np.isfinite(img).all() and img.mean() > 0.01
        # red wall left, green right
        left = img[8:16, :3].mean(axis=(0, 1))
        right = img[8:16, -3:].mean(axis=(0, 1))
        assert left[0] > left[1] and right[1] > right[0]


class TestVolumetric:
    def test_loads_with_defines(self):
        scene, cfg = xml_m.load_scene(
            os.path.join(REF, "volumetric/BoundedScatteringVolume_directionalsource.xml"),
            defines=dict(samples=8, tMin=0, tMax=20, tRes=0.5),
        )
        assert cfg.has_beam
        assert cfg.decomposition == "transient"
        assert cfg.n_frames == 40
        np.testing.assert_allclose(
            np.asarray(scene.media.sigma_s)[0], [0.5, 3.5, 7.5]
        )
        np.testing.assert_allclose(np.asarray(scene.media.phase.g)[0], 0.7)

    def test_missing_define_raises(self):
        with pytest.raises(ValueError, match="samples"):
            xml_m.load_scene(
                os.path.join(REF, "volumetric/BoundedScatteringVolume_directionalsource.xml")
            )


class TestRoundtripVol:
    def test_gridvolume_from_vol_file(self, tmp_path):
        from mitsubaer_tpu.utils import io

        data = np.random.default_rng(0).uniform(0, 1, (6, 5, 4)).astype(np.float32)
        io.write_vol(tmp_path / "d.vol", data, (-1, -1, -1), (1, 1, 1))
        xmltext = f"""<scene version="0.5.0">
          <medium type="heterogeneous" id="m">
            <volume name="density" type="gridvolume">
              <string name="filename" value="{tmp_path}/d.vol"/>
            </volume>
            <spectrum name="sigmaS" value="1.0"/>
            <spectrum name="sigmaA" value="0.1"/>
          </medium>
          <shape type="cube"><ref name="interior" id="m"/></shape>
          <sensor type="perspective">
            <float name="fov" value="45"/>
            <transform name="toWorld">
              <lookat origin="0,0,-3" target="0,0,0" up="0,1,0"/>
            </transform>
          </sensor>
        </scene>"""
        p = tmp_path / "s.xml"
        p.write_text(xmltext)
        scene, cfg = xml_m.load_scene(str(p))
        assert scene.media.density.data.shape[:3] == (6, 5, 4)
        assert int(scene.media.kind[0]) == T.MED_HETEROGENEOUS
