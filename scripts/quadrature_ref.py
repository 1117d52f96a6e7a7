"""Deterministic single-scatter quadrature ground truth vs both engines on
the heterogeneous point-light scene (the bias arbiter used to validate the
persistent-wavefront engine; see mitsubaer_tpu/utils/validate.py)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from mitsubaer_tpu.integrators import render as rm
from mitsubaer_tpu.scene import presets
from mitsubaer_tpu.utils.validate import single_scatter_quadrature

SUB = int(os.environ.get("QSUB", 8))
NT = int(os.environ.get("QNT", 256))
NL = int(os.environ.get("QNL", 128))
SEEDS = int(os.environ.get("QSEEDS", 4))


def main():
    scene, cfg = presets.volumetric_box(
        res=12, spp=1, max_depth=2, heterogeneous=True, density_res=32,
        emitter_kind="point", filter="box")
    img = single_scatter_quadrature(scene, cfg, sub=SUB, nt=NT, nl=NL)
    print("quadrature image mean = %.6f" % img.mean())
    np.save("/tmp/quad_ref.npy", img)

    for eng in ("wavefront", "loop"):
        vals = [float(np.asarray(rm.render(
            scene, cfg._replace(spp=256, engine=eng), seed=s)).mean())
            for s in range(SEEDS)]
        v = np.array(vals)
        print(f"{eng}: mean={v.mean():.6f} sem={v.std() / np.sqrt(SEEDS):.6f} "
              f"rel-vs-quad={(v.mean() - img.mean()) / img.mean():+.4f}")


if __name__ == "__main__":
    main()
