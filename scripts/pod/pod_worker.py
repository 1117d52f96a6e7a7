"""Per-host pod worker: initialize jax.distributed, shard the render over
the global mesh (parallel/driver.py row-block sharding), write the film.

Runs unchanged under the in-container multi-process rehearsal:
  JAX_NUM_PROCESSES=4 python scripts/scaling_multiprocess.py
exercises the same code path with a bitwise-identical-image assertion.
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--out", default="render.exr")
    args = ap.parse_args()

    import jax

    # on TPU pods the coordinator/process env is provided by the runtime;
    # initialize() with no arguments discovers it
    jax.distributed.initialize()

    from mitsubaer_tpu.parallel import driver
    from mitsubaer_tpu.scene import xml as xml_m
    from mitsubaer_tpu.utils import io as io_m

    scene, cfg = xml_m.load_scene(args.scene)
    cfg = cfg._replace(spp=args.spp)
    img = driver.render_sharded(scene, cfg, seed=0)
    import numpy as np
    if jax.process_index() == 0 or True:  # film is psum'd: all hold it
        io_m.write_exr(args.out, np.asarray(img))
    print(f"[proc {jax.process_index()}/{jax.process_count()}] done")


if __name__ == "__main__":
    main()
