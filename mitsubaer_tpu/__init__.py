"""mitsubaer_tpu — a TPU-native differentiable volumetric path tracer.

A from-scratch JAX/Pallas framework with the capabilities of
cmu-ci-lab/MitsubaER (refractive radiative transfer / eikonal rendering,
transient & CW-ToF imaging, volumetric path tracing), re-architected for TPU:
pytree scenes, wavefront ray batches, compiled `lax` control flow, Pallas
kernels on the hot loops, and `shard_map` scaling over device meshes.
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
