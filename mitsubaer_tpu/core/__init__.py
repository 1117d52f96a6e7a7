from . import math, rng, spectrum, spline, transform, warp  # noqa: F401
