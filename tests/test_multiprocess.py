"""Multi-process jax.distributed rendering (replaces mtssrv render farm):
the sharded render must be BITWISE identical across 1/2/4 processes over
the same global mesh (counter-based RNG fixes the sample assignment), per
the round-2 verdict's scaling-harness requirement."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_multiprocess_bitwise_identical():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "scaling_multiprocess.py")],
        capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "(bitwise): True" in r.stdout
