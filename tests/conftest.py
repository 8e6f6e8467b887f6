"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (the TPU-world fake backend); the
driver's dryrun and bench use real hardware. Env vars must be set before the
first jax import in the test process.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin in this image ignores JAX_PLATFORMS; force via config.
jax.config.update("jax_platforms", "cpu")

# XLA's DEFAULT matmul/conv precision does bf16 mantissa passes even on
# CPU: a single 3x3 f32 conv came out 3.6e-3 off torch (f64-refereed —
# torch was exact, we weren't; see benchmarks/debug_s2g_gap.py). Parity
# tests compare SEMANTICS, so run them at true f32; the bf16 compute path
# is a deliberate TPU-only choice exercised by bench.py and the verify
# drive, not by numeric-parity assertions.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
