"""Test harness: force an 8-device virtual CPU mesh before jax import.

This is the TPU analog of multi-node testing without a cluster
(SURVEY.md §4d): all sharding/collective tests run against
xla_force_host_platform_device_count=8.
"""

import os
import sys
from pathlib import Path

# Force CPU: the shell pre-sets JAX_PLATFORMS=axon (tunneled TPU) where
# every op dispatch is a network roundtrip — unusable for a test suite.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402  (after env setup)

# The sitecustomize in /root/.axon_site materializes jax_platforms=axon
# before test code runs, so the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")

# XLA:CPU's batched-GEMM fast path is low precision (observed ~1e-1 abs
# error at K=512) — force full-precision matmuls so numeric parity tests
# are meaningful. TPU runs control precision explicitly per-op.
jax.config.update("jax_default_matmul_precision", "highest")
