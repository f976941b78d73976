"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run against this virtual mesh (the driver separately
dry-runs the multi-chip path); numerical tests are platform-agnostic.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The image's sitecustomize force-registers the remote 'axon' TPU backend and
# overrides jax_platforms — env vars alone don't stick.  Tests must run on a
# real local CPU backend with 8 virtual devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# full float32 matmuls for numerical parity tests
jax.config.update("jax_default_matmul_precision", "highest")

import pytest

REFERENCE = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "qdiff"))


@pytest.fixture(scope="session")
def reference_path():
    """Path to the upstream PyTorch EDA-DM checkout (parity tests only)."""
    if not has_reference():
        pytest.skip("reference checkout not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return REFERENCE
