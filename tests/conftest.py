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

# the CPU backend's default matmul precision is bfloat16-class; numerical
# parity tests need real float32 matmuls
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
