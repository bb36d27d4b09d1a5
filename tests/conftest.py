"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/collective behaviour is
exercised for real (the reference could only mock its collectives;
reference: tests/test_training.py:164-229). Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The stencil m2m path auto-enables off-TPU (faster on CPU), but the
# suite's parity/oracle tests exist to pin the PRODUCTION edge-list /
# fused-kernel path that TPU runs. Pin it off here so their coverage
# target stays the production path; tests/test_stencil.py re-enables it
# explicitly and holds the two paths equivalent.
os.environ["NEURAL_LAM_TPU_STENCIL"] = "off"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may pin jax_platforms to the TPU plugin
# via jax.config (which outranks the env var); force CPU at config level.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
