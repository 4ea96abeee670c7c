"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The reference is float64 CPU (TF eager); parity and gradient-check tests run
in float64 on JAX-CPU.  Sharding tests use the 8 virtual host devices
(the TPU analog of multi-node testing without a cluster, SURVEY.md section 4).
These env vars must be set before jax initializes, hence this top-of-conftest
placement.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
