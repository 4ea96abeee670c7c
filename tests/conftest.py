"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The reference is float64 CPU (TF eager); parity and gradient-check tests run
in float64 on JAX-CPU.  Sharding tests use the 8 virtual host devices
(the TPU analog of multi-node testing without a cluster, SURVEY.md section 4).
These env vars must be set before jax initializes, hence this top-of-conftest
placement.
"""

import os

# The image's axon sitecustomize exports JAX_PLATFORMS=axon (TPU tunnel);
# tests must run locally on CPU, so override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize re-registers the TPU platform no matter what the env
# says; pin the runtime platform list to cpu post-import as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
