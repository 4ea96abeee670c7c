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


def pytest_collection_modifyitems(config, items):
    """Shard the suite by FILE across pytest-xdist workers.

    Why sharding is load-bearing and not an optimization: a single pytest
    process accumulates one XLA:CPU compile per jitted test and this
    image's jaxlib segfaults nondeterministically inside
    ``backend_compile_and_load`` after ~400+ heavyweight compiles in one
    process (observed three times at tests ~410/420/488 of a serial run,
    each time in a different file; every file passes alone).  ``-n 4
    --dist loadgroup`` (pyproject addopts) caps each worker at ~a quarter
    of the compiles, far below the crash regime.  Grouping is per-file so
    module-scoped state stays together; the two real-TPU suites share ONE
    group so they never contend for the single tunnel-attached chip.
    """
    if not config.pluginmanager.hasplugin("xdist"):
        return
    for item in items:
        fname = os.path.basename(str(item.fspath))
        group = "tpu-serial" if fname in (
            "test_tpu_agreement.py", "test_tpu_kernels.py") else fname
        item.add_marker(pytest.mark.xdist_group(name=group))


@pytest.fixture
def rng():
    return np.random.default_rng(42)
