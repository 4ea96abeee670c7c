"""Bounded-time TPU availability probe.

The remote-attached TPU backend has two distinct failure modes:

  1. clean: the platform never registers, ``jax.devices()`` raises or
     returns CPU only -- easy to detect in-process;
  2. hung tunnel: the platform registers but the first device call blocks
     indefinitely (observed outages: ``jax.devices()`` hangs > 20 min).

Mode 2 cannot be detected in-process (there is no way to interrupt a stuck
``jax.devices()``), so this probe runs it in a *subprocess* under a hard
timeout.  Harness code (bench.py, tests/test_tpu_agreement.py) calls
``probe_tpu`` before committing to a long TPU-touching run, so a tunnel
outage degrades to a clean skip instead of a 20-minute stall.

The reference needs nothing like this (single-host CPU TF, SURVEY.md §2);
it exists because this framework's chip is on the far side of a tunnel.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

_PROBE_SRC = (
    "import jax; d = jax.devices(); "
    "print('PLATFORM=' + (d[0].platform if d else 'none'))"
)


def tpu_env(base: dict | None = None) -> dict:
    """An environment for a TPU-backend subprocess: strips the test suite's
    CPU forcing (JAX_PLATFORMS=cpu + virtual host devices) so the host's
    default platform selection applies."""
    env = dict(os.environ if base is None else base)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", "")).strip()
    return env


def probe_tpu(timeout: float = 120.0, env: dict | None = None,
              retries: int = 1, retry_wait: float = 30.0) -> str | None:
    """Return the accelerator platform name ('tpu'/'axon'/...) if a working
    non-CPU device answers within ``timeout`` seconds, else None.

    ``retries`` bounds how many probe attempts are made (a flaky tunnel can
    drop one RPC and answer the next); a hung tunnel costs
    ``retries * timeout`` at most, never an unbounded stall.
    """
    import time

    env = tpu_env(env)
    for attempt in range(max(1, retries)):
        if attempt:
            time.sleep(retry_wait)
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC], env=env,
                capture_output=True, text=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            continue  # hung tunnel; maybe transient
        if r.returncode != 0:
            continue
        m = re.search(r"PLATFORM=(\w+)", r.stdout)
        if m and m.group(1) not in ("cpu", "none"):
            return m.group(1)
        return None  # clean answer: CPU only -- retrying won't change it
    return None
