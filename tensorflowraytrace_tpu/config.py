"""Global numeric configuration for the TPU ray tracer.

The reference framework (tfrt) is hard-wired to float64 (see
/root/reference/tfrt/engine.py:23 and the float64 TensorSpecs throughout
/root/reference/tfrt/geometry.py).  TPUs natively compute in float32 /
bfloat16, so this rebuild makes the working dtype configurable: float32 by
default (TPU), float64 opt-in for CPU parity / gradient-check tests.

Epsilons: the reference uses 1e-10 everywhere (engine.py:174-191).  That
value is meaningless in float32, so epsilons are derived from the dtype
unless given explicitly.
"""

from __future__ import annotations

import jax.numpy as jnp

# Working dtype.  Tests that want float64 parity set jax_enable_x64 and pass
# dtype=jnp.float64 explicitly to builders; runtime code resolves dtype via
# ``resolve_dtype``.
DEFAULT_DTYPE = jnp.float32

# Boundary categories, matching /root/reference/tfrt/engine.py:14-16
OPTICAL = 0
STOP = 1
TARGET = 2

# Ray life-cycle states (this rebuild's replacement for the reference's four
# compacted ray-history lists, engine.py:1596-1677).  A ray keeps its slot for
# the whole trace; only its state code changes.
ACTIVE = 0
FINISHED = 1
STOPPED = 2
DEAD = 3


def resolve_dtype(dtype=None):
    return DEFAULT_DTYPE if dtype is None else dtype


def default_epsilon(dtype) -> float:
    """Divide-safety epsilon matched to the dtype.

    float64 -> 1e-10 (the reference's recommendation, geometry.py:44-52);
    float32 -> 1e-6 (approximately eps_f32 * 10, keeps parallel-line detection
    meaningful without flagging legitimate near-parallel hits).
    """
    if jnp.dtype(dtype) == jnp.dtype(jnp.float64):
        return 1e-10
    return 1e-6
