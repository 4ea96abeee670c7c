"""Checkpoint / resume for optimization runs.

The reference has only ad-hoc pickles of raw parameter lists and STL exports
(SURVEY.md section 5 "checkpoint/resume": dev/simple_3d_optimize.py:285-323,
boundaries.py:872-874) with no optimizer-state or RNG-state capture.  This
rebuild checkpoints the full training state -- parameters, Nesterov momentum
buffers, PRNG key, iteration count -- through orbax when available, with an
.npz fallback, plus STL export for interchange.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def state_dict(optimizer):
    """Capture an optim.Optimizer's full training state.

    The optimizer state is stored as flattened pytree leaves so the same
    path covers the builtin Nesterov velocity list AND an optax state tree
    (``Optimizer(optax_tx=...)``); ``restore_into`` rebuilds the tree from
    the restoring optimizer's own state structure, which is identical as
    long as it was constructed with the same transform."""
    return {
        "parameters": [np.asarray(p) for p in optimizer.parameters],
        "velocity": [np.asarray(v) for v in jax.tree.leaves(
            optimizer._velocity)],
        "key": np.asarray(jax.random.key_data(optimizer.key)),
        "iterations": np.asarray(optimizer.iterations),
    }


def restore_into(optimizer, state):
    """Restore a captured state into an optim.Optimizer.

    Preserves the optimizer's key flavor (legacy uint32 vs new-style typed
    PRNG key), and on a multi-controller mesh re-replicates the restored
    host arrays onto the global mesh -- a plain ``jnp.asarray`` is only
    addressable on the local process and would fail inside the jitted
    shard_map step."""
    optimizer.parameters = [jnp.asarray(p) for p in state["parameters"]]
    structure = jax.tree.structure(optimizer._velocity)
    optimizer._velocity = jax.tree.unflatten(
        structure, [jnp.asarray(v) for v in state["velocity"]])
    key = jnp.asarray(state["key"])
    if jnp.issubdtype(jnp.asarray(optimizer.key).dtype, jax.dtypes.prng_key):
        key = jax.random.wrap_key_data(key)
    optimizer.key = key
    optimizer.iterations = int(state["iterations"])
    if getattr(optimizer, "mesh", None) is not None and jax.process_count() > 1:
        from tensorflowraytrace_tpu.parallel.sharding import (
            replicate_from_host)

        optimizer.parameters = replicate_from_host(
            optimizer.parameters, optimizer.mesh)
        optimizer._velocity = replicate_from_host(
            optimizer._velocity, optimizer.mesh)
    return optimizer


def save_checkpoint(path, optimizer):
    """Save training state.  Uses orbax if importable, else .npz."""
    state = state_dict(optimizer)
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, state, force=True)
        return path
    except Exception:
        if not path.endswith(".npz"):
            path = path + ".npz"
        flat = {"iterations": state["iterations"], "key": state["key"]}
        for i, p in enumerate(state["parameters"]):
            flat[f"param_{i}"] = p
        for i, v in enumerate(state["velocity"]):
            flat[f"vel_{i}"] = v
        np.savez(path, **flat)
        return path


def load_checkpoint(path, optimizer):
    """Load training state saved by save_checkpoint into the optimizer."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(os.path.abspath(path))
        return restore_into(optimizer, state)
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path)
    n = len([k for k in data.files if k.startswith("param_")])
    state = {
        "parameters": [data[f"param_{i}"] for i in range(n)],
        "velocity": [data[f"vel_{i}"] for i in range(n)],
        "key": data["key"],
        "iterations": data["iterations"],
    }
    return restore_into(optimizer, state)


def export_boundary_stl(boundary, params, filename):
    """Export a parametric boundary's current surface to STL
    (the reference's boundary.save(), boundaries.py:872-874)."""
    mesh = boundary.updated_mesh(params)
    mesh.save(filename)
    return filename
