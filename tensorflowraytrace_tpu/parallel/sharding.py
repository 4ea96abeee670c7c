"""Multi-chip scaling: shard the ray axis over a device mesh.

The reference has NO distribution story (SURVEY.md section 2: no
tf.distribute / NCCL / MPI anywhere); it scales by random re-sampling.  The
TPU-native scaling model (SURVEY.md "rebuild consequence"):

* rays are embarrassingly parallel  -> 1-D ``Mesh`` over axis ``"rays"``,
  ray batches sharded ``P("rays")`` across chips;
* scenes/parameters are tiny (<= a few thousand surfaces) -> replicated;
* the ONLY collective in the whole workload is one ``psum`` per step for the
  loss/gradient reduction over ICI (replacing the implicit whole-batch
  reduction of reference optimizer.py:220,258).

Everything here builds on ``shard_map`` so the per-device program is exactly
the single-chip trace -- including the Pallas kernels.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _raw_shard_map  # jax >= 0.6 style
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _raw_shard_map


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map with the varying-manual-axes check disabled: the trace loop
    initializes scan carries from replicated constants and updates them with
    ray-varying values, which the strict vma type check rejects."""
    try:
        return _raw_shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older keyword name
        return _raw_shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)

from tensorflowraytrace_tpu.engine import TraceConfig, default_reaction, trace

RAY_AXIS = "rays"


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize multi-host (multi-slice / pod) execution.

    Thin wrapper over ``jax.distributed.initialize``: on TPU pods the
    arguments are auto-detected from the environment, so call this with no
    arguments at program start on every host, then use ``ray_mesh()`` as
    usual -- ``jax.devices()`` becomes the GLOBAL device list and the 1-D
    ray mesh spans hosts; the per-step psum rides ICI within a slice and DCN
    across slices.  Rays stay data-parallel (the workload has no
    model/pipeline axis), so no other change is needed.

    Returns the process index.  Safe to call when already initialized.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError as e:  # pragma: no cover - already-initialized path
        if "already" not in str(e).lower():
            raise
    return jax.process_index()


def ray_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D device mesh over the ray axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(RAY_AXIS))


def shard_rays(rays, mesh: Mesh):
    """Place a RaySet with its leading (ray) axis sharded across the mesh."""
    sharding = ray_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), rays)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (scene, params) on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sharding), tree)


def split_keys(key, mesh: Mesh):
    """One PRNG key per device, sharded over the mesh (the per-device
    re-sampling analog of the reference's per-step random update)."""
    n = mesh.devices.size
    keys = jax.random.split(key, n)
    return jax.device_put(keys, ray_sharding(mesh))


def _result_specs(fn, mesh, *example_args):
    """Build an out_specs pytree for fn by shape inspection: leaves whose
    leading axis is the ray axis get P('rays'); per-bounce history leaves
    (bounce, ray, ...) get P(None, 'rays'); scalars/replicated get P()."""
    shapes = jax.eval_shape(fn, *example_args)
    n_rays = None
    for leaf in jax.tree.leaves(example_args[0]):
        n_rays = leaf.shape[0]
        break

    def spec(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == n_rays:
            return P(RAY_AXIS)
        if leaf.ndim >= 2 and leaf.shape[1] == n_rays:
            return P(None, RAY_AXIS)
        return P()

    return jax.tree.map(spec, shapes)


def parallel_trace(rays, scene, materials=None, cfg: TraceConfig = TraceConfig(),
                   mesh: Optional[Mesh] = None, reaction=default_reaction):
    """Trace with rays sharded across the mesh, scene replicated.

    The per-device program is the single-chip ``trace``; no collectives are
    needed in the forward pass (surfaces are replicated).
    """
    if mesh is None:
        mesh = ray_mesh()
    materials = tuple(materials or ())

    def local(r, s):
        return trace(r, s, materials, cfg, reaction)

    # out specs depend on history shapes; derive from a local-shaped example
    n_local = jax.tree.leaves(rays)[0].shape[0] // mesh.devices.size
    local_rays = jax.tree.map(lambda a: jax.ShapeDtypeStruct(
        (n_local,) + a.shape[1:], a.dtype), rays)
    out_specs = _result_specs(local, mesh, local_rays, scene)

    return _shard_map(
        local, mesh=mesh, in_specs=(P(RAY_AXIS), P()), out_specs=out_specs,
    )(rays, scene)


def parallel_value_and_grad(local_loss: Callable, mesh: Mesh):
    """Data-parallel value-and-grad over the ray mesh.

    ``local_loss(params, key) -> scalar`` computes the loss of this device's
    ray shard (typically: sample N/D rays from the key, build the scene from
    params, trace, sum the error).  Returns a jitted
    ``f(params, keys) -> (loss, grads)`` where ``keys = split_keys(...)``;
    loss and grads are psum-reduced over ICI and replicated.
    """

    def shard_fn(params, keys):
        l, g = jax.value_and_grad(local_loss)(params, keys[0])
        l = lax.psum(l, RAY_AXIS)
        g = jax.tree.map(lambda x: lax.psum(x, RAY_AXIS), g)
        return l, g

    mapped = _shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(RAY_AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)


def parallel_train_step(local_loss: Callable, mesh: Mesh, learning_rate=1.0,
                        grad_clip=None, accumulators=None, momentum=0.0):
    """A full jitted data-parallel SGD step: psum-reduced gradients, the
    reference's finite-guard + clip + accumulator pipeline
    (optimizer.py:227-256), Nesterov momentum, replicated parameter update.

    Returns ``step(params, velocity, keys) -> (params, velocity, loss)``.
    """
    vag = None  # build lazily so the shard_map closes over nothing traced

    def shard_fn(params, velocity, keys):
        l, g = jax.value_and_grad(local_loss)(params, keys[0])
        l = lax.psum(l, RAY_AXIS)
        g = jax.tree.map(lambda x: lax.psum(x, RAY_AXIS), g)

        new_params = []
        new_velocity = []
        for i, (p, gi, v) in enumerate(zip(params, g, velocity)):
            gi = jnp.where(jnp.isfinite(gi), gi, jnp.zeros_like(gi))
            gi = gi * learning_rate
            if grad_clip is not None:
                gi = jnp.clip(gi, -grad_clip, grad_clip)
            if accumulators is not None and accumulators[i] is not None:
                acc = jnp.asarray(accumulators[i], dtype=gi.dtype)
                gi = (acc @ gi.reshape(-1, 1)).reshape(gi.shape)
            v = momentum * v + gi
            new_params.append(p - (gi + momentum * v))
            new_velocity.append(v)
        return new_params, new_velocity, l

    mapped = _shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(mapped)
