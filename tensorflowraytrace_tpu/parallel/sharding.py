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
    """Place a RaySet with its leading (ray) axis sharded across the mesh.

    Single-controller only: assumes this process holds the GLOBAL ray array.
    On a multi-controller run (pod / multi-host) no process does -- use
    ``shard_rays_from_local`` with each process's own shard instead.
    """
    sharding = ray_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), rays)


def shard_rays_from_local(local_rays, mesh: Mesh):
    """Build a globally ray-sharded RaySet from THIS PROCESS's local shard.

    The multi-controller data path: after ``init_multihost`` each process
    samples/loads only its own rays (global count = local count x
    process_count); this assembles them into one global ``jax.Array`` per
    leaf without any process ever holding the full batch.  Wraps
    ``jax.make_array_from_process_local_data``.  Works (as a plain
    device_put) under a single controller too.
    """
    sharding = ray_sharding(mesh)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)),
        local_rays)


def replicate_from_host(tree, mesh: Mesh):
    """Replicate host values onto every device of a (possibly
    multi-controller) mesh.  Every process must pass the same values; each
    contributes its addressable shards, so this works when ``mesh`` spans
    processes (where a plain device_put of a committed local array cannot).
    """
    sharding = NamedSharding(mesh, P())

    def put(a):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    return jax.tree.map(put, tree)


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


def _trace_out_specs(result_shapes, n_local, fold_out_specs=None):
    """out_specs for a local ``trace`` call, derived from the TraceResult
    STRUCTURE (field names), never from shape coincidence:

    * ``rays``           -> every leaf ray-sharded ``P('rays')``
    * ``history_*``      -> per-bounce stacks ``P(None, 'rays')``
    * ``n_bounces``      -> replicated scalar ``P()``
    * ``fold``           -> by ``fold_out_specs`` if given; otherwise a
      per-leaf heuristic (leading axis == local ray count -> ray-sharded,
      else replicated) -- the ONLY place shape inference remains, because a
      user fold accumulator has no declared structure.  Pass explicit
      ``fold_out_specs`` (a matching pytree of PartitionSpec) for
      accumulators whose shape coincidentally matches the ray count.
    """
    import dataclasses as _dc

    def fold_spec(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == n_local:
            return P(RAY_AXIS)
        if leaf.ndim >= 2 and leaf.shape[1] == n_local:
            return P(None, RAY_AXIS)
        return P()

    if fold_out_specs is None:
        fold_out_specs = jax.tree.map(fold_spec, result_shapes.fold)
    return _dc.replace(
        result_shapes,
        rays=jax.tree.map(lambda _: P(RAY_AXIS), result_shapes.rays),
        history_p0=(None if result_shapes.history_p0 is None
                    else P(None, RAY_AXIS)),
        history_p1=(None if result_shapes.history_p1 is None
                    else P(None, RAY_AXIS)),
        history_state=(None if result_shapes.history_state is None
                       else P(None, RAY_AXIS)),
        history_alive=(None if result_shapes.history_alive is None
                       else P(None, RAY_AXIS)),
        fold=fold_out_specs,
        n_bounces=P(),
    )


_FOLD_REDUCERS = {
    "sum": lax.psum,
    "max": lax.pmax,
    "min": lax.pmin,
    # genuinely keep device 0's value (the leaf is declared replicated in
    # the out-specs, so returning each device's own partial -- a bare
    # identity -- would silently present one unspecified device's PARTIAL
    # accumulator as the global result)
    "none": lambda x, axis: lax.all_gather(x, axis)[0],
}


def parallel_trace(rays, scene, materials=None, cfg: TraceConfig = TraceConfig(),
                   mesh: Optional[Mesh] = None, reaction=default_reaction,
                   fold_fn=None, fold_init=None, fold_out_specs=None,
                   fold_reduce="sum"):
    """Trace with rays sharded across the mesh, scene replicated.

    The per-device program is the single-chip ``trace``; no collectives are
    needed in the forward pass (surfaces are replicated), except: under
    ``cfg.early_exit`` the per-device bounce counts are pmax'd so
    ``result.n_bounces`` reports the global trace depth, and fold
    accumulators that are NOT per-ray (replicated spec) are cross-device
    reduced with ``fold_reduce`` -- each device's trace only folds over its
    own ray shard, so a scalar running loss is a PARTIAL sum until combined.
    ``fold_reduce``: ``"sum"`` (default; right for landing_sum_fold /
    path_length_fold / bounce counts), ``"max"``, ``"min"``, ``"none"``
    (keep device 0's value), or a pytree of those matching the fold
    structure for mixed accumulators.
    """
    if mesh is None:
        mesh = ray_mesh()
    materials = tuple(materials or ())

    def local_trace(r, s):
        return trace(r, s, materials, cfg, reaction,
                     fold_fn=fold_fn, fold_init=fold_init)

    # out specs depend on history/fold shapes; derive from a local-shaped
    # example (structure-driven: see _trace_out_specs).  eval_shape runs
    # outside shard_map, so use the collective-free body (same structure).
    n_local = jax.tree.leaves(rays)[0].shape[0] // mesh.devices.size
    local_rays = jax.tree.map(lambda a: jax.ShapeDtypeStruct(
        (n_local,) + a.shape[1:], a.dtype), rays)
    shapes = jax.eval_shape(local_trace, local_rays, scene)
    out_specs = _trace_out_specs(shapes, n_local, fold_out_specs)

    def reduce_fold(acc):
        """Cross-device reduce every fold leaf whose out-spec is replicated
        (per-ray leaves concatenate across shards and need no collective)."""
        if acc is None:
            return None

        def leaf_reduce(leaf, spec, how):
            if spec != P():
                return leaf
            if callable(how):
                return how(leaf, RAY_AXIS)
            if how not in _FOLD_REDUCERS:
                raise ValueError(
                    f"fold_reduce must be one of {sorted(_FOLD_REDUCERS)} or "
                    f"a callable, got {how!r}")
            return _FOLD_REDUCERS[how](leaf, RAY_AXIS)

        if isinstance(fold_reduce, (str, bytes)) or callable(fold_reduce):
            hows = jax.tree.map(lambda _: fold_reduce, acc)
        else:
            hows = fold_reduce
        return jax.tree.map(leaf_reduce, acc, out_specs.fold, hows)

    def local(r, s):
        res = local_trace(r, s)
        import dataclasses as _dc

        if cfg.early_exit:
            res = _dc.replace(res, n_bounces=lax.pmax(
                jnp.asarray(res.n_bounces), RAY_AXIS))
        if fold_fn is not None:
            res = _dc.replace(res, fold=reduce_fold(res.fold))
        return res

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


# Data-parallel TRAINING lives in optim.Optimizer(mesh=...): the full
# reference pipeline (finite-guard/individual_lr/clip modes/accumulators/
# smoothers/LR ramps/chained phases/training_routine) runs under shard_map
# with one psum, sharing _apply_param_update with the single-device path.
# (A reduced parallel_train_step fork used to live here; it was deleted so
# the two pipelines can never diverge.)


def parallel_psf(mesh: Mesh, wavelength, medium_n=1.0,
                 phase_reduction=True):
    """Ray-sharded Huygens-Fresnel PSF: the coherent wavelet sum
    (:func:`analysis.huygens_psf`) is a reduction over rays, so each device
    sums its own shard's complex field contribution on the (replicated)
    detector grid and ONE psum of the (G, 2) field components assembles the
    global PSF -- the ray axis scales to multi-chip Monte-Carlo/physical-
    optics imaging with the same single-collective pattern as training.

    Returns a jitted ``f(sources, opl, amplitudes, grid) -> (G,) PSF`` with
    ``sources/opl/amplitudes`` sharded over rays and ``grid`` replicated.

    ``phase_reduction`` (see :func:`analysis.huygens_psf`): the reference
    wavelet (amplitude-weighted mean source + mean path) must be IDENTICAL
    on every device for the psum'd field to stay a pure per-grid-point
    phase shift, so the weighted sums are psum'd globally first (three
    extra scalars on the same collective path).
    """
    from tensorflowraytrace_tpu.analysis import _wavelet_field

    def shard_fn(sources, opl, amplitudes, grid):
        dtype = sources.dtype
        k = 2.0 * jnp.pi / jnp.asarray(wavelength, dtype)
        origin = path_ref = None
        if phase_reduction:
            w = jnp.abs(amplitudes)
            sw, so, sp = lax.psum(
                (jnp.sum(w), jnp.sum(w[:, None] * sources, axis=0),
                 jnp.sum(w * opl)), RAY_AXIS)
            sw = jnp.maximum(sw, jnp.asarray(jnp.finfo(dtype).tiny, dtype))
            origin, path_ref = so / sw, sp / sw
        re, im = _wavelet_field(sources, opl, amplitudes, grid, k,
                                jnp.asarray(medium_n, dtype),
                                origin, path_ref)
        e_re, e_im = lax.psum((re, im), RAY_AXIS)  # one field collective
        return e_re * e_re + e_im * e_im

    mapped = _shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=P(),
    )
    return jax.jit(mapped)


def parallel_trace_streamed(rays, scene, materials=None,
                            cfg: TraceConfig = TraceConfig(),
                            mesh: Optional[Mesh] = None,
                            reaction=default_reaction,
                            fold_fn=None, fold_init=None,
                            block_size: int = 1 << 20, merge="sum",
                            fold_reduce="sum", remat_blocks: bool = True,
                            fold_fields: bool = False):
    """N_chips x streaming: devices split the ray stream, each streams its
    local shard in ``block_size`` super-blocks (:func:`engine.trace_streamed`
    under ``shard_map``), and the merged accumulators combine with ONE psum
    -- the composition VERDICT r3 next-round #4 asks for, lifting fold-style
    losses past both the per-chip HBM ceiling AND the chip count.

    ``rays`` must be a concrete ray set whose count divides the mesh size
    (use :func:`shard_rays`); for a generated stream, fold the device index
    into your block generator and call ``trace_streamed`` inside your own
    ``shard_map`` instead.  ``merge`` is the per-device block merge
    ("sum"/"concat"/callable); ``fold_reduce`` the cross-device combine for
    replicated fold leaves ("sum"/"max"/"min"/"none", as
    :func:`parallel_trace`).  Per-ray ("concat") fold leaves stay sharded
    over rays and need no collective.  ``StreamedResult.state_counts`` is
    always psum'd to the global counts.
    """
    import dataclasses as _dc

    from tensorflowraytrace_tpu.engine import trace_streamed

    if mesh is None:
        mesh = ray_mesh()
    materials = tuple(materials or ())
    n_total = jax.tree.leaves(rays)[0].shape[0]
    n_local = n_total // mesh.devices.size

    def local_stream(r, s):
        return trace_streamed(
            r, s, materials, cfg, reaction, fold_fn=fold_fn,
            fold_init=fold_init, block_size=min(block_size, n_local),
            merge=merge, remat_blocks=remat_blocks,
            fold_fields=fold_fields)

    local_rays = jax.tree.map(lambda a: jax.ShapeDtypeStruct(
        (n_local,) + a.shape[1:], a.dtype), rays)
    shapes = jax.eval_shape(local_stream, local_rays, scene)

    def fold_spec(leaf):
        if leaf.ndim >= 1 and leaf.shape[0] == n_local:
            return P(RAY_AXIS)
        return P()

    fold_specs = jax.tree.map(fold_spec, shapes.fold)
    # meta fields (n_rays et al) are part of the treedef: out_specs must
    # carry the SAME meta the body's output does (global ray count)
    out_specs = _dc.replace(shapes, fold=fold_specs, state_counts=P(),
                            n_rays=n_total)

    def local(r, s):
        res = local_stream(r, s)

        def leaf_reduce(leaf, spec, how):
            if spec != P():
                return leaf
            if callable(how):
                return how(leaf, RAY_AXIS)
            if how not in _FOLD_REDUCERS:
                raise ValueError(
                    f"fold_reduce must be one of {sorted(_FOLD_REDUCERS)} "
                    f"or a callable, got {how!r}")
            return _FOLD_REDUCERS[how](leaf, RAY_AXIS)

        if isinstance(fold_reduce, (str, bytes)) or callable(fold_reduce):
            hows = jax.tree.map(lambda _: fold_reduce, res.fold)
        else:
            hows = fold_reduce
        fold = jax.tree.map(leaf_reduce, res.fold, fold_specs, hows)
        counts = lax.psum(res.state_counts, RAY_AXIS)
        return _dc.replace(res, fold=fold, state_counts=counts,
                           n_rays=n_total)

    return _shard_map(
        local, mesh=mesh, in_specs=(P(RAY_AXIS), P()), out_specs=out_specs,
    )(rays, scene)


def parallel_streamed_value_and_grad(block_loss: Callable, n_blocks: int,
                                     mesh: Optional[Mesh] = None,
                                     blocks_per_dispatch: int = 1,
                                     remat_blocks: bool = True) -> Callable:
    """Multi-chip :func:`engine.streamed_value_and_grad`: the block index
    space is sharded over the ray mesh, each device runs its own bounded
    fwd+bwd chunk, and ONE psum per dispatch reduces value and gradient --
    the composition `engine.py` documents for differentiated streams past
    both the per-chip watchdog AND the chip count.

    A streaming loss is a sum over blocks, so its gradient is the sum of
    per-block gradients; summation commutes with both the host dispatch
    loop and the device mesh.  Each dispatch jits one shard_mapped chunk
    program: every device ``lax.map``s ``jax.value_and_grad`` of
    ``block_loss`` over its ``blocks_per_dispatch`` local block indices
    (``jax.checkpoint`` per block under ``remat_blocks``, the
    trace_streamed residency policy), in-dispatch sums, then psums the
    scalar and the gradient pytree over ICI.  The host accumulates across
    dispatches.  Device programs stay index-driven and fixed-shape: the
    dispatch grid is padded to ``n_devices x blocks_per_dispatch`` and
    out-of-range indices are clamped and zero-masked (their value AND
    gradient contributions vanish), so every dispatch reuses one compiled
    program -- no ragged-tail recompile.

    Parameters match :func:`engine.streamed_value_and_grad`:
    ``block_loss(params, i, *aux) -> scalar`` must be pure and
    jit-traceable with ``i`` a GLOBAL int32 block index (typically: slice
    block ``i``'s rays, trace with a fold, return the folded scalar --
    identical code single-chip and multi-chip); ``aux`` are extra
    non-differentiated per-call arguments (e.g. the step's PRNG key).
    ``params`` and ``aux`` are replicated over the mesh.

    Returns ``fn(params, *aux) -> (value, grad)`` equal (up to f32
    reduction-order rounding) to single-device
    ``streamed_value_and_grad`` and to ``jax.grad`` of the fused
    sum-over-blocks loss (tests/test_streamed.py pins both equalities on
    the 8-device mesh).
    """
    if n_blocks <= 0:
        raise ValueError(
            f"parallel_streamed_value_and_grad: n_blocks must be positive, "
            f"got {n_blocks} (a rays // block computation may have rounded "
            "to zero -- clamp with max(1, ...))")
    if mesh is None:
        mesh = ray_mesh()
    n_dev = int(mesh.devices.size)
    bpd = int(blocks_per_dispatch)
    per_dispatch = n_dev * bpd

    def chunk(params, aux, idxs):
        def body(i):
            valid = i < n_blocks
            i_safe = jnp.minimum(i, n_blocks - 1)

            def f(p):
                # padded rows re-trace the last block with a zeroed loss:
                # where's untaken-branch cotangent is 0, so their gradient
                # contribution is exactly zero too
                l = block_loss(p, i_safe, *aux)
                return jnp.where(valid, l, jnp.zeros_like(l))

            if remat_blocks:
                f = jax.checkpoint(f)
            return jax.value_and_grad(f)(params)

        vals, grads = lax.map(body, idxs)
        v = lax.psum(jnp.sum(vals), RAY_AXIS)
        g = jax.tree.map(
            lambda a: lax.psum(jnp.sum(a, axis=0), RAY_AXIS), grads)
        return v, g

    jitted = jax.jit(_shard_map(
        chunk, mesh=mesh, in_specs=(P(), P(), P(RAY_AXIS)),
        out_specs=(P(), P())))

    def run(params, *aux):
        value = None
        grad = None
        for d0 in range(0, n_blocks, per_dispatch):
            idxs = d0 + jnp.arange(per_dispatch, dtype=jnp.int32)
            v, g = jitted(params, aux, idxs)
            value = v if value is None else value + v
            grad = g if grad is None else jax.tree.map(jnp.add, grad, g)
        return value, grad

    return run
