"""Optimization: gradient processing + training routines.

Reference counterpart: /root/reference/tfrt/optimizer.py (SGD_Optimizer
wrapping tf.optimizers.SGD(nesterov=True)).  The per-step pipeline is kept
exactly (optimizer.py:187-258):

    grads = d(error)/d(params)            # through scene-build + trace
    grad  = where(finite, grad, 0)        # None/NaN guard (:227-240)
    grad *= lr_scale * individual_lr * learning_rate        (:243)
    grad  = clip(grad, +-clip)            # common or individual mode (:244-248)
    grad  = accumulator @ grad            # mesh-graph accumulation (:251-256)
    params -= step(grad)                  # SGD + Nesterov momentum
    params  = smoother @ params           # optional smoothing (:260-282)

TPU-native differences:
* The entire step (loss, backward, hygiene, update, smoothing) is ONE jitted
  function -- no per-step Python/TF-eager overhead; the accumulator and
  smoother matmuls land on the MXU.
* Momentum is explicit Nesterov (v = mu v + g; step = g + mu v).  The
  reference's hidden tf-SGD base learning rate of 0.01 is NOT reproduced:
  here the step size is exactly what the gradient pipeline computes.
* Loss functions are pure: ``loss_fn(params, key, *args, **kwargs) ->
  scalar`` (or without key if ``pass_key=False``); re-sampling random
  sources each step = passing a fresh PRNG key (replacing update()-inside-
  GradientTape, optimizer.py:216-218).
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
import numpy as np


def _plist(data, n, what):
    """Broadcast a scalar-or-list argument to a list of length n
    (convert_to_plist, optimizer.py:161-179)."""
    if isinstance(data, (list, tuple)):
        if len(data) != n:
            raise ValueError(f"{what} must have one element per parameter")
        return list(data)
    return [data] * n


def _lr_schedule(lr, steps):
    """Scalar or (start, end) ramp -> per-step list (convert_to_lrlist,
    optimizer.py:181-185)."""
    if isinstance(lr, (tuple, list)) and len(lr) == 2:
        return list(np.linspace(lr[0], lr[1], steps))
    return [lr] * steps


def _grad_hygiene(p, g, lr_scale, ind_lr, learning_rate, clip_mode,
                  clip_scale, grad_clip, accumulator, premultiply_lr):
    """The gradient-hygiene stages shared by the builtin Nesterov update and
    the optax path (optimizer.py:227-256): finite-guard -> lr scale (builtin
    path only) -> clip -> accumulator matmul.  Returns the processed gradient
    and the combined lr factor (the optax path multiplies it into the
    transform's update instead of the raw gradient -- pre-scaling the
    gradient would be invisible to scale-invariant transforms like Adam).

    The clip thresholds are calibrated for the lr-premultiplied gradient
    (reference optimizer.py:243-248 clips AFTER the lr scale); on the optax
    path the gradient is still raw here, so the threshold is divided by the
    same combined scale -- both paths clip the identical set of raw
    gradients.  In 'individual' mode that makes the optax path's effective
    raw-gradient clip the constant clip_scale, exactly like the builtin
    path, instead of drifting across an lr ramp.

    Everything multiplying into the update is cast to the parameter's dtype:
    lr_scale arrives as traced f64 under jax_enable_x64 and would otherwise
    silently promote f32 params (and break the scan carry types).
    """
    dt = p.dtype
    lr_s = jnp.asarray(lr_scale, dt)
    scale = lr_s * ind_lr * learning_rate
    g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
    if premultiply_lr:
        g = g * scale
    if clip_mode == "common":
        clip = jnp.asarray(grad_clip, dt)
    else:
        clip = ind_lr * clip_scale * learning_rate * lr_s
    if not premultiply_lr:
        # raw-gradient space: same effective clip as the scaled path
        # (scale == 0 means the update is zeroed downstream anyway; keep
        # the division safe so no inf*0 leaks out of clip's backward)
        safe_scale = jnp.maximum(jnp.abs(scale), jnp.finfo(dt).tiny)
        clip = clip / safe_scale
    g = jnp.clip(g, -clip, clip)
    if accumulator is not None:
        g = (accumulator.astype(dt) @ g.reshape(-1, 1)).reshape(g.shape)
    return g, scale


def _smooth(p, smoother):
    if smoother is not None:
        p = (smoother.astype(p.dtype) @ p.reshape(-1, 1)).reshape(p.shape)
    return p


def _apply_param_update(p, g, v, lr_scale, momentum, ind_lr, learning_rate,
                        clip_mode, clip_scale, grad_clip, accumulator,
                        smoother):
    """One parameter's gradient-hygiene + Nesterov update (optimizer.py:
    227-282 pipeline): finite-guard -> lr scale -> clip -> accumulator
    matmul -> momentum -> smoother matmul.  Shared by the per-step and the
    chained (lax.scan) step builders so the two can never diverge.
    """
    g, _ = _grad_hygiene(p, g, lr_scale, ind_lr, learning_rate, clip_mode,
                         clip_scale, grad_clip, accumulator,
                         premultiply_lr=True)
    mom = jnp.asarray(momentum, p.dtype)
    v = mom * v + g
    p = p - (g + mom * v)
    return _smooth(p, smoother), v


class Optimizer:
    """Gradient-descent driver for parametric optics.

    Parameters
    ----------
    loss_fn : callable
        ``loss_fn(params, key, *args, **kwargs) -> scalar`` when ``pass_key``
        (default), else ``loss_fn(params, *args, **kwargs)``.  ``params`` is a
        list of arrays.  The function should build the scene from params,
        trace, and return the error -- the reference's error_function +
        system.update + ray_trace rolled into one pure function.
    parameters : list of arrays
        Initial parameter values (one entry per optic surface).
    mesh : jax.sharding.Mesh, optional
        A 1-D ray mesh (``parallel.sharding.ray_mesh()``).  When given, every
        step runs data-parallel under ``shard_map``: ``loss_fn(params, key)``
        computes the loss of ONE device's ray shard (sample your per-device
        batch from ``key`` -- each device gets its own key), losses and
        gradients are psum-reduced over ICI, and the full update pipeline
        (finite-guard, individual_lr, clip modes, accumulators, smoothers,
        LR ramps, chained phases, training_routine) runs replicated on every
        device -- the single-device and data-parallel paths share
        ``_apply_param_update`` and can never diverge.  Requires
        ``pass_key=True``.
    """

    def __init__(self, loss_fn, parameters, learning_rate=1.0, momentum=0.0,
                 individual_lr=None, grad_clip="default", clip_mode="common",
                 clip_scale=10.0, pass_key=True, key=None, mesh=None,
                 optax_tx=None):
        if not isinstance(parameters, (list, tuple)):
            raise ValueError("Optimizer: parameters must be a list of arrays")
        if mesh is not None and not pass_key:
            raise ValueError(
                "Optimizer(mesh=...) needs pass_key=True: data parallelism "
                "works by giving every device its own sampling key")
        self.mesh = mesh
        self.loss_fn = loss_fn
        self.parameters = [jnp.asarray(p) for p in parameters]
        self.learning_rate = learning_rate
        self.momentum = momentum
        self.individual_lr = (list(individual_lr) if individual_lr is not None
                              else [1.0] * len(self.parameters))
        self.clip_scale = clip_scale
        self.grad_clip = (clip_scale * learning_rate if grad_clip == "default"
                          else grad_clip)
        if clip_mode not in ("common", "individual"):
            raise ValueError("clip_mode must be 'common' or 'individual'")
        self.clip_mode = clip_mode
        self.pass_key = pass_key
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self.iterations = 0
        # optax_tx: any optax.GradientTransformation (e.g. optax.adam(1e-3)).
        # It replaces ONLY the momentum/step stage; the reference pipeline's
        # gradient hygiene (finite-guard, clip, accumulator matmul) still
        # runs first, and learning_rate/individual_lr/lr_scale (incl. phase
        # ramps) multiply the transform's update.  ``momentum`` args are
        # ignored (the transform owns its state).  Works under mesh= too.
        self._tx = optax_tx
        if optax_tx is not None:
            self._velocity = optax_tx.init(self.parameters)
        else:
            self._velocity = [jnp.zeros_like(p) for p in self.parameters]
        if mesh is not None and jax.process_count() > 1:
            # multi-controller: locally-created arrays are only addressable
            # on this process; replicate params/velocity onto the global mesh
            from tensorflowraytrace_tpu.parallel.sharding import (
                replicate_from_host)

            self.parameters = replicate_from_host(self.parameters, mesh)
            self._velocity = replicate_from_host(self._velocity, mesh)
        self._step_cache = {}

    # ------------------------------------------------------------------

    def _vag(self):
        """value_and_grad of the loss; under a mesh the per-device loss and
        grads are psum-reduced over the ray axis (the workload's ONE
        collective, replacing the implicit whole-batch reduction of
        reference optimizer.py:220,258)."""
        loss_fn = self.loss_fn
        pass_key = self.pass_key
        mesh = self.mesh

        def vag(params, key, args, kwargs):
            if pass_key:
                error, grads = jax.value_and_grad(loss_fn)(
                    params, key, *args, **kwargs)
            else:
                error, grads = jax.value_and_grad(loss_fn)(
                    params, *args, **kwargs)
            if mesh is not None:
                from tensorflowraytrace_tpu.parallel.sharding import RAY_AXIS

                error = jax.lax.psum(error, RAY_AXIS)
                grads = jax.tree.map(
                    lambda x: jax.lax.psum(x, RAY_AXIS), grads)
            return error, grads

        return vag

    def _mesh_wrap(self, fn, keys_spec, n_out):
        """Wrap a step/phase body in shard_map over the ray mesh: params,
        hygiene matrices, schedules and extra args are replicated; only the
        PRNG keys are per-device.  The body runs identically on every device
        after its psum, so every output is replicated."""
        from jax.sharding import PartitionSpec as P

        from tensorflowraytrace_tpu.parallel.sharding import _shard_map

        in_specs = (P(), P(), P(), P(), keys_spec, P(), P(), P(), P())
        out_specs = tuple([P()] * n_out)
        return _shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                          out_specs=out_specs)

    def _device_keys(self, sub, steps=None):
        """Per-device sampling keys, sharded over the mesh: (n_dev,) for one
        step or (steps, n_dev) scanned over by a chained phase.

        Multi-controller safe: every process derives the same key table from
        the same host PRNG stream and contributes its addressable shards, so
        the mesh may span processes (a pod)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tensorflowraytrace_tpu.parallel.sharding import RAY_AXIS

        nd = self.mesh.devices.size
        if jnp.issubdtype(jnp.asarray(sub).dtype, jax.dtypes.prng_key):
            # new-style typed keys can't cross the numpy hop below
            # (np.asarray raises on PRNGKey dtypes); split on the raw key
            # data instead -- jax.random accepts legacy uint32 keys
            # everywhere, so loss functions see a working key either way
            sub = jax.random.key_data(sub)
        if steps is None:
            keys = jax.random.split(sub, nd)
            spec = P(RAY_AXIS)
        else:
            keys = jax.random.split(sub, steps * nd)
            keys = keys.reshape((steps, nd) + keys.shape[1:])
            spec = P(None, RAY_AXIS)
        sharding = NamedSharding(self.mesh, spec)
        if jax.process_count() > 1:
            host = np.asarray(keys)
            return jax.make_array_from_callback(host.shape, sharding,
                                                lambda idx: host[idx])
        return jax.device_put(keys, sharding)

    def _make_apply(self):
        """The per-step parameter-update function shared by the single-step
        and chained (lax.scan) builders: ``(params, state, grads, lr_scale,
        momentum, accumulators, smoothers) -> (params, state)``.  ``state``
        is the Nesterov velocity list, or the optax state when the optimizer
        was built with ``optax_tx``."""
        individual_lr = tuple(self.individual_lr)
        clip_mode = self.clip_mode
        clip_scale = self.clip_scale
        grad_clip = self.grad_clip
        learning_rate = self.learning_rate
        tx = self._tx

        def apply_builtin(params, velocity, grads, lr_scale, momentum,
                          accumulators, smoothers):
            new_params = []
            new_velocity = []
            for i, (p, g, v) in enumerate(zip(params, grads, velocity)):
                p, v = _apply_param_update(
                    p, g, v, lr_scale, momentum, individual_lr[i],
                    learning_rate, clip_mode, clip_scale, grad_clip,
                    accumulators[i], smoothers[i])
                new_params.append(p)
                new_velocity.append(v)
            return new_params, new_velocity

        def apply_optax(params, opt_state, grads, lr_scale, momentum,
                        accumulators, smoothers):
            del momentum  # the transform owns its own momentum state
            proc, scales = [], []
            for i, (p, g) in enumerate(zip(params, grads)):
                g, s = _grad_hygiene(
                    p, g, lr_scale, individual_lr[i], learning_rate,
                    clip_mode, clip_scale, grad_clip, accumulators[i],
                    premultiply_lr=False)
                proc.append(g)
                scales.append(s)
            updates, opt_state = tx.update(proc, opt_state, params)
            new_params = [
                _smooth(p + s * u.astype(p.dtype), sm)
                for p, u, s, sm in zip(params, updates, scales, smoothers)
            ]
            return new_params, opt_state

        return apply_builtin if tx is None else apply_optax

    def _make_step(self, acc_struct, smooth_struct, n_args, kwarg_names):
        """Build + cache the jitted update step for a given static config."""

        vag = self._vag()
        apply_updates = self._make_apply()

        def step(params, velocity, accumulators, smoothers, key, lr_scale,
                 momentum, args, kwargs):
            error, grads = vag(params, key, args, kwargs)
            new_params, new_velocity = apply_updates(
                params, velocity, grads, lr_scale, momentum, accumulators,
                smoothers)
            return new_params, new_velocity, error

        if self.mesh is None:
            return jax.jit(step)

        from jax.sharding import PartitionSpec as P

        from tensorflowraytrace_tpu.parallel.sharding import RAY_AXIS

        def sharded(params, velocity, accumulators, smoothers, keys, lr_scale,
                    momentum, args, kwargs):
            return step(params, velocity, accumulators, smoothers, keys[0],
                        lr_scale, momentum, args, kwargs)

        return jax.jit(self._mesh_wrap(sharded, P(RAY_AXIS), 3))

    def single_step(self, accumulators=None, *args, lr_scale=1.0,
                    momentum=None, smoothers=None, verbose=False, sync=True,
                    **kwargs):
        """One optimization step (optimizer.py:284-320).  Returns the error
        (a Python float if ``sync``, else an on-device scalar)."""
        n = len(self.parameters)
        accumulators = [None if a is None else jnp.asarray(a)
                        for a in _plist(accumulators, n, "accumulators")]
        smoothers = [None if s is None else jnp.asarray(s)
                     for s in _plist(smoothers, n, "smoothers")]
        momentum = self.momentum if momentum is None else momentum

        cache_key = (
            tuple(a is None for a in accumulators),
            tuple(s is None for s in smoothers),
            len(args), tuple(sorted(kwargs)),
        )
        if cache_key not in self._step_cache:
            self._step_cache[cache_key] = self._make_step(*cache_key)
        step = self._step_cache[cache_key]

        self.key, sub = jax.random.split(self.key)
        if self.mesh is not None:
            sub = self._device_keys(sub)
        self.parameters, self._velocity, error = step(
            self.parameters, self._velocity, accumulators, smoothers, sub,
            jnp.asarray(lr_scale), jnp.asarray(momentum), args, kwargs,
        )
        self.iterations += 1
        if not sync:
            # leave the error on-device: steps pipeline without a host
            # round-trip each (important through remote-attached TPUs)
            return jnp.mean(error)
        err = float(jnp.mean(error))
        if verbose:
            print(f"step {self.iterations} error: {err}")
        return err

    def _make_chained(self, acc_struct, smooth_struct, n_args, kwarg_names):
        """Jitted lax.scan over a whole phase: one dispatch for N steps.

        Per-step dispatch through a remotely-attached TPU costs ~100 ms of
        round-trip latency; chaining brings the measured step time from
        ~116 ms to ~11 ms at simple_3d_optimize scale.
        """
        vag = self._vag()
        apply_updates = self._make_apply()

        def chained(params, velocity, accumulators, smoothers, key, lr_scales,
                    momentum, args, kwargs):
            def body(carry, lr_scale):
                params, velocity, key = carry
                key, sub = jax.random.split(key)
                error, grads = vag(params, sub, args, kwargs)
                params, velocity = apply_updates(
                    params, velocity, grads, lr_scale, momentum,
                    accumulators, smoothers)
                return (params, velocity, key), error

            (params, velocity, key), errors = jax.lax.scan(
                body, (params, velocity, key), lr_scales)
            return params, velocity, key, errors

        if self.mesh is None:
            return jax.jit(chained)

        from jax.sharding import PartitionSpec as P

        from tensorflowraytrace_tpu.parallel.sharding import RAY_AXIS

        def chained_mesh(params, velocity, accumulators, smoothers, keys,
                         lr_scales, momentum, args, kwargs):
            # keys: (steps, 1) per-device slice of the (steps, n_dev) key
            # schedule -- scanned alongside the lr ramp so the host stays in
            # charge of the PRNG stream (no in-device splitting to keep
            # replicated-carry types simple under shard_map)
            def body(carry, xs):
                params, velocity = carry
                lr_scale, keys_t = xs
                error, grads = vag(params, keys_t[0], args, kwargs)
                params, velocity = apply_updates(
                    params, velocity, grads, lr_scale, momentum,
                    accumulators, smoothers)
                return (params, velocity), error

            (params, velocity), errors = jax.lax.scan(
                body, (params, velocity), (lr_scales, keys))
            return params, velocity, errors

        return jax.jit(self._mesh_wrap(chained_mesh, P(None, RAY_AXIS), 3))

    def run_phase(self, steps, accumulators=None, *args, lr_scale=1.0,
                  momentum=None, smoothers=None, **kwargs):
        """Run ``steps`` optimization steps in ONE device dispatch.

        ``lr_scale`` may be a scalar, a (start, end) ramp, or a per-step
        array.  Returns the per-step errors as a numpy array.
        """
        n = len(self.parameters)
        accumulators = [None if a is None else jnp.asarray(a)
                        for a in _plist(accumulators, n, "accumulators")]
        smoothers = [None if s is None else jnp.asarray(s)
                     for s in _plist(smoothers, n, "smoothers")]
        momentum = self.momentum if momentum is None else momentum
        lr_scales = jnp.asarray(_lr_schedule(lr_scale, steps))

        cache_key = (
            "chained",
            tuple(a is None for a in accumulators),
            tuple(s is None for s in smoothers),
            len(args), tuple(sorted(kwargs)),
        )
        if cache_key not in self._step_cache:
            self._step_cache[cache_key] = self._make_chained(*cache_key[1:])
        chained = self._step_cache[cache_key]

        if self.mesh is None:
            self.parameters, self._velocity, self.key, errors = chained(
                self.parameters, self._velocity, accumulators, smoothers,
                self.key, lr_scales, jnp.asarray(momentum), args, kwargs)
        else:
            self.key, sub = jax.random.split(self.key)
            keys = self._device_keys(sub, steps)
            self.parameters, self._velocity, errors = chained(
                self.parameters, self._velocity, accumulators, smoothers,
                keys, lr_scales, jnp.asarray(momentum), args, kwargs)
        self.iterations += steps
        return np.asarray(errors)

    @staticmethod
    def smooth(parameters, smoother):
        """Standalone smoothing (optimizer.py:260-282)."""
        if smoother is None:
            return parameters
        smoother = jnp.asarray(smoother)
        return (smoother @ parameters.reshape(-1, 1)).reshape(parameters.shape)

    def training_routine(self, routine, post_step=None, report_frequency=1,
                         show_time=True, chain=False):
        """Run phases of optimization steps (optimizer.py:322-442).

        Each phase dict may override: steps, learning_rate (scalar or
        (start, end) ramp of the *relative* rate), momentum, accumulators,
        smoothers, erf_args, erf_kwargs, individual_lr.
        Returns the list of per-step errors.

        ``chain=True`` runs each whole phase as ONE device dispatch
        (run_phase): per-step reporting and post_step are skipped, but on a
        remotely-attached TPU this removes ~100 ms of launch latency per
        step.
        """
        phase = {
            "steps": 10,
            "learning_rate": 1.0,
            "momentum": 0.0,
            "accumulators": None,
            "smoothers": None,
            "erf_args": [],
            "erf_kwargs": {},
            "individual_lr": None,
        }
        self.iterations = 0
        errors = []
        total_iterations = sum(p.get("steps", phase["steps"]) for p in routine)
        start_time = time.time()

        for phase_idx, new_phase in enumerate(routine):
            phase.update(new_phase)
            if phase["steps"] <= 0:
                continue  # a scaled-down routine may round a phase to 0 steps
            lrs = _lr_schedule(phase["learning_rate"], phase["steps"])
            if phase["individual_lr"] is not None:
                self.individual_lr = list(phase["individual_lr"])
                self._step_cache.clear()  # individual_lr is baked into the jit
            if chain:
                phase_errors = self.run_phase(
                    phase["steps"], phase["accumulators"],
                    *phase["erf_args"],
                    lr_scale=phase["learning_rate"],
                    momentum=phase["momentum"],
                    smoothers=phase["smoothers"],
                    **phase["erf_kwargs"],
                )
                errors.extend(float(e) for e in phase_errors)
                if report_frequency:
                    print(f"Phase {phase_idx + 1}/{len(routine)} "
                          f"({phase['steps']} steps, chained): final error "
                          f"{float(phase_errors[-1])}.")
                if post_step:
                    post_step()
                continue
            for i in range(phase["steps"]):
                reporting = (report_frequency
                             and (self.iterations + 1) % report_frequency == 0)
                err = self.single_step(
                    phase["accumulators"],
                    *phase["erf_args"],
                    lr_scale=lrs[i],
                    momentum=phase["momentum"],
                    smoothers=phase["smoothers"],
                    sync=bool(reporting),
                    **phase["erf_kwargs"],
                )
                errors.append(err)
                if reporting:
                    print(
                        f"Phase {phase_idx + 1}/{len(routine)}, "
                        f"step {i + 1}/{phase['steps']}, "
                        f"total {self.iterations}/{total_iterations}-"
                        f"{100 * self.iterations / total_iterations:.1f}%.  "
                        f"Error: {err}."
                    )
                if post_step:
                    post_step()

        # one batched device->host fetch for all unsynced per-step errors
        errors = [float(x) for x in np.asarray(
            jnp.stack([jnp.asarray(e) for e in errors]))] if errors else []

        if show_time:
            total = time.time() - start_time
            print(f"Completed training routine.  Took {total} seconds.")
            print(f"Steps took an average of {total / max(total_iterations, 1)}"
                  " seconds per step.")
        return errors


class CanyonOptimizer:
    """Adaptive-step momentum descent with undo-on-regression.

    Modern port of the reference's legacy CanyonOptimizer
    (/root/reference/tfrt/old/CanyonOptimizer.py:14-21): built for "canyon"
    loss landscapes (steep walls, shallow floor).  Each successful step grows
    the step size; a step that increases the error is UNDONE, the velocity is
    zeroed, and the step size shrinks.

    ``loss_fn(params, key) -> scalar`` as with Optimizer (pass_key=True).
    """

    def __init__(self, loss_fn, parameters, base_step_size=1.0, momentum=0.95,
                 growth_factor=1.1, shrink_factor=0.5, pass_key=True, key=None):
        if not isinstance(parameters, (list, tuple)):
            raise ValueError("CanyonOptimizer: parameters must be a list")
        self.loss_fn = loss_fn
        self.parameters = [jnp.asarray(p) for p in parameters]
        self.step_size = base_step_size
        self.momentum = momentum
        self.growth_factor = growth_factor
        self.shrink_factor = shrink_factor
        self.pass_key = pass_key
        self.key = key if key is not None else jax.random.PRNGKey(0)
        self._velocity = [jnp.zeros_like(p) for p in self.parameters]
        self._prev_error = None
        self._prev_params = None
        self.iterations = 0

        if pass_key:
            self._vag = jax.jit(jax.value_and_grad(loss_fn))
        else:
            self._vag = jax.jit(jax.value_and_grad(lambda p, k: loss_fn(p)))

    def single_step(self, verbose=False):
        self.key, sub = jax.random.split(self.key)
        error, grads = self._vag(self.parameters, sub)
        error = float(error)

        if self._prev_error is not None and error > self._prev_error:
            # regression: undo, kill velocity, shrink (CanyonOptimizer.py:16-19)
            self.parameters = self._prev_params
            self._velocity = [jnp.zeros_like(p) for p in self.parameters]
            self.step_size *= self.shrink_factor
            if verbose:
                print(f"step {self.iterations}: regression "
                      f"({self._prev_error:.4g} -> {error:.4g}); undo, "
                      f"step_size={self.step_size:.3g}")
            self.iterations += 1
            return self._prev_error

        self._prev_params = list(self.parameters)
        new_params = []
        new_velocity = []
        for p, g, v in zip(self.parameters, grads, self._velocity):
            g = jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g))
            v = self.momentum * v + g
            new_params.append(p - self.step_size * v)
            new_velocity.append(v)
        self.parameters = new_params
        self._velocity = new_velocity
        self._prev_error = error
        self.step_size *= self.growth_factor
        self.iterations += 1
        if verbose:
            print(f"step {self.iterations} error: {error:.4g} "
                  f"step_size={self.step_size:.3g}")
        return error

    def run(self, steps, verbose=False):
        return [self.single_step(verbose=verbose) for _ in range(steps)]
