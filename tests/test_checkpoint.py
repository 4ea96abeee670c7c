"""Checkpoint/resume + CanyonOptimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.optim import CanyonOptimizer, Optimizer
from tensorflowraytrace_tpu.utils import checkpoint as ckpt

F64 = jnp.float64


def quadratic_loss(params, key):
    return jnp.sum((params[0] - 3.0) ** 2) + jnp.sum((params[1] + 1.0) ** 2)


def test_checkpoint_roundtrip(tmp_path):
    opt = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                    learning_rate=0.1)
    for _ in range(5):
        opt.single_step(None, momentum=0.5)
    path = str(tmp_path / "ckpt")
    ckpt.save_checkpoint(path, opt)

    opt2 = Optimizer(quadratic_loss, [jnp.ones(4, F64), jnp.ones(2, F64)],
                     learning_rate=0.1)
    ckpt.load_checkpoint(path, opt2)
    for a, b in zip(opt.parameters, opt2.parameters):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(opt._velocity, opt2._velocity):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert opt2.iterations == opt.iterations
    # resumed run continues identically
    e1 = opt.single_step(None, momentum=0.5)
    e2 = opt2.single_step(None, momentum=0.5)
    np.testing.assert_allclose(e1, e2, rtol=1e-12)


def test_export_boundary_stl(tmp_path):
    mesh = mt.hexagonal_mesh(1.0, 3)
    b = bd.ParametricTriangleBoundary(mesh, bd.FromVectorVG((0.0, 0.0, 1.0)),
                                      dtype=F64)
    p = b.init_params() + 0.3
    path = str(tmp_path / "surface.stl")
    ckpt.export_boundary_stl(b, p, path)
    loaded = mt.TriMesh.read(path)
    assert loaded.n_faces == mesh.n_faces
    np.testing.assert_allclose(loaded.points[:, 2].max(), 0.3, atol=1e-5)


def test_canyon_optimizer_converges_and_undoes():
    opt = CanyonOptimizer(quadratic_loss,
                          [jnp.zeros(3, F64), jnp.zeros(3, F64)],
                          base_step_size=0.05, momentum=0.9)
    errors = opt.run(60)
    assert errors[-1] < 0.05 * errors[0]
    # adaptive behavior engaged: step size changed from its base
    assert opt.step_size != 0.05


def test_run_phase_matches_single_steps():
    """Chained phase execution must reproduce the step-by-step stream exactly
    (same PRNG splits, same updates)."""
    k = jax.random.PRNGKey(7)
    o1 = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                   learning_rate=0.1, key=k)
    o2 = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                   learning_rate=0.1, key=k)
    errs1 = [o1.single_step(None, lr_scale=s, momentum=0.5)
             for s in np.linspace(1.0, 0.5, 6)]
    errs2 = o2.run_phase(6, None, lr_scale=(1.0, 0.5), momentum=0.5)
    np.testing.assert_allclose(errs1, errs2, rtol=1e-12)
    for a, b in zip(o1.parameters, o2.parameters):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_training_routine_chain_equivalent():
    k = jax.random.PRNGKey(9)
    routine = [
        {"steps": 4, "learning_rate": 0.5, "momentum": 0.3},
        {"steps": 4, "learning_rate": (0.3, 0.1), "momentum": 0.6},
    ]
    o1 = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                   learning_rate=0.1, key=k)
    e1 = o1.training_routine(routine, report_frequency=0, show_time=False)
    o2 = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                   learning_rate=0.1, key=k)
    e2 = o2.training_routine(routine, report_frequency=0, show_time=False,
                             chain=True)
    np.testing.assert_allclose(e1, e2, rtol=1e-12)
    for a, b in zip(o1.parameters, o2.parameters):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


# ----------------------------------------------------------------------
# optax integration (Optimizer(optax_tx=...))
# ----------------------------------------------------------------------

def test_optax_sgd_matches_builtin():
    """optax.sgd must reproduce the builtin momentum-free path exactly:
    the transform owns the step size, learning_rate stays 1.0, and the
    hygiene stages (finite-guard / clip / accumulator) are shared code."""
    import optax

    k = jax.random.PRNGKey(3)
    o1 = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                   learning_rate=0.1, grad_clip=1e6, key=k)
    o2 = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                   grad_clip=1e6, key=k, optax_tx=optax.sgd(0.1))
    for _ in range(5):
        e1 = o1.single_step(None, momentum=0.0)
        e2 = o2.single_step(None)
    np.testing.assert_allclose(e1, e2, rtol=1e-12)
    for a, b in zip(o1.parameters, o2.parameters):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_optax_adam_converges_with_hygiene_stages():
    """Adam through the full pipeline -- finite-guard, clip, accumulator
    matmul, smoother matmul -- drives the quadratic to its optimum."""
    import optax

    opt = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                    grad_clip=1e6, optax_tx=optax.adam(0.2))
    accs = [jnp.eye(4, dtype=F64), jnp.eye(2, dtype=F64)]
    smooths = [jnp.eye(4, dtype=F64), jnp.eye(2, dtype=F64)]
    errs = opt.run_phase(80, accs, smoothers=smooths)
    assert errs[-1] < 1e-3 * errs[0]
    np.testing.assert_allclose(np.asarray(opt.parameters[0]),
                               np.full(4, 3.0), atol=0.05)


def test_optax_run_phase_matches_single_steps():
    """The chained lax.scan carry must thread the optax state identically to
    the step-by-step path (same PRNG stream, same updates)."""
    import optax

    k = jax.random.PRNGKey(11)
    o1 = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                   key=k, optax_tx=optax.adam(0.1))
    o2 = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                   key=k, optax_tx=optax.adam(0.1))
    errs1 = [o1.single_step(None, lr_scale=s)
             for s in np.linspace(1.0, 0.5, 6)]
    errs2 = o2.run_phase(6, None, lr_scale=(1.0, 0.5))
    np.testing.assert_allclose(errs1, errs2, rtol=1e-12)
    for a, b in zip(o1.parameters, o2.parameters):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_optax_checkpoint_roundtrip(tmp_path):
    """Checkpointing flattens/rebuilds the optax state tree (incl. the int32
    step count) so a resumed adam run continues bit-identically."""
    import optax

    opt = Optimizer(quadratic_loss, [jnp.zeros(4, F64), jnp.zeros(2, F64)],
                    optax_tx=optax.adam(0.1))
    for _ in range(5):
        opt.single_step(None)
    path = str(tmp_path / "ckpt_optax")
    ckpt.save_checkpoint(path, opt)

    opt2 = Optimizer(quadratic_loss, [jnp.ones(4, F64), jnp.ones(2, F64)],
                     optax_tx=optax.adam(0.1))
    ckpt.load_checkpoint(path, opt2)
    e1 = opt.single_step(None)
    e2 = opt2.single_step(None)
    np.testing.assert_allclose(e1, e2, rtol=1e-12)
    for a, b in zip(opt.parameters, opt2.parameters):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_optax_clip_matches_builtin_when_clipping_engages():
    """The clip thresholds are calibrated for the lr-premultiplied gradient;
    the optax path clips the RAW gradient, so its threshold must be divided
    by the combined lr scale -- otherwise optax + learning_rate=0.01 clips
    100x tighter than the builtin path (regression).  With optax.sgd(1.0)
    and shared learning_rate the two paths must produce identical steps
    even when the clip engages (initial gradient here is ~606 >> clip)."""
    import optax

    def steep_loss(params, key):
        return 100.0 * jnp.sum((params[0] - 3.0) ** 2)

    lr = 0.01
    k = jax.random.PRNGKey(5)
    o1 = Optimizer(steep_loss, [jnp.zeros(4, F64)], learning_rate=lr, key=k)
    o2 = Optimizer(steep_loss, [jnp.zeros(4, F64)], learning_rate=lr, key=k,
                   optax_tx=optax.sgd(1.0))
    assert o1.grad_clip == o2.grad_clip == 10.0 * lr
    for _ in range(3):
        e1 = o1.single_step(None, momentum=0.0)
        e2 = o2.single_step(None)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(o1.parameters[0]),
                               np.asarray(o2.parameters[0]), rtol=1e-12)
    # and the clip genuinely engaged: |raw g| * lr = 6 > 0.1 on step 1
    assert float(e1) > 0.0


def test_restore_preserves_key_flavor():
    """restore_into must hand back the same PRNG key flavor the optimizer
    was built with: wrapping a legacy uint32 key as a typed key would crash
    the multi-process _device_keys path after resume (regression)."""
    def loss(params, key):
        return jnp.sum((params[0] - 3.0) ** 2)

    legacy = Optimizer(loss, [jnp.zeros(2, F64)],
                       key=jax.random.PRNGKey(1))
    typed = Optimizer(loss, [jnp.zeros(2, F64)],
                      key=jax.random.key(1))
    for opt in (legacy, typed):
        opt.single_step(None)
    s_legacy, s_typed = ckpt.state_dict(legacy), ckpt.state_dict(typed)

    fresh_legacy = Optimizer(loss, [jnp.zeros(2, F64)],
                             key=jax.random.PRNGKey(9))
    ckpt.restore_into(fresh_legacy, s_legacy)
    assert fresh_legacy.key.dtype == jnp.uint32

    fresh_typed = Optimizer(loss, [jnp.zeros(2, F64)],
                            key=jax.random.key(9))
    ckpt.restore_into(fresh_typed, s_typed)
    assert jnp.issubdtype(fresh_typed.key.dtype, jax.dtypes.prng_key)
    # both resume cleanly
    fresh_legacy.single_step(None)
    fresh_typed.single_step(None)
