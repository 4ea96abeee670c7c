"""Multi-chip sharding tests on the 8-device virtual CPU mesh (the TPU analog
of multi-node testing without a cluster, SURVEY.md section 4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene3D, TraceConfig, TriangleSet, trace,
)
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.parallel import sharding as par

PI = math.pi
F64 = jnp.float64

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def make_scene_and_rays(n):
    half = 5.0
    mirror = TriangleSet.make(
        [[1.0, -half, -half], [1.0, half, half]],
        [[1.0, half, -half], [1.0, -half, half]],
        [[1.0, half, half], [1.0, -half, -half]],
        mat_in=1, dtype=F64)
    target = TriangleSet.make(
        [[-1.0, -half * 9, -half * 9], [-1.0, half * 9, half * 9]],
        [[-1.0, half * 9, -half * 9], [-1.0, -half * 9, half * 9]],
        [[-1.0, half * 9, half * 9], [-1.0, -half * 9, -half * 9]],
        dtype=F64)
    scene = Scene3D.build(optical=[mirror], targets=[target])
    rng = np.random.default_rng(0)
    starts = np.zeros((n, 3))
    starts[:, 1:] = rng.uniform(-1, 1, (n, 2))
    ends = starts + np.asarray([1.0, 0.1, 0.0])
    rays = RaySet.make(jnp.asarray(starts, F64), jnp.asarray(ends, F64),
                       500.0, dtype=F64)
    return scene, rays


def test_parallel_trace_matches_single_device():
    mesh = par.ray_mesh(8)
    scene, rays = make_scene_and_rays(16 * 8)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3)

    res1 = trace(rays, scene, materials, cfg)
    rays_sharded = par.shard_rays(rays, mesh)
    scene_rep = par.replicate(scene, mesh)
    res8 = par.parallel_trace(rays_sharded, scene_rep, materials, cfg, mesh)

    np.testing.assert_array_equal(np.asarray(res1.rays.state),
                                  np.asarray(res8.rays.state))
    np.testing.assert_allclose(np.asarray(res1.rays.p1),
                               np.asarray(res8.rays.p1), atol=1e-12)


def test_parallel_trace_with_history():
    mesh = par.ray_mesh(8)
    scene, rays = make_scene_and_rays(8 * 8)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=2, keep_history=True)
    res1 = trace(rays, scene, materials, cfg)
    res8 = par.parallel_trace(par.shard_rays(rays, mesh),
                              par.replicate(scene, mesh), materials, cfg, mesh)
    np.testing.assert_allclose(np.asarray(res1.history_p1),
                               np.asarray(res8.history_p1), atol=1e-12)


def test_parallel_value_and_grad_sums_shards():
    """The sharded loss/grad must equal the single-device computation on the
    concatenation of all per-device samples."""
    mesh = par.ray_mesh(8)
    scene, _ = make_scene_and_rays(8)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3)

    def local_loss(params, key):
        shift = params[0]
        n = 32
        p0 = jax.random.uniform(key, (n, 3), F64, -1.0, 1.0) * jnp.asarray(
            [0.0, 1.0, 1.0], F64)
        p1 = p0 + jnp.asarray([1.0, 0.0, 0.0], F64)
        rays = RaySet.make(p0, p1 + shift, 500.0, dtype=F64)
        res = trace(rays, scene, materials, cfg)
        fin = res.rays.state == FINISHED
        return jnp.sum(jnp.where(fin, res.rays.p1[:, 1] ** 2, 0.0))

    params = [jnp.zeros((3,), F64)]
    key = jax.random.PRNGKey(5)
    keys = par.split_keys(key, mesh)

    f = par.parallel_value_and_grad(local_loss, mesh)
    loss8, grads8 = f(params, keys)

    # single-device equivalent: sum over the 8 per-device keys
    all_keys = jax.random.split(key, 8)
    loss1 = 0.0
    grads1 = jnp.zeros((3,), F64)
    for k in all_keys:
        l, g = jax.value_and_grad(local_loss)(params, k)
        loss1 += float(l)
        grads1 = grads1 + g[0]

    np.testing.assert_allclose(float(loss8), loss1, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grads8[0]), np.asarray(grads1),
                               rtol=1e-10)


def test_parallel_trace_structural_specs_fold_and_history():
    """Out-specs are derived from TraceResult STRUCTURE, not shape
    coincidence: a per-ray fold accumulator whose length equals the local ray
    count round-trips correctly, and history leaves stay (bounce, ray, ...)
    even when bounce count == local ray count (the case that broke the old
    shape-matching heuristic)."""
    mesh = par.ray_mesh(8)
    n_local = 3
    scene, rays = make_scene_and_rays(8 * n_local)
    materials = (mats.vacuum, mats.reflective)
    # bounce count == n_local on purpose
    cfg = TraceConfig(max_bounces=n_local, keep_history=True)

    def fold_fn(acc, record):
        p0, p1, state, alive = record
        return acc + jnp.where(alive, 1.0, 0.0)

    res1 = trace(rays, scene, materials, cfg, fold_fn=fold_fn,
                 fold_init=jnp.zeros((8 * n_local,), F64))
    res8 = par.parallel_trace(
        par.shard_rays(rays, mesh), par.replicate(scene, mesh), materials,
        cfg, mesh, fold_fn=fold_fn, fold_init=jnp.zeros((n_local,), F64))

    assert res8.fold.shape == (8 * n_local,)
    np.testing.assert_allclose(np.asarray(res1.fold), np.asarray(res8.fold))
    assert res8.history_p1.shape == res1.history_p1.shape
    np.testing.assert_allclose(np.asarray(res1.history_p1),
                               np.asarray(res8.history_p1), atol=1e-12)


def test_parallel_trace_scalar_fold_is_globally_reduced():
    """A scalar (replicated-spec) fold accumulator is a PARTIAL sum on each
    device; parallel_trace must psum it so the returned fold equals the
    single-device value, not one shard's (the silent-1/8th bug)."""
    from tensorflowraytrace_tpu.engine import landing_sum_fold

    mesh = par.ray_mesh(8)
    scene, rays = make_scene_and_rays(8 * 6)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3)
    init, fn = landing_sum_fold(lambda p1: p1[:, 1] ** 2, F64)

    res1 = trace(rays, scene, materials, cfg, fold_fn=fn, fold_init=init)
    res8 = par.parallel_trace(par.shard_rays(rays, mesh),
                              par.replicate(scene, mesh), materials, cfg,
                              mesh, fold_fn=fn, fold_init=init)
    assert float(res1.fold) != 0.0
    np.testing.assert_allclose(float(res8.fold), float(res1.fold), rtol=1e-12)

    # fold_reduce="max" takes the cross-device max instead
    res_max = par.parallel_trace(par.shard_rays(rays, mesh),
                                 par.replicate(scene, mesh), materials, cfg,
                                 mesh, fold_fn=fn, fold_init=init,
                                 fold_reduce="max")
    assert float(res_max.fold) <= float(res1.fold)


def test_parallel_trace_early_exit_reports_global_depth():
    """Under early_exit the per-device bounce counts are pmax'd so the
    replicated n_bounces is the global trace depth."""
    mesh = par.ray_mesh(8)
    scene, rays = make_scene_and_rays(8 * 4)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=50, early_exit=True)
    res1 = trace(rays, scene, materials, cfg)
    res8 = par.parallel_trace(par.shard_rays(rays, mesh),
                              par.replicate(scene, mesh), materials, cfg, mesh)
    assert int(res8.n_bounces) == int(res1.n_bounces)
    assert int(res8.n_bounces) < 50


def test_mesh_optimizer_step_matches_summed_single_device():
    """One data-parallel Optimizer step must equal the single-device update
    pipeline applied to the psum of per-device losses/grads -- the unified
    pipeline (shared _apply_param_update) is EXACT, not approximately
    equivalent."""
    from tensorflowraytrace_tpu.optim import Optimizer, _apply_param_update

    mesh = par.ray_mesh(8)
    scene, _ = make_scene_and_rays(8)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3)

    def local_loss(params, key):
        shift = params[0]
        p0 = jax.random.uniform(key, (16, 3), F64, -1.0, 1.0) * jnp.asarray(
            [0.0, 1.0, 1.0], F64)
        p1 = p0 + jnp.asarray([1.0, 0.0, 0.0], F64)
        rays = RaySet.make(p0, p1 + shift, 500.0, dtype=F64)
        res = trace(rays, scene, materials, cfg)
        fin = res.rays.state == FINISHED
        return jnp.sum(jnp.where(fin, res.rays.p1[:, 1] ** 2, 0.0))

    key0 = jax.random.PRNGKey(11)
    p_init = jnp.full((3,), 0.05, F64)
    opt = Optimizer(local_loss, [p_init], learning_rate=0.05, momentum=0.9,
                    grad_clip=0.5, mesh=mesh, key=key0)
    err = opt.single_step()

    # host-side replay: the optimizer split key0 -> sub, then one key per
    # device; the psum'd loss/grad is the sum over those 8 keys
    _, sub = jax.random.split(key0)
    subs = jax.random.split(sub, 8)
    loss_sum = 0.0
    grad_sum = jnp.zeros((3,), F64)
    for k in subs:
        l, g = jax.value_and_grad(local_loss)([p_init], k)
        loss_sum += float(l)
        grad_sum = grad_sum + g[0]
    p_ref, v_ref = _apply_param_update(
        p_init, grad_sum, jnp.zeros((3,), F64), lr_scale=1.0, momentum=0.9,
        ind_lr=1.0, learning_rate=0.05, clip_mode="common", clip_scale=10.0,
        grad_clip=0.5, accumulator=None, smoother=None)

    np.testing.assert_allclose(err, loss_sum, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(opt.parameters[0]),
                               np.asarray(p_ref), rtol=1e-12)


def test_mesh_optimizer_optax_step_matches_summed_single_device():
    """Optimizer(mesh=..., optax_tx=...) runs the optax update replicated
    after the psum, exactly equal to the host-side replay of the same
    pipeline on the summed gradients."""
    import optax

    from tensorflowraytrace_tpu.optim import Optimizer, _grad_hygiene

    mesh = par.ray_mesh(8)
    scene, _ = make_scene_and_rays(8)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3)

    def local_loss(params, key):
        shift = params[0]
        p0 = jax.random.uniform(key, (16, 3), F64, -1.0, 1.0) * jnp.asarray(
            [0.0, 1.0, 1.0], F64)
        p1 = p0 + jnp.asarray([1.0, 0.0, 0.0], F64)
        rays = RaySet.make(p0, p1 + shift, 500.0, dtype=F64)
        res = trace(rays, scene, materials, cfg)
        fin = res.rays.state == FINISHED
        return jnp.sum(jnp.where(fin, res.rays.p1[:, 1] ** 2, 0.0))

    key0 = jax.random.PRNGKey(13)
    p_init = jnp.full((3,), 0.05, F64)
    tx = optax.adam(0.05)
    opt = Optimizer(local_loss, [p_init], grad_clip=0.5, mesh=mesh, key=key0,
                    optax_tx=tx)
    err = opt.single_step()

    _, sub = jax.random.split(key0)
    subs = jax.random.split(sub, 8)
    loss_sum = 0.0
    grad_sum = jnp.zeros((3,), F64)
    for k in subs:
        l, g = jax.value_and_grad(local_loss)([p_init], k)
        loss_sum += float(l)
        grad_sum = grad_sum + g[0]
    g, scale = _grad_hygiene(p_init, grad_sum, lr_scale=1.0, ind_lr=1.0,
                             learning_rate=1.0, clip_mode="common",
                             clip_scale=10.0, grad_clip=0.5, accumulator=None,
                             premultiply_lr=False)
    state = tx.init([p_init])
    updates, state = tx.update([g], state, [p_init])
    p_ref = p_init + scale * updates[0]

    np.testing.assert_allclose(err, loss_sum, rtol=1e-12)
    # psum reduction order differs from the host loop by ~1 ulp; adam's
    # rsqrt amplifies that on near-zero second moments, so not bit-exact
    np.testing.assert_allclose(np.asarray(opt.parameters[0]),
                               np.asarray(p_ref), rtol=1e-8, atol=1e-15)


def test_mesh_optimizer_training_routine_full_pipeline():
    """The flagship simple_3d_optimize-style schedule running data-parallel
    on the 8-device mesh through the FULL Optimizer: chained phases,
    accumulators + smoothers, individual_lr, an LR ramp -- none of which the
    deleted parallel_train_step fork supported."""
    mesh = par.ray_mesh(8)
    sd, mag, osz = 4.0, 2.0, 0.2
    bp = 4
    rc = bp * bp
    base_points = dist.RandomUniformSquare(osz, bp)
    angles = dist.RandomUniformSphere(PI / 16.0, rc)
    source = src.AngularSource(3, (-sd, 0.0, 0.0), (1.0, 0.0, 0.0), angles,
                               base_points, [575.0] * rc, dense=False)
    zero_mesh = mt.hexagonal_mesh(1.2, 3)
    pts = zero_mesh.points.copy()
    zero_mesh.points = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    lens = bd.ParametricMultiTriangleBoundary(
        zero_mesh, bd.FromVectorVG((1.0, 0.0, 0.0)),
        [bd.ThicknessConstraint(0.0, "min"), bd.ThicknessConstraint(0.2, "min")],
        [True, False], material_list=[{"mat_in": 1, "mat_out": 0}] * 2,
        dtype=F64)
    half = 50.0
    target = TriangleSet.make(
        [[8.0, -half, -half], [8.0, half, half]],
        [[8.0, half, -half], [8.0, -half, half]],
        [[8.0, half, half], [8.0, -half, -half]], dtype=F64)
    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=3)

    def local_loss(params, key):
        surfaces = lens.build(params)
        scene = Scene3D.build(optical=surfaces, targets=[target])
        rays = source.sample(key, dtype=F64)
        res = trace(rays, scene, materials, cfg)
        fin = res.rays.state == FINISHED
        out = res.rays.p1[:, 1:]
        goal = res.rays.fields["rank"] * (-(mag * osz))
        return jnp.sum(jnp.where(fin, jnp.sum((out - goal) ** 2, axis=1), 0.0))

    from tensorflowraytrace_tpu.optim import Optimizer

    top = mt.get_closest_point(zero_mesh, (0, 0, 0))
    _, accumulator = mt.mesh_parametrization_tools(zero_mesh, top)
    smoother = mt.mesh_smoothing_tool(zero_mesh, [300, 50, 20])

    opt = Optimizer(local_loss, lens.init_params(), learning_rate=1.0,
                    grad_clip=1e-3, momentum=0.8, mesh=mesh,
                    key=jax.random.PRNGKey(1))
    errors = opt.training_routine(
        [
            {"steps": 20, "learning_rate": 2e-4,
             "accumulators": [accumulator, accumulator],
             "smoothers": [smoother, smoother]},
            {"steps": 10, "learning_rate": (1e-4, 5e-5), "momentum": 0.9,
             "individual_lr": [1.0, 0.5],
             "accumulators": [accumulator, accumulator],
             "smoothers": [smoother, smoother]},
        ],
        report_frequency=0, show_time=False, chain=True,
    )
    assert len(errors) == 30
    assert errors[-1] < 0.7 * max(errors[:5]), errors[:5] + errors[-3:]


def test_parallel_trace_with_pallas_kernels():
    """The production multi-chip config: shard_map over the pallas search
    (interpret mode on CPU devices) matches the XLA path."""
    mesh = par.ray_mesh(8)
    scene, rays = make_scene_and_rays(16 * 8)
    # pallas path wants f32
    rays = jax.tree.map(lambda a: a.astype(jnp.float32)
                        if a.dtype == jnp.float64 else a, rays)
    scene = jax.tree.map(lambda a: a.astype(jnp.float32)
                         if a.dtype == jnp.float64 else a, scene)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3, use_pallas=True)

    res1 = trace(rays, scene, materials, cfg)
    res8 = par.parallel_trace(par.shard_rays(rays, mesh),
                              par.replicate(scene, mesh), materials, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(res1.rays.state),
                                  np.asarray(res8.rays.state))
    np.testing.assert_allclose(np.asarray(res1.rays.p1),
                               np.asarray(res8.rays.p1), atol=1e-5)


def test_parallel_trace_with_twolevel_grid_cull():
    """shard_map over the two-level candidate-gather kernel (scalar prefetch
    + manual DMA) matches the XLA path on the virtual mesh."""
    mesh = par.ray_mesh(8)
    scene, rays = make_scene_and_rays(16 * 8)
    rays = jax.tree.map(lambda a: a.astype(jnp.float32)
                        if a.dtype == jnp.float64 else a, rays)
    scene = jax.tree.map(lambda a: a.astype(jnp.float32)
                         if a.dtype == jnp.float64 else a, scene)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3, use_pallas=True, cull="grid")

    res1 = trace(rays, scene, materials, cfg)
    res8 = par.parallel_trace(par.shard_rays(rays, mesh),
                              par.replicate(scene, mesh), materials, cfg, mesh)
    np.testing.assert_array_equal(np.asarray(res1.rays.state),
                                  np.asarray(res8.rays.state))
    np.testing.assert_allclose(np.asarray(res1.rays.p1),
                               np.asarray(res8.rays.p1), atol=1e-5)


# ----------------------------------------------------------------------
# init_multihost contract (jax.distributed mocked: no cluster in CI)
# ----------------------------------------------------------------------

def test_init_multihost_passes_through_and_returns_process_index(monkeypatch):
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls["args"] = (coordinator_address, num_processes, process_id)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    got = par.init_multihost("coord:1234", 4, 2)
    assert calls["args"] == ("coord:1234", 4, 2)
    assert got == jax.process_index()


def test_init_multihost_tolerates_already_initialized(monkeypatch):
    def fake_init(**kw):
        raise RuntimeError("jax.distributed is ALREADY initialized")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    assert par.init_multihost() == jax.process_index()  # no raise


def test_init_multihost_reraises_real_errors(monkeypatch):
    def fake_init(**kw):
        raise RuntimeError("coordinator unreachable")

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    with pytest.raises(RuntimeError, match="unreachable"):
        par.init_multihost("coord:1234", 2, 0)


def test_fold_reduce_none_keeps_device0_partial():
    """fold_reduce='none' is documented to keep device 0's value; each
    device's accumulator only folded its OWN shard, so the result must be
    exactly the first shard's partial (all_gather[0]), never some
    unspecified device's partial presented as replicated."""
    from tensorflowraytrace_tpu.engine import landing_sum_fold

    mesh = par.ray_mesh(8)
    n = 8 * 6
    scene, rays = make_scene_and_rays(n)
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3)
    init, fn = landing_sum_fold(lambda p1: p1[:, 1] ** 2, F64)

    res_none = par.parallel_trace(par.shard_rays(rays, mesh),
                                  par.replicate(scene, mesh), materials, cfg,
                                  mesh, fold_fn=fn, fold_init=init,
                                  fold_reduce="none")
    # device 0 holds the first contiguous shard of rays
    first = jax.tree.map(lambda a: a[: n // 8], rays)
    res_first = trace(first, scene, materials, cfg, fold_fn=fn,
                      fold_init=init)
    assert float(res_first.fold) != 0.0
    np.testing.assert_allclose(float(res_none.fold), float(res_first.fold),
                               rtol=1e-12)


def test_mesh_optimizer_accepts_typed_prng_key():
    """Optimizer(mesh=..., key=jax.random.key(0)) -- the new-style typed key
    API -- must work: _device_keys splits on the raw key data (typed key
    arrays cannot cross the numpy hop of the multi-process path)."""
    from tensorflowraytrace_tpu.optim import Optimizer

    mesh = par.ray_mesh(8)

    def local_loss(params, key):
        x = jax.random.normal(key, (4,), F64)
        return jnp.sum((params[0] - 1.0) ** 2) + 0.0 * jnp.sum(x)

    opt = Optimizer(local_loss, [jnp.zeros(3, F64)], learning_rate=0.1,
                    mesh=mesh, key=jax.random.key(7))
    e0 = opt.single_step(None)
    e1 = opt.single_step(None)
    assert np.isfinite(float(e0)) and float(e1) < float(e0)

    # the multi-process branch (make_array_from_callback over numpy key
    # data) must also swallow typed keys
    keys = opt._device_keys(jax.random.key(3))
    assert keys.shape[0] == 8

    class _FakeProcs:
        def __call__(self):
            return 2

    real = jax.process_count
    jax.process_count = _FakeProcs()
    try:
        keys2 = opt._device_keys(jax.random.key(4), steps=2)
        assert keys2.shape[:2] == (2, 8)
    finally:
        jax.process_count = real


def test_parallel_psf_matches_single_device():
    """The ray-sharded coherent PSF (per-shard partial fields + one psum)
    equals the single-device huygens_psf to float64 tolerance."""
    from tensorflowraytrace_tpu.analysis import huygens_psf

    mesh = par.ray_mesh(8)
    n = 8 * 32
    rng = np.random.default_rng(3)
    sources = jnp.asarray(rng.normal(size=(n, 2)), F64)
    opl = jnp.asarray(rng.uniform(5.0, 5.001, n), F64)
    amps = jnp.asarray(rng.uniform(0.5, 1.0, n), F64)
    ys = jnp.linspace(-0.5, 0.5, 33, dtype=F64)
    grid = jnp.stack([jnp.full_like(ys, 40.0), ys], axis=1)
    lam = 0.55e-3

    single = huygens_psf(sources, opl, lam, grid, amplitudes=amps)
    fn = par.parallel_psf(mesh, lam)
    rs = par.ray_sharding(mesh)
    sharded = fn(jax.device_put(sources, rs), jax.device_put(opl, rs),
                 jax.device_put(amps, rs), par.replicate(grid, mesh))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-10)


def test_parallel_trace_with_field_tracker_reactions():
    """The new physics reactions (coated intensity over OPL) run unchanged
    under shard_map -- per-surface tables are closure constants (replicated)
    and ray fields shard with the rays.  Sharded == single-device."""
    import dataclasses

    from tensorflowraytrace_tpu.operations import (
        optical_path_reaction, seed_optical_path,
        thin_film_intensity_reaction,
    )
    from tensorflowraytrace_tpu.ops import thinfilm

    mesh = par.ray_mesh(8)
    scene, rays = make_scene_and_rays(8 * 6)
    rays = seed_optical_path(rays)
    rays = dataclasses.replace(
        rays, fields={**rays.fields,
                      "intensity": jnp.ones(rays.n_rays, F64)})
    materials = (mats.vacuum, mats.reflective)
    d = float(thinfilm.quarter_wave_thickness(1.38, 500.0))
    rx = thin_film_intensity_reaction(
        [[(1.38, d)]], {"triangles": np.asarray([0, 0, -1, -1])},
        base_reaction=optical_path_reaction())
    cfg = TraceConfig(max_bounces=3)

    res1 = trace(rays, scene, materials, cfg, reaction=rx)
    res8 = par.parallel_trace(par.shard_rays(rays, mesh),
                              par.replicate(scene, mesh), materials, cfg,
                              mesh, reaction=rx)
    for f in ("intensity", "opl", "cur_n"):
        np.testing.assert_allclose(np.asarray(res8.rays.fields[f]),
                                   np.asarray(res1.rays.fields[f]),
                                   atol=1e-12)
    np.testing.assert_array_equal(np.asarray(res8.rays.state),
                                  np.asarray(res1.rays.state))
