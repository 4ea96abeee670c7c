"""Streaming mega-batch tracing: trace_streamed / parallel_trace_streamed.

VERDICT r3 next-round #4: fold-style losses past the single-dispatch HBM
ceiling.  Pins:

* streamed == single-dispatch results exactly (scalar "sum" folds, per-ray
  "concat" folds, state counts), including a ragged tail padded with DEAD
  slots that no fold or count sees,
* the block-generator path (rays as a callable: the input stream never
  materializes),
* differentiability through the stream with remat_blocks,
* composition with sharding: 8-device parallel_trace_streamed equals the
  single-device streamed result (one psum),
* the OOM-adjacent error message in trace() pointing here.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.engine import (
    landing_sum_fold, path_length_fold, trace_streamed,
)
from tensorflowraytrace_tpu.ops import materials as mats

F64 = jnp.float64
PI = math.pi


def guide_scene(dtype=F64):
    """The many-bounce TIR wedge guide (cpu_tpu_agreement config 5 shape)
    with a target plate at the tip."""
    guide = SegmentSet.make(
        [[-0.1, -4.0], [0.0, 4.0]],
        [[0.0, 4.0], [0.1, -4.0]],
        mat_in=1, mat_out=0, dtype=dtype)
    tgt = SegmentSet.make([[-0.5, -4.2]], [[0.5, -4.2]], dtype=dtype)
    scene = Scene2D.build(optical_segments=[guide], target_segments=[tgt])
    return scene, (mats.vacuum, mats.acrylic)


def lambertian_rays(n, dtype=F64, key=0):
    from tensorflowraytrace_tpu.models import distributions as dist
    from tensorflowraytrace_tpu.models import sources as src

    angles = dist.RandomLambertianAngularDistribution(-0.35 * PI, 0.35 * PI, n)
    beam = dist.RandomUniformBeam(-0.08, 0.08, n)
    s = src.AngularSource(2, (0.0, 3.9), -PI / 2, angles, beam,
                          [575.0] * n, dense=False)
    return s.sample(jax.random.PRNGKey(key), dtype=dtype)


CFG = TraceConfig(max_bounces=12)


def landing_loss_fold(dtype):
    return landing_sum_fold(lambda p1: p1[:, 0] ** 2, dtype)


def test_streamed_scalar_fold_matches_single_dispatch():
    scene, materials = guide_scene()
    rays = lambertian_rays(1000)
    init, fn = landing_loss_fold(F64)
    full = trace(rays, scene, materials, CFG, fold_fn=fn, fold_init=init)
    # 1000 rays in blocks of 256 -> 4 blocks, 24 DEAD padding slots
    res = trace_streamed(rays, scene, materials, CFG, fold_fn=fn,
                         fold_init=init, block_size=256)
    assert res.n_blocks == 4 and res.n_rays == 1000
    np.testing.assert_allclose(float(res.fold), float(full.fold), rtol=1e-12)
    # state counts match the single dispatch (padding already subtracted)
    states = np.asarray(full.rays.state)
    expect = [int((states == c).sum()) for c in range(4)]
    np.testing.assert_array_equal(np.asarray(res.state_counts), expect)
    assert int(res.state_counts.sum()) == 1000
    assert int(res.counts_by_name["finished"]) == expect[1]


def test_streamed_per_ray_fold_concat():
    """path_length_fold is per-slot: merge='concat' reassembles the (N,)
    accumulator across blocks, trimming the padding."""
    scene, materials = guide_scene()
    rays = lambertian_rays(700)
    init_f, fn = path_length_fold(700, F64)
    full = trace(rays, scene, materials, CFG, fold_fn=fn, fold_init=init_f)
    init_b, _ = path_length_fold(256, F64)
    res = trace_streamed(rays, scene, materials, CFG, fold_fn=fn,
                         fold_init=init_b, block_size=256, merge="concat")
    assert res.fold.shape == (700,)
    np.testing.assert_allclose(np.asarray(res.fold), np.asarray(full.fold),
                               rtol=1e-12)


def test_streamed_block_generator():
    """rays as a callable: block i samples the source with fold_in(key, i);
    the concatenated equivalent traced in one dispatch must agree."""
    scene, materials = guide_scene()
    block = 200
    n_blocks = 3
    key = jax.random.PRNGKey(7)

    from tensorflowraytrace_tpu.models import distributions as dist
    from tensorflowraytrace_tpu.models import sources as src

    angles = dist.RandomLambertianAngularDistribution(-0.35 * PI, 0.35 * PI,
                                                      block)
    beam = dist.RandomUniformBeam(-0.08, 0.08, block)
    s = src.AngularSource(2, (0.0, 3.9), -PI / 2, angles, beam,
                          [575.0] * block, dense=False)

    def _gen_block(i):
        return s.sample(jax.random.fold_in(key, i), dtype=F64)

    init, fn = landing_loss_fold(F64)
    res = trace_streamed(_gen_block, scene, materials, CFG, fold_fn=fn,
                         fold_init=init, block_size=block, n_blocks=n_blocks)
    assert res.n_rays == block * n_blocks

    import dataclasses

    blocks = [_gen_block(i) for i in range(n_blocks)]
    cat = jax.tree.map(lambda *a: jnp.concatenate(a), *blocks)
    full = trace(cat, scene, materials, CFG, fold_fn=fn, fold_init=init)
    np.testing.assert_allclose(float(res.fold), float(full.fold), rtol=1e-12)


@pytest.mark.parametrize("bpd", [1, 2, 3])
def test_blocks_per_dispatch_matches_single_dispatch(bpd):
    """Host-chunked dispatches (the TPU-watchdog guard) are bit-identical
    to the one-lax.map program: scalar fold, concat fold, and counts, with
    a ragged dispatch tail (4 blocks at bpd=3) and a ragged ray tail."""
    scene, materials = guide_scene()
    rays = lambertian_rays(1000)
    init, fn = landing_loss_fold(F64)
    one = trace_streamed(rays, scene, materials, CFG, fold_fn=fn,
                         fold_init=init, block_size=256)
    res = trace_streamed(rays, scene, materials, CFG, fold_fn=fn,
                         fold_init=init, block_size=256,
                         blocks_per_dispatch=bpd)
    np.testing.assert_array_equal(np.asarray(res.fold),
                                  np.asarray(one.fold))
    np.testing.assert_array_equal(np.asarray(res.state_counts),
                                  np.asarray(one.state_counts))

    init_b, fn_p = path_length_fold(256, F64)
    cat_one = trace_streamed(rays, scene, materials, CFG, fold_fn=fn_p,
                             fold_init=init_b, block_size=256,
                             merge="concat")
    cat = trace_streamed(rays, scene, materials, CFG, fold_fn=fn_p,
                         fold_init=init_b, block_size=256, merge="concat",
                         blocks_per_dispatch=bpd)
    np.testing.assert_array_equal(np.asarray(cat.fold),
                                  np.asarray(cat_one.fold))


def test_landing_histogram_fold_matches_final_histogram():
    """The in-scan histogram equals histogram2d over the final finished
    landings: each ray is binned exactly once, at its terminating bounce."""
    from tensorflowraytrace_tpu import landing_histogram_fold
    from tensorflowraytrace_tpu.analysis import histogram2d

    scene, materials = guide_scene()
    rays = lambertian_rays(800)
    rng = ((-0.5, 0.5), (-4.25, -4.15))
    init, fn = landing_histogram_fold(rng, 32, 8, dtype=F64)
    res = trace(rays, scene, materials, CFG, fold_fn=fn, fold_init=init)
    fin = np.asarray(res.rays.state) == FINISHED
    assert fin.sum() > 20
    p1 = np.asarray(res.rays.p1)
    ref = histogram2d(p1[fin, 0], p1[fin, 1], rng, 32, 8, dtype=F64)
    np.testing.assert_array_equal(np.asarray(res.fold), np.asarray(ref))


def test_landing_histogram_fold_weighted_by_tracker_field():
    """fold_fields=True exposes tracker fields to the fold: the
    intensity-weighted landing image equals histogram2d weighted by the
    final per-ray Fresnel intensities."""
    from tensorflowraytrace_tpu import landing_histogram_fold
    from tensorflowraytrace_tpu.analysis import histogram2d
    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction

    scene, materials = guide_scene()
    rays = lambertian_rays(800).with_field(
        "intensity", jnp.ones((800,), F64))
    rng = ((-0.5, 0.5), (-4.25, -4.15))
    init, fn = landing_histogram_fold(rng, 32, 8, dtype=F64,
                                      weight_field="intensity")
    res = trace(rays, scene, materials, CFG,
                reaction=fresnel_intensity_reaction(),
                fold_fn=fn, fold_init=init, fold_fields=True)
    fin = np.asarray(res.rays.state) == FINISHED
    p1 = np.asarray(res.rays.p1)
    w = np.asarray(res.rays.fields["intensity"])
    ref = histogram2d(p1[fin, 0], p1[fin, 1], rng, 32, 8, dtype=F64,
                      weights=jnp.asarray(w[fin]))
    np.testing.assert_allclose(np.asarray(res.fold), np.asarray(ref),
                               rtol=1e-12, atol=1e-12)
    # ... and refuses to run without the fields in the record
    with pytest.raises(KeyError, match="fold_fields"):
        trace(rays, scene, materials, CFG,
              reaction=fresnel_intensity_reaction(),
              fold_fn=fn, fold_init=init)


def test_landing_histogram_fold_streamed():
    """Streaming the histogram fold block-by-block sums to the
    single-dispatch image exactly (integer counts; ragged tail)."""
    from tensorflowraytrace_tpu import landing_histogram_fold

    scene, materials = guide_scene()
    rays = lambertian_rays(1000)
    rng = ((-0.5, 0.5), (-4.25, -4.15))
    init, fn = landing_histogram_fold(rng, 16, 4, dtype=F64)
    full = trace(rays, scene, materials, CFG, fold_fn=fn, fold_init=init)
    res = trace_streamed(rays, scene, materials, CFG, fold_fn=fn,
                         fold_init=init, block_size=256)
    np.testing.assert_array_equal(np.asarray(res.fold),
                                  np.asarray(full.fold))


def test_streamed_gradient_matches_single_dispatch():
    """Differentiate a landing loss through the stream (remat_blocks): the
    gradient w.r.t. a target-plane shift equals the single-dispatch one."""
    scene, materials = guide_scene()
    rays = lambertian_rays(400)
    init, fn = landing_loss_fold(F64)

    def loss_stream(dx):
        import dataclasses

        r = dataclasses.replace(rays, p0=rays.p0 + jnp.asarray([dx, 0.0]),
                                p1=rays.p1 + jnp.asarray([dx, 0.0]))
        return trace_streamed(r, scene, materials, CFG, fold_fn=fn,
                              fold_init=init, block_size=128).fold

    def loss_full(dx):
        import dataclasses

        r = dataclasses.replace(rays, p0=rays.p0 + jnp.asarray([dx, 0.0]),
                                p1=rays.p1 + jnp.asarray([dx, 0.0]))
        return trace(r, scene, materials, CFG, fold_fn=fn,
                     fold_init=init).fold

    x = jnp.asarray(0.01, F64)
    gs = jax.grad(loss_stream)(x)
    gf = jax.grad(loss_full)(x)
    assert np.isfinite(float(gs))
    np.testing.assert_allclose(float(gs), float(gf), rtol=1e-10)


@pytest.mark.parametrize("bpd", [1, 3])
def test_streamed_value_and_grad_matches_fused(bpd):
    """Host-accumulated per-dispatch gradients (the watchdog-safe
    differentiable stream) equal jax.value_and_grad of the fused
    sum-over-blocks loss, including a ragged dispatch tail."""
    from tensorflowraytrace_tpu.engine import streamed_value_and_grad

    scene, materials = guide_scene()
    block, n_blocks = 128, 4
    rays = lambertian_rays(block * n_blocks)
    stacked = jax.tree.map(
        lambda a: a.reshape((n_blocks, block) + a.shape[1:]), rays)

    def block_loss(tx, i):
        blk = jax.tree.map(lambda a: a[i], stacked)
        init, fn = landing_sum_fold(
            lambda p1: (p1[:, 0] - tx) ** 2, F64)
        return trace(blk, scene, materials, CFG, fold_fn=fn,
                     fold_init=init).fold

    def fused(tx):
        return sum(block_loss(tx, i) for i in range(n_blocks))

    x = jnp.asarray(0.02, F64)
    v_ref, g_ref = jax.value_and_grad(fused)(x)
    run = streamed_value_and_grad(block_loss, n_blocks,
                                  blocks_per_dispatch=bpd)
    v, g = run(x)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(float(g), float(g_ref), rtol=1e-10)


def test_parallel_streamed_matches_local():
    """8 virtual devices x streaming: sharded streamed fold == local
    streamed fold == plain trace fold; counts global."""
    from tensorflowraytrace_tpu.parallel import sharding as sh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = sh.ray_mesh(8)
    scene, materials = guide_scene()
    rays = lambertian_rays(1024)
    init, fn = landing_loss_fold(F64)

    full = trace(rays, scene, materials, CFG, fold_fn=fn, fold_init=init)
    sharded = sh.shard_rays(rays, mesh)
    res = sh.parallel_trace_streamed(
        sharded, scene, materials, CFG, mesh=mesh, fold_fn=fn,
        fold_init=init, block_size=64)
    np.testing.assert_allclose(float(res.fold), float(full.fold),
                               rtol=1e-12)
    states = np.asarray(full.rays.state)
    expect = [int((states == c).sum()) for c in range(4)]
    np.testing.assert_array_equal(np.asarray(res.state_counts), expect)


@pytest.mark.parametrize("bpd,aux", [(1, False), (2, True)])
def test_parallel_streamed_value_and_grad_matches(bpd, aux):
    """8 devices x differentiated streaming: the block-index space sharded
    over the mesh with one psum per dispatch equals BOTH single-device
    streamed_value_and_grad and jax.value_and_grad of the fused
    sum-over-blocks loss -- including a grid-padded tail (n_blocks=6 does
    not divide 8 x bpd) whose clamped/masked blocks must contribute
    exactly zero value and gradient."""
    from tensorflowraytrace_tpu.engine import streamed_value_and_grad
    from tensorflowraytrace_tpu.parallel.sharding import (
        parallel_streamed_value_and_grad, ray_mesh,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = ray_mesh(8)
    scene, materials = guide_scene()
    block, n_blocks = 64, 6
    rays = lambertian_rays(block * n_blocks)
    stacked = jax.tree.map(
        lambda a: a.reshape((n_blocks, block) + a.shape[1:]), rays)

    def block_loss(tx, i, *extra):
        shift = extra[0] if extra else 0.0
        blk = jax.tree.map(lambda a: a[i], stacked)
        init, fn = landing_sum_fold(
            lambda p1: (p1[:, 0] - tx + shift) ** 2, F64)
        return trace(blk, scene, materials, CFG, fold_fn=fn,
                     fold_init=init).fold

    x = jnp.asarray(0.02, F64)
    extra = (jnp.asarray(0.003, F64),) if aux else ()

    def fused(tx):
        return sum(block_loss(tx, i, *extra) for i in range(n_blocks))

    v_ref, g_ref = jax.value_and_grad(fused)(x)
    v_1dev, g_1dev = streamed_value_and_grad(
        block_loss, n_blocks, blocks_per_dispatch=bpd)(x, *extra)
    run = parallel_streamed_value_and_grad(
        block_loss, n_blocks, mesh=mesh, blocks_per_dispatch=bpd)
    v, g = run(x, *extra)
    np.testing.assert_allclose(float(v), float(v_ref), rtol=1e-12)
    np.testing.assert_allclose(float(g), float(g_ref), rtol=1e-10)
    np.testing.assert_allclose(float(v), float(v_1dev), rtol=1e-12)
    np.testing.assert_allclose(float(g), float(g_1dev), rtol=1e-10)


def test_parallel_streamed_value_and_grad_rejects_zero_blocks():
    from tensorflowraytrace_tpu.parallel.sharding import (
        parallel_streamed_value_and_grad,
    )

    with pytest.raises(ValueError, match="n_blocks must be positive"):
        parallel_streamed_value_and_grad(lambda p, i: p, 0)


def test_parallel_streamed_histogram_with_fields():
    """The rendering composition: 8 devices x streaming x intensity-weighted
    landing image.  The psum'd sharded image equals the local one exactly."""
    from tensorflowraytrace_tpu import landing_histogram_fold
    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction
    from tensorflowraytrace_tpu.parallel import sharding as sh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = sh.ray_mesh(8)
    scene, materials = guide_scene()
    rays = lambertian_rays(1024).with_field(
        "intensity", jnp.ones((1024,), F64))
    rng = ((-0.5, 0.5), (-4.25, -4.15))
    init, fn = landing_histogram_fold(rng, 16, 4, dtype=F64,
                                      weight_field="intensity")
    rx = fresnel_intensity_reaction()

    full = trace(rays, scene, materials, CFG, reaction=rx, fold_fn=fn,
                 fold_init=init, fold_fields=True)
    res = sh.parallel_trace_streamed(
        sh.shard_rays(rays, mesh), scene, materials, CFG, mesh=mesh,
        reaction=rx, fold_fn=fn, fold_init=init, block_size=64,
        fold_fields=True)
    np.testing.assert_allclose(np.asarray(res.fold), np.asarray(full.fold),
                               rtol=1e-12, atol=1e-12)


def test_trace_keep_history_oom_guidance():
    """An absurd keep_history request fails fast with a message pointing at
    folds + trace_streamed instead of a device OOM."""
    scene, materials = guide_scene()
    rays = lambertian_rays(8)
    import dataclasses

    big = dataclasses.replace(
        rays, p0=jnp.broadcast_to(rays.p0[:1], (200_000_000, 2)),
        p1=jnp.broadcast_to(rays.p1[:1], (200_000_000, 2)),
        wavelength=jnp.broadcast_to(rays.wavelength[:1], (200_000_000,)),
        state=jnp.broadcast_to(rays.state[:1], (200_000_000,)),
        fields={})
    with pytest.raises(ValueError, match="trace_streamed"):
        trace(big, scene, materials,
              TraceConfig(max_bounces=50, keep_history=True))


def test_streamed_requires_fold():
    scene, materials = guide_scene()
    rays = lambertian_rays(8)
    with pytest.raises(ValueError, match="fold"):
        trace_streamed(rays, scene, materials, CFG)
