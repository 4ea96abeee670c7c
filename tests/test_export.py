"""AOT export tests: serialize a compiled trace, reload it, run it -- the
deployment path the reference (re-tracing TF eager every run) never had."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import RaySet, Scene2D, SegmentSet, TraceConfig, trace
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.utils import export as ex

PI = math.pi
F64 = jnp.float64


def _scene_and_rays(n=16):
    glass = SegmentSet.make([[1.0, -4.0]], [[1.0, 4.0]], mat_in=1, mat_out=0,
                            dtype=F64)
    tgt = SegmentSet.make([[6.0, -8.0]], [[6.0, 8.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[glass], target_segments=[tgt])
    rng = np.random.default_rng(0)
    p0 = np.stack([np.zeros(n), rng.uniform(-2, 2, n)], axis=1)
    p1 = p0 + np.stack([np.ones(n), rng.uniform(-0.3, 0.3, n)], axis=1)
    rays = RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p1, F64), 575.0,
                       dtype=F64)
    return scene, rays


def test_export_trace_round_trip(tmp_path):
    """export_trace -> bytes -> load_fn reproduces the live trace exactly,
    with scene/materials/config baked in as constants."""
    scene, rays = _scene_and_rays()
    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=3)

    blob = ex.export_trace(scene, materials, cfg, rays)
    assert isinstance(blob, bytes) and len(blob) > 0

    live = trace(rays, scene, materials, cfg).rays
    served = ex.load_fn(blob)(rays)
    np.testing.assert_array_equal(np.asarray(live.state),
                                  np.asarray(served.state))
    np.testing.assert_allclose(np.asarray(live.p1), np.asarray(served.p1),
                               rtol=0, atol=0)


def test_export_fn_file_round_trip(tmp_path):
    """save_exported/load_exported: a gradient program (value_and_grad of a
    landing loss) through the file path."""
    scene, rays = _scene_and_rays()
    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=3)

    def loss(shift):
        import dataclasses

        r = dataclasses.replace(rays, p1=rays.p1 + shift)
        res = trace(r, scene, materials, cfg)
        fin = res.rays.state == 1
        return jnp.sum(jnp.where(fin, res.rays.p1[:, 1] ** 2, 0.0))

    vag = jax.value_and_grad(loss)
    path = str(tmp_path / "step.jaxexport")
    ex.save_exported(path, vag, jax.ShapeDtypeStruct((2,), F64))
    f = ex.load_exported(path)

    shift = jnp.asarray([0.0, 0.1], F64)
    l_live, g_live = vag(shift)
    l_srv, g_srv = f(shift)
    np.testing.assert_allclose(float(l_live), float(l_srv), rtol=0)
    np.testing.assert_allclose(np.asarray(g_live), np.asarray(g_srv), rtol=0)


def test_export_shape_mismatch_fails_loudly():
    """The artifact is shape-locked: calling with the wrong ray count raises
    instead of silently recompiling."""
    import pytest

    scene, rays = _scene_and_rays(16)
    blob = ex.export_trace(scene, (mats.vacuum, mats.acrylic),
                           TraceConfig(max_bounces=2), rays)
    _, wrong = _scene_and_rays(8)
    with pytest.raises(Exception):
        ex.load_fn(blob)(wrong)
