"""BASELINE config 4 flavor: wedge-mesh parametric lens (hexalens/PCF style)
with extra-field rank plumbing through an AperatureSource
(dev/hexalens.py:53-80)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import FINISHED, Scene3D, TraceConfig, TriangleSet, trace
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
F64 = jnp.float64


def test_wedge_mesh_lens_with_extra_field_ranks():
    # 60-degree wedge of a disk, rotated to face +x (dev/hexalens.py:66-73)
    wedge = mt.circular_mesh(1.0, 0.25, theta_start=-PI / 6, theta_end=PI / 6)
    pts = wedge.points.copy()
    wedge.points = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    assert wedge.n_faces > 10

    lens = bd.ParametricTriangleBoundary(
        wedge, bd.FromVectorVG((1.0, 0.0, 0.0)), mat_in=1, mat_out=0,
        initial_parameters=0.1, dtype=F64)

    half = 30.0
    target = TriangleSet.make(
        [[5.0, -half, -half], [5.0, half, half]],
        [[5.0, half, -half], [5.0, -half, half]],
        [[5.0, half, half], [5.0, -half, -half]], dtype=F64)

    # aperture source spanning the wedge, rank plumbed via extra_fields
    n = 40
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(0.05, 0.8, n))
    th = rng.uniform(-PI / 7, PI / 7, n)
    yz = np.stack([r * np.cos(th), r * np.sin(th)], axis=1)
    start = dist.ManualBasePointDistribution(2, points=yz * 0.98)
    end = dist.ManualBasePointDistribution(2, points=yz)
    custom_rank = np.linspace(0.0, 1.0, n)
    source = src.AperatureSource(
        3,
        dist.BasePointTransformation(start, translation=(-1.0, 0.0, 0.0),
                                     lift_to_3d=True),
        dist.BasePointTransformation(end, translation=(-0.5, 0.0, 0.0),
                                     lift_to_3d=True),
        [575.0] * n, dense=False, rank_domain="start_point",
        extra_fields={"my_rank": ("start_point", custom_rank)},
    )
    rays = source.sample(jax.random.PRNGKey(0), dtype=F64)
    assert rays.n_rays == n
    np.testing.assert_allclose(np.asarray(rays.fields["my_rank"]), custom_rank)

    scene = Scene3D.build(optical=[lens.build(lens.init_params())],
                          targets=[target])
    res = trace(rays, scene, (mats.vacuum, mats.acrylic),
                TraceConfig(max_bounces=2))
    states = np.asarray(res.rays.state)
    assert (states == FINISHED).sum() > n // 2
    # extra field rode the slots to the finished rays
    fin = res.rays.finished
    assert "my_rank" in fin.fields
