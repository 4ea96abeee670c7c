"""BASELINE.json config 2: 2D angular + aperture sources, a multi-segment
parametric lens with chromatic dispersion, multi-bounce trace, end-to-end
optimization."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import FINISHED, Scene2D, SegmentSet, TraceConfig, concat_rays, trace
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.optim import Optimizer
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops.spectrum import RAINBOW_6

PI = math.pi
F64 = jnp.float64


def test_multisegment_lens_with_dispersion_optimizes():
    # biconvex-capable lens: two segment surfaces sharing vertical base points
    zero = dist.StaticUniformAperaturePoints((0.0, -1.2), (0.0, 1.2), 21)
    one = dist.StaticUniformAperaturePoints((1.0, -1.2), (1.0, 1.2), 21)
    lens = bd.ParametricMultiSegmentBoundary(
        zero, one,
        [bd.ThicknessConstraint(0.0, "min"), bd.ThicknessConstraint(0.15, "min")],
        flip_norm=[True, False],
        material_list=[{"mat_in": 1, "mat_out": 0}] * 2,
        dtype=F64,
    )
    target = SegmentSet.make([[6.0, -50.0]], [[6.0, 50.0]], dtype=F64)

    # multi-source: an angular beam + an aperture source, amalgamated
    beam = dist.StaticUniformBeam(-1.0, 1.0, 10)
    angles = dist.StaticUniformAngularDistribution(0.0, 0.0, 1)
    s1 = src.AngularSource(2, (-2.0, 0.0), 0.0, angles, beam, RAINBOW_6)
    ap_start = dist.StaticUniformAperaturePoints((-2.0, -0.8), (-2.0, 0.8), 8)
    ap_end = dist.StaticUniformAperaturePoints((-1.0, -0.8), (-1.0, 0.8), 8)
    s2 = src.AperatureSource(2, ap_start, ap_end, [575.0] * 8, dense=False)
    rays0 = concat_rays([s1.sample(dtype=F64), s2.sample(dtype=F64)])
    assert rays0.n_rays == 60 + 8

    materials = (mats.vacuum, mats.flint_glass)
    cfg = TraceConfig(max_bounces=4)

    def loss(params, key):
        surfaces = lens.build(params)
        scene = Scene2D.build(optical_segments=surfaces,
                              target_segments=[target])
        res = trace(rays0, scene, materials, cfg)
        fin = res.rays.state == FINISHED
        return jnp.sum(jnp.where(fin, res.rays.p1[:, 1] ** 2, 0.0))

    opt = Optimizer(loss, lens.init_params(), learning_rate=1.0, grad_clip=5e-3)
    e0 = opt.single_step(None, lr_scale=2e-3, momentum=0.8)
    errors = opt.run_phase(60, None, lr_scale=2e-3, momentum=0.8)
    assert errors[-1] < 0.5 * e0, (e0, errors[-1])

    # dispersion present: different wavelengths land at different heights
    res = trace(rays0, Scene2D.build(optical_segments=lens.build(opt.parameters),
                                     target_segments=[target]),
                materials, cfg)
    fin = np.asarray(res.rays.state) == FINISHED
    wl = np.asarray(res.rays.wavelength)[fin]
    y = np.asarray(res.rays.p1[:, 1])[fin]
    # pick the on-axis-ish beam rays of extreme wavelengths and compare spread
    reds = y[wl == 680.0]
    blues = y[wl == 400.0]
    assert reds.size and blues.size
    assert not np.allclose(np.sort(reds)[: len(blues)], np.sort(blues)[: len(reds)],
                           atol=1e-9)

    # the thickness constraint held
    p0, p1 = lens.constrain(opt.parameters)
    assert float(jnp.min(p1 - p0)) >= 0.15 - 1e-9
