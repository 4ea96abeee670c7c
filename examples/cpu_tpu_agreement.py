"""CPU-vs-TPU trace agreement (BASELINE.md measurement task 3).

Runs identical float32 traces on the CPU backend and the TPU backend in one
process and reports max endpoint deviation + ray-state agreement for
representative configs (2D arc refraction, 3D lens, many-bounce mirror box).

Run on a machine with a TPU attached:  python examples/cpu_tpu_agreement.py
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import RaySet, Scene2D, Scene3D, SegmentSet, TraceConfig, TriangleSet, trace
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.models.surfaces import ArcSet
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi


def run_on(device, fn, *args):
    with jax.default_device(device):
        args = jax.tree.map(lambda a: jax.device_put(a, device), args)
        out = jax.jit(fn)(*args)
        return jax.tree.map(np.asarray, out)


def compare(name, fn, rays, scene, results=None):
    cpu = jax.devices("cpu")[0]
    try:
        tpu = [d for d in jax.devices() if d.platform in ("tpu", "axon")][0]
    except IndexError:
        print("no TPU attached; nothing to compare")
        return
    r_cpu = run_on(cpu, fn, rays, scene)
    r_tpu = run_on(tpu, fn, rays, scene)
    same = r_cpu[1] == r_tpu[1]
    state_agree = same.mean()
    # deviation conditioned on agreeing fate: rays whose f32 rounding flips
    # them across a surface edge/tangent legitimately diverge in position
    dev = np.abs(r_cpu[0] - r_tpu[0])[same]
    p1_dev = dev.max() if dev.size else 0.0
    print(f"{name:32s} state agreement = {100 * state_agree:.3f}% "
          f"({int((~same).sum())} edge rays); "
          f"max|p1_cpu - p1_tpu| (same-fate) = {p1_dev:.3e}")
    if results is not None:
        results[name] = {"state_agreement": float(state_agree),
                         "max_same_fate_dev": float(p1_dev)}


def main():
    results = {}
    f32 = jnp.float32

    # config 1: 2D beam through a refractive arc (optimize_single_arc)
    beam = dist.StaticUniformBeam(-1.5, 1.5, 500)
    angles = dist.StaticUniformAngularDistribution(0.0, 0.0, 1)
    source = src.AngularSource(2, (-1.0, 0.0), 0.0, angles, beam,
                               [680.0, 575.0, 450.0])
    rays2d = source.sample(dtype=f32)
    arc = ArcSet.make([[5.0, 0.0]], 3 * PI / 4, 5 * PI / 4, 5.0, mat_in=1,
                      mat_out=0, dtype=f32)
    target = SegmentSet.make([[10.0, -5.0]], [[10.0, 5.0]], dtype=f32)
    scene2d = Scene2D.build(optical_arcs=[arc], target_segments=[target])
    m2 = (mats.vacuum, mats.acrylic)

    def trace2d(r, s):
        res = trace(r, s, m2, TraceConfig(max_bounces=2))
        return res.rays.p1, res.rays.state

    compare("2D arc refraction (depth 2)", trace2d, rays2d, scene2d, results)

    # config 3: 3D triangle-mesh lens
    zm = mt.hexagonal_mesh(1.2, 6)
    pts = zm.points.copy()
    zm.points = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    from tensorflowraytrace_tpu.models import boundaries as bd

    lens = bd.ParametricMultiTriangleBoundary(
        zm, bd.FromVectorVG((1.0, 0.0, 0.0)),
        [bd.ThicknessConstraint(0.0, "min"), bd.ThicknessConstraint(0.2, "min")],
        [True, False], material_list=[{"mat_in": 1, "mat_out": 0}] * 2,
        dtype=f32)
    surfaces = lens.build(lens.init_params())
    half = 50.0
    t3 = TriangleSet.make(
        [[8.0, -half, -half], [8.0, half, half]],
        [[8.0, half, -half], [8.0, -half, half]],
        [[8.0, half, half], [8.0, -half, -half]], dtype=f32)
    scene3d = Scene3D.build(optical=surfaces, targets=[t3])
    rc = 2025
    src3 = src.AngularSource(
        3, (-4.0, 0.0, 0.0), (1.0, 0.0, 0.0),
        dist.RandomUniformSphere(PI / 16.0, rc),
        dist.RandomUniformSquare(0.2, 45), [575.0] * rc, dense=False)
    rays3d = src3.sample(jax.random.PRNGKey(0), dtype=f32)

    def trace3d(r, s):
        res = trace(r, s, m2, TraceConfig(max_bounces=3))
        return res.rays.p1, res.rays.state

    compare("3D parametric lens (depth 3)", trace3d, rays3d, scene3d, results)

    # config 5 shape: many-bounce TIR guide
    guide = SegmentSet.make(
        [[-0.1, -4.0], [0.0, 4.0], [0.1, -4.0]],
        [[0.0, 4.0], [0.1, -4.0], [-0.1, -4.0]],
        mat_in=1, mat_out=0, dtype=f32)
    sceneg = Scene2D.build(optical_segments=[guide])
    n = 2000
    anglesg = dist.RandomLambertianAngularDistribution(-0.4 * PI, 0.4 * PI, n)
    beamg = dist.RandomUniformBeam(-0.09, 0.09, n)
    srcg = src.AngularSource(2, (0.0, -4.001), PI / 2, anglesg, beamg,
                             [575.0] * n, dense=False)
    raysg = srcg.sample(jax.random.PRNGKey(1), dtype=f32)

    def traceg(r, s):
        res = trace(r, s, m2, TraceConfig(max_bounces=50))
        return res.rays.p1, res.rays.state

    compare("2D TIR guide (depth 50)", traceg, raysg, sceneg, results)
    return results


if __name__ == "__main__":
    import json
    import sys

    res = main()
    if "--json" in sys.argv:
        print("AGREEMENT_JSON " + json.dumps(res))
