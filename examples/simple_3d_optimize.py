"""3D lens design: shape both surfaces of an acrylic lens to image a square
source onto a target at 2x magnification.

Rebuild of /root/reference/dev/simple_3d_optimize.py at the same scale
(45 x 45 = 2025 rays/step, a few-thousand-vertex disk mesh, trace depth 3,
multi-phase training with accumulator + smoother).  Runs headless; saves the
optimized surfaces to STL and a landing-pattern histogram image.

Run:  python examples/simple_3d_optimize.py [--steps N] [--bp-count N]
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import FINISHED, Scene3D, TraceConfig, TriangleSet, trace
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.optim import Optimizer
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.utils.checkpoint import export_boundary_stl

PI = math.pi

SOURCE_DISTANCE = 4.0
MAGNIFICATION = 2.0
TARGET_DISTANCE = SOURCE_DISTANCE * MAGNIFICATION
OBJECT_SIZE = 0.2


def yz_disk_mesh(radius, steps):
    m = mt.hexagonal_mesh(radius, steps)
    pts = m.points.copy()
    m.points = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    return m


def main(steps=150, bp_count=45, mesh_steps=8):
    ray_count = bp_count ** 2
    base_points = dist.RandomUniformSquare(OBJECT_SIZE, bp_count)
    angles = dist.RandomUniformSphere(PI / 16.0, ray_count)
    source = src.AngularSource(
        3, (-SOURCE_DISTANCE, 0.0, 0.0), (1.0, 0.0, 0.0), angles, base_points,
        [575.0] * ray_count, dense=False)

    zero_mesh = yz_disk_mesh(1.2, mesh_steps)
    print(f"lens mesh: {zero_mesh.n_points} vertices, {zero_mesh.n_faces} faces")
    top = mt.get_closest_point(zero_mesh, (0, 0, 0))
    vum, accumulator = mt.mesh_parametrization_tools(zero_mesh, top)
    smoother = mt.mesh_smoothing_tool(zero_mesh, [300, 50, 20, 10, 5])

    lens = bd.ParametricMultiTriangleBoundary(
        zero_mesh, bd.FromVectorVG((1.0, 0.0, 0.0)),
        [bd.ThicknessConstraint(0.0, "min"), bd.ThicknessConstraint(0.2, "min")],
        [True, False], vertex_update_map=vum,
        material_list=[{"mat_in": 1, "mat_out": 0}] * 2)

    half = 50.0
    target = TriangleSet.make(
        [[TARGET_DISTANCE, -half, -half], [TARGET_DISTANCE, half, half]],
        [[TARGET_DISTANCE, half, -half], [TARGET_DISTANCE, -half, half]],
        [[TARGET_DISTANCE, half, half], [TARGET_DISTANCE, -half, -half]])

    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=3)
    goal_scale = -(MAGNIFICATION * OBJECT_SIZE)

    def loss(params, key):
        scene = Scene3D.build(optical=lens.build(params), targets=[target])
        rays = source.sample(key)
        res = trace(rays, scene, materials, cfg)
        finished = res.rays.state == FINISHED
        out = res.rays.p1[:, 1:]
        goal = res.rays.fields["rank"] * goal_scale
        return jnp.sum(jnp.where(finished, jnp.sum((out - goal) ** 2, axis=1),
                                 0.0))

    opt = Optimizer(loss, lens.init_params(), learning_rate=1.0, grad_clip=1e-3,
                    key=jax.random.PRNGKey(0))
    t0 = time.time()
    opt.training_routine(
        [
            {"steps": steps // 2, "learning_rate": 2e-4, "momentum": 0.8,
             "accumulators": [accumulator] * 2, "smoothers": [smoother] * 2},
            {"steps": steps // 3, "learning_rate": (1e-4, 5e-5), "momentum": 0.9,
             "accumulators": [accumulator] * 2, "smoothers": [smoother] * 2},
            {"steps": steps - steps // 2 - steps // 3,
             "learning_rate": (5e-5, 2e-5), "momentum": 0.95,
             "accumulators": [accumulator] * 2},
        ],
        report_frequency=10,
        # one device dispatch per phase: essential through the TPU tunnel
        chain=True,
    )
    print(f"optimization wall clock: {time.time() - t0:.1f}s "
          f"({(time.time() - t0) / max(steps, 1):.3f} s/step)")

    p0, p1 = lens.constrain(opt.parameters)
    export_boundary_stl(lens.surfaces[0], p0, "optimized_first.stl")
    export_boundary_stl(lens.surfaces[1], p1, "optimized_second.stl")
    print("saved optimized_first.stl / optimized_second.stl")

    # imaging-quality evaluation (dev/image_quality_3d.py style)
    from tensorflowraytrace_tpu.analysis import imaging_test

    key_holder = {"key": jax.random.PRNGKey(42)}

    def get_samples():
        key_holder["key"], sub = jax.random.split(key_holder["key"])
        scene = Scene3D.build(optical=lens.build(opt.parameters),
                              targets=[target])
        res = trace(source.sample(sub), scene, materials, cfg)
        fin = np.asarray(res.rays.state) == FINISHED
        return np.asarray(res.rays.p1)[fin][:, 1:]

    h, *_ = imaging_test(get_samples, ((-1, 1), (-1, 1)), batch_count=5,
                         bins=64, verbose=False)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imshow(h.T, origin="lower", extent=(-1, 1, -1, 1))
    plt.savefig("simple_3d_optimize_image.png", dpi=100)
    print("saved simple_3d_optimize_image.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--bp-count", type=int, default=45)
    ap.add_argument("--mesh-steps", type=int, default=8)
    a = ap.parse_args()
    main(steps=a.steps, bp_count=a.bp_count, mesh_steps=a.mesh_steps)
