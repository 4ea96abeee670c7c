"""Hexalens: a 60-degree wedge lens that forms TWO displaced images.

Rebuild of /root/reference/dev/hexalens.py (the reference's most complete
demo): an AperatureSource carries per-ray imaging goals through the trace as
extra fields (``object_coords`` from the start-point domain and
``aperature_polar_ranks`` from the end-point domain, dev/hexalens.py:56-64);
rays that pass through the inner third of the aperture focus to an inverted
image at the target center, rays through the outer two-thirds to a second
image displaced by ``OUTER_DISPLACEMENT`` (dev/hexalens.py:153-163).

The lens is a wedge-mesh ParametricMultiTriangleBoundary (front + back
surface, thickness constraints, parametrization accumulator), optimized with
the multi-phase chained routine.

Run:  python examples/hexalens.py [--steps N] [--rays N]
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

SOURCE_DISTANCE = 10.0
MAGNIFICATION = 1.0
TARGET_DISTANCE = SOURCE_DISTANCE * MAGNIFICATION
OBJECT_SIZE = 0.2
OUTER_DISPLACEMENT = np.array([0.6, 0.0])
LENS_APERATURE = 1.0
THETA_START, THETA_END = 0.0, PI / 6


def wedge_mesh(radius, step, theta_start, theta_end):
    """Wedge of a disk rotated to face +x (dev/hexalens.py:66-75)."""
    m = mt.circular_mesh(radius, step, theta_start=theta_start,
                         theta_end=theta_end)
    pts = m.points.copy()
    m.points = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    return m


def main(steps=150, ray_count=2000, mesh_step=0.08, chain=True):
    # measured on one v5e: initial error 1558 -> 332 in 150 steps (7.6 s
    # wall, ~51 ms/step chained); the bifocal split at r=1/3 leaves an
    # irreducible error floor (a continuous surface cannot realize the
    # discontinuous ideal).  Momentum above ~0.5 can diverge on this
    # objective -- the sharp floor plus per-step batch resampling.
    # object disk -> lens-aperture wedge (dev/hexalens.py:37-64)
    start_points = dist.RandomUniformCircle(ray_count, OBJECT_SIZE)
    end_points = dist.RandomUniformCircle(
        ray_count, 0.98 * LENS_APERATURE,
        theta_start=THETA_START, theta_end=THETA_END)
    source = src.AperatureSource(
        3,
        dist.BasePointTransformation(
            start_points, translation=(-SOURCE_DISTANCE, 0.0, 0.0),
            lift_to_3d=True),
        dist.BasePointTransformation(end_points, lift_to_3d=True),
        [575.0] * ray_count, dense=False,
        # first-class ranks of the start-point domain ARE the normalized
        # object coords (circle ranks = cartesian points / radius), matching
        # the reference's object_coords extra field (dev/hexalens.py:61)
        rank_domain="start_point",
        extra_fields={
            "aperature_polar_ranks": ("end_point", end_points, "polar_ranks"),
        },
    )

    zero_mesh = wedge_mesh(LENS_APERATURE, mesh_step, THETA_START, THETA_END)
    print(f"lens wedge: {zero_mesh.n_points} vertices x 2 surfaces, "
          f"{zero_mesh.n_faces} faces")
    top = mt.get_closest_point(zero_mesh, (0.0, 0.0, 0.0))
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
    outer_disp = jnp.asarray(OUTER_DISPLACEMENT)

    def loss(params, key):
        scene = Scene3D.build(optical=lens.build(params), targets=[target])
        res = trace(source.sample(key), scene, materials, cfg)
        finished = res.rays.state == FINISHED
        out = res.rays.p1[:, 1:]
        # inner image centered on the axis, outer image displaced
        # (dev/hexalens.py:153-163); rank = normalized object yz coords,
        # scaled by -(magnification * object_size) for an inverted image
        inner_goal = res.rays.fields["rank"] * goal_scale
        is_inner = res.rays.fields["aperature_polar_ranks"][:, 0] < 1.0 / 3.0
        goal = jnp.where(is_inner[:, None], inner_goal,
                         inner_goal + outer_disp)
        return jnp.sum(jnp.where(finished,
                                 jnp.sum((out - goal) ** 2, axis=1), 0.0))

    opt = Optimizer(loss, lens.init_params(), learning_rate=1.0,
                    grad_clip=1e-3, key=jax.random.PRNGKey(0))
    e0 = float(loss(lens.init_params(), jax.random.PRNGKey(123)))
    print(f"initial error: {e0:.2f}")
    t0 = time.time()
    # two-phase accumulated-SGD routine.  NO smoothers here: the bifocal
    # goal needs a sharp surface transition at the r=1/3 aperture ring, and
    # per-step smoothing erases exactly that detail (it fights the optimum;
    # measured: error stalls ~200 with smoothing vs converging without)
    opt.training_routine(
        [
            {"steps": steps // 2, "learning_rate": 1e-4, "momentum": 0.5,
             "accumulators": [accumulator] * 2},
            {"steps": steps - steps // 2, "learning_rate": (5e-5, 1e-5),
             "momentum": 0.5, "accumulators": [accumulator] * 2},
        ],
        # chain=True runs each phase as ONE device dispatch (lax.scan over
        # steps) -- essential through the TPU tunnel; --no-chain avoids the
        # big scan compile for quick CPU smoke runs
        report_frequency=10, chain=chain)
    print(f"optimization wall clock: {time.time() - t0:.1f}s")

    p0, p1 = lens.constrain(opt.parameters)
    export_boundary_stl(lens.surfaces[0], p0, "hexalens_first.stl")
    export_boundary_stl(lens.surfaces[1], p1, "hexalens_second.stl")
    print("saved hexalens_first.stl / hexalens_second.stl")

    # landing pattern: two images should appear
    scene = Scene3D.build(optical=lens.build(opt.parameters), targets=[target])
    res = trace(source.sample(jax.random.PRNGKey(99)), scene, materials, cfg)
    fin = np.asarray(res.rays.state) == FINISHED
    pts = np.asarray(res.rays.p1)[fin][:, 1:]
    print(f"{fin.sum()}/{ray_count} rays reach the target")
    from tensorflowraytrace_tpu.analysis import histogram2d

    h = np.asarray(histogram2d(pts[:, 0], pts[:, 1],
                               ((-0.6, 1.2), (-0.6, 0.6)), x_bins=96,
                               y_bins=64))
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imshow(h, origin="lower", extent=(-0.6, 1.2, -0.6, 0.6))
    plt.savefig("hexalens_image.png", dpi=100)
    print("saved hexalens_image.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--rays", type=int, default=2000)
    ap.add_argument("--mesh-step", type=float, default=0.08)
    ap.add_argument("--no-chain", action="store_true")
    a = ap.parse_args()
    main(steps=a.steps, ray_count=a.rays, mesh_step=a.mesh_step,
         chain=not a.no_chain)
