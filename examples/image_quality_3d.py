"""Image-quality evaluation of a finished lens: trace many ray batches
through saved STL surfaces and histogram where they land.

Rebuild of /root/reference/dev/image_quality_3d.py (:39-47): the reference
loads two ManualTriangleBoundary STL surfaces into an OpticalSystem3D, then
feeds batched traces into analyze.imaging_test to build the landing-spot
histogram.  Here the surfaces are the hexalens wedge exported by
examples/hexalens.py (hexalens_first.stl / hexalens_second.stl at the repo
root); the imaging problem matches that script.

Run:  python examples/image_quality_3d.py [--batches N] [--rays N] [--show]
"""

import argparse
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import FINISHED, Scene3D, TraceConfig, TriangleSet, trace
from tensorflowraytrace_tpu.analysis import imaging_test
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.models.boundaries import manual_triangle_boundary
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SOURCE_DISTANCE = 10.0
OBJECT_SIZE = 0.2
LENS_APERATURE = 1.0
THETA_START, THETA_END = 0.0, PI / 6


def main(batches=20, rays=4000, show=False, first_stl=None, second_stl=None):
    # finished lens surfaces, as the reference loads its hexalens STLs;
    # default to the exports of examples/hexalens.py at the repo root
    first = manual_triangle_boundary(
        file_name=first_stl or os.path.join(REPO, "hexalens_first.stl"),
        mat_in=1, mat_out=0)
    second = manual_triangle_boundary(
        file_name=second_stl or os.path.join(REPO, "hexalens_second.stl"),
        mat_in=1, mat_out=0)
    half = 50.0
    td = SOURCE_DISTANCE
    target = TriangleSet.make(
        [[td, -half, -half], [td, half, half]],
        [[td, half, -half], [td, -half, half]],
        [[td, half, half], [td, -half, -half]])
    scene = Scene3D.build(optical=[first, second], targets=[target])
    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig.recommended(scene, max_bounces=3)

    start_points = dist.RandomUniformCircle(rays, OBJECT_SIZE)
    end_points = dist.RandomUniformCircle(
        rays, 0.98 * LENS_APERATURE,
        theta_start=THETA_START, theta_end=THETA_END)
    source = src.AperatureSource(
        3,
        dist.BasePointTransformation(
            start_points, translation=(-SOURCE_DISTANCE, 0.0, 0.0),
            lift_to_3d=True),
        dist.BasePointTransformation(end_points, lift_to_3d=True),
        [575.0] * rays, dense=False)

    key_holder = {"key": jax.random.PRNGKey(7)}

    @jax.jit
    def trace_batch(rays_in):
        res = trace(rays_in, scene, materials, cfg)
        fin = res.rays.state == FINISHED
        return res.rays.p1[:, 1:], fin

    def get_samples():
        key_holder["key"], sub = jax.random.split(key_holder["key"])
        p, fin = trace_batch(source.sample(sub))
        return np.asarray(p)[np.asarray(fin)]

    extent = 1.2
    h, xedges, yedges, _ = imaging_test(
        get_samples, [[-extent, extent], [-extent, extent]],
        batch_count=batches, bins=96, verbose=False)

    # report: the hexalens forms two images -- a central one and one
    # displaced by ~0.6 in +y; check both peaks carry real flux
    total = h.sum()
    centers = 0.5 * (np.asarray(xedges)[:-1] + np.asarray(xedges)[1:])
    near_center = h[np.abs(centers) < 0.25][:, np.abs(centers) < 0.25].sum()
    near_outer = h[np.abs(centers - 0.6) < 0.25][:, np.abs(centers) < 0.25].sum()
    print(f"total landed rays: {int(total)}")
    print(f"flux within 0.25 of the central image: {100 * near_center / total:.1f}%")
    print(f"flux within 0.25 of the displaced image: {100 * near_outer / total:.1f}%")

    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(9, 9))
    ax.set_aspect("equal")
    ax.imshow(h.T, origin="lower", extent=(-extent, extent, -extent, extent))
    ax.set_title("hexalens landing-spot histogram (image quality)")
    if show:
        plt.show()
    else:
        fig.savefig("image_quality_3d.png", dpi=100)
        print("saved image_quality_3d.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--rays", type=int, default=4000)
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--first-stl", default=None)
    ap.add_argument("--second-stl", default=None)
    a = ap.parse_args()
    main(batches=a.batches, rays=a.rays, show=a.show,
         first_stl=a.first_stl, second_stl=a.second_stl)
