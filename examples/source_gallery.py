"""Visualization gallery: every distribution family and source type.

Stands in for the reference's ~30 per-feature visual-check scripts
(dev/2d_point_source.py, dev/spherical_dist_visualization.py,
dev/square_lambertian.py, dev/source_uniformity.py, ...).  Renders a PNG
grid; sanity numbers printed per panel.

Run:  python examples/source_gallery.py
"""

import math

import jax
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import goals
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu import drawing

PI = math.pi
KEY = jax.random.PRNGKey(0)


def main():
    fig = plt.figure(figsize=(18, 14))

    panels = []

    def panel_2d(title):
        ax = fig.add_subplot(3, 4, len(panels) + 1)
        ax.set_title(title, fontsize=8)
        ax.set_aspect("equal")
        panels.append(ax)
        return ax

    def panel_3d(title):
        ax = fig.add_subplot(3, 4, len(panels) + 1, projection="3d")
        ax.set_title(title, fontsize=8)
        panels.append(ax)
        return ax

    # distributions -----------------------------------------------------
    ax = panel_2d("StaticUniformCircle (golden spiral)")
    pts, _ = dist.StaticUniformCircle(600).sample(KEY)
    ax.scatter(*np.asarray(pts).T, s=2)

    ax = panel_2d("RandomUniformSquare")
    pts, _ = dist.RandomUniformSquare(1.0, 25).sample(KEY)
    ax.scatter(*np.asarray(pts).T, s=2)

    ax = panel_3d("StaticLambertianSphere cap")
    pts, _ = dist.StaticLambertianSphere(PI / 3, 600).sample(KEY)
    p = np.asarray(pts)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=2)

    ax = panel_3d("SquareRankLambertianSphere")
    pts, ranks = goals.SquareRankLambertianSphere(600).sample(KEY)
    p = np.asarray(pts)
    ax.scatter(p[:, 0], p[:, 1], p[:, 2], s=2, c=np.asarray(ranks)[:, 0])

    ax = panel_2d("ArbitraryDistribution (ring)")
    d = goals.ArbitraryDistribution(
        lambda x, y: np.exp(-((np.hypot(x, y) - 0.6) ** 2) / 0.01) + 1e-6,
        ((-1, 1, 96), (-1, 1, 96)))
    rng = np.random.default_rng(0)
    xo, yo = d(rng.uniform(-1, 1, 3000), rng.uniform(-1, 1, 3000))
    ax.scatter(xo, yo, s=1)

    ax = panel_2d("Beam + Lambertian angles (rank colored)")
    beam = dist.StaticUniformBeam(-1.0, 1.0, 30)
    pts, ranks = beam.sample(KEY)
    ax.scatter(*np.asarray(pts).T, s=6, c=np.asarray(ranks))

    # sources -----------------------------------------------------------
    ax = panel_2d("2D PointSource fan")
    s = src.PointSource(2, (0.0, 0.0), PI / 2,
                        dist.StaticUniformAngularDistribution(-0.6, 0.6, 30),
                        [500.0])
    rays = s.sample(KEY)
    drawing.RayDrawer2D(ax, rays).draw()
    ax.set_xlim(-1, 1)
    ax.set_ylim(-0.2, 1.2)

    ax = panel_2d("2D AngularSource (beam x angles)")
    s = src.AngularSource(2, (0.0, 0.0), 0.0,
                          dist.StaticUniformAngularDistribution(-0.3, 0.3, 5),
                          dist.StaticUniformBeam(-0.5, 0.5, 7),
                          [680.0, 510.0, 400.0])
    rays = s.sample(KEY)
    print("AngularSource dense product rays:", rays.n_rays)
    drawing.RayDrawer2D(ax, rays).draw()
    ax.set_xlim(-0.2, 1.4)
    ax.set_ylim(-1, 1)

    ax = panel_3d("3D PointSource (sphere cap, aimed +z)")
    s = src.PointSource(3, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                        dist.StaticUniformSphere(PI / 8, 80), [575.0])
    rays = s.sample(KEY)
    drawing.RayDrawer3D(ax, rays).draw()
    ax.set_xlim(-1, 1); ax.set_ylim(-1, 1); ax.set_zlim(0, 1)

    ax = panel_2d("AperatureSource")
    s = src.AperatureSource(
        2, dist.StaticUniformAperaturePoints((0.0, -1.0), (0.0, 1.0), 12),
        dist.StaticUniformAperaturePoints((1.0, -0.4), (1.0, 0.4), 12),
        [575.0] * 12, dense=False)
    drawing.RayDrawer2D(ax, s.sample(KEY)).draw()
    ax.set_xlim(-0.2, 1.2); ax.set_ylim(-1.2, 1.2)

    ax = panel_2d("source_uniformity: circle radial histogram")
    pts, _ = dist.StaticUniformCircle(20000).sample(KEY)
    r = np.linalg.norm(np.asarray(pts), axis=1)
    h, edges = np.histogram(r, bins=30, range=(0, 1))
    density = h / (PI * (edges[1:] ** 2 - edges[:-1] ** 2))
    ax.bar(edges[:-1], density / density.mean(), width=np.diff(edges))
    ax.set_aspect("auto")
    print("circle density uniformity (std/mean):",
          float(np.std(density) / np.mean(density)))

    ax = panel_2d("rotation/roll test (quaternion aiming)")
    s = src.PointSource(3, (0.0, 0.0, 0.0), (1.0, 1.0, 0.0),
                        dist.StaticUniformSphere(PI / 10, 60), [575.0])
    rays = s.sample(KEY)
    d3 = np.asarray(rays.p1 - rays.p0)
    ax.scatter(d3[:, 1], d3[:, 2], s=4)
    mean_dir = d3.mean(axis=0)
    mean_dir /= np.linalg.norm(mean_dir)
    print("aimed mean direction:", np.round(mean_dir, 3))

    fig.tight_layout()
    fig.savefig("source_gallery.png", dpi=90)
    print("saved source_gallery.png")


if __name__ == "__main__":
    main()
