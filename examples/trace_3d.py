"""3D multi-surface trace: point source through a lens mesh + mirror sphere
onto a plane target, drawn with the 3D drawers.

Rebuild of /root/reference/dev/3d_trace.py (STL + pv.Sphere + plane target).

Run:  python examples/trace_3d.py [--show]
"""

import argparse
import math

import jax
import numpy as np

from tensorflowraytrace_tpu import FINISHED, Scene3D, TraceConfig, TriangleSet, trace
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops.spectrum import YELLOW

PI = math.pi


def sphere_mesh(center, radius, n=12):
    """UV-sphere TriMesh (replacing pv.Sphere)."""
    pts = []
    faces = []
    for i in range(1, n):
        phi = PI * i / n
        for j in range(2 * n):
            theta = PI * j / n
            pts.append([radius * math.cos(phi),
                        radius * math.sin(phi) * math.cos(theta),
                        radius * math.sin(phi) * math.sin(theta)])
    top = len(pts)
    pts.append([radius, 0.0, 0.0])
    bot = len(pts)
    pts.append([-radius, 0.0, 0.0])
    ring = 2 * n
    for j in range(ring):
        faces.append([top, j, (j + 1) % ring])
        base = (n - 2) * ring
        faces.append([bot, base + (j + 1) % ring, base + j])
    for i in range(n - 2):
        for j in range(ring):
            a = i * ring + j
            b = i * ring + (j + 1) % ring
            c = (i + 1) * ring + j
            d = (i + 1) * ring + (j + 1) % ring
            faces.append([a, b, c])
            faces.append([b, d, c])
    m = mt.TriMesh(np.asarray(pts) + np.asarray(center), np.asarray(faces))
    return m


def main(show=False):
    # lens: curved parametric disk at x=0
    disk = mt.hexagonal_mesh(1.0, 6)
    pts = disk.points.copy()
    disk.points = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    lens_b = bd.ParametricTriangleBoundary(disk, bd.FromVectorVG((1.0, 0.0, 0.0)),
                                           mat_in=1, mat_out=0)
    r2 = np.linalg.norm(np.asarray(lens_b.zero)[:, 1:], axis=1) ** 2
    lens = lens_b.build(0.3 * (1 - r2))  # convex profile

    # mirror sphere off to the side
    mirror = TriangleSet.from_vertices_faces(
        *(lambda m: (m.points, m.faces))(sphere_mesh((2.0, 0.0, 2.0), 0.5)),
        mat_in=1, mat_out=0)

    half = 20.0
    target = TriangleSet.make(
        [[6.0, -half, -half], [6.0, half, half]],
        [[6.0, half, -half], [6.0, -half, half]],
        [[6.0, half, half], [6.0, -half, -half]])

    scene = Scene3D.build(optical=[lens, mirror], targets=[target])
    materials = (mats.vacuum, mats.acrylic)

    source = src.PointSource(3, (-3.0, 0.0, 0.0), (1.0, 0.0, 0.0),
                             dist.StaticUniformSphere(PI / 24, 200), [YELLOW])
    rays = source.sample(jax.random.PRNGKey(0))

    res = trace(rays, scene, materials,
                TraceConfig(max_bounces=4, keep_history=True))
    states = np.asarray(res.rays.state)
    print("finished:", int((states == FINISHED).sum()), "/", len(states))

    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from tensorflowraytrace_tpu import drawing

    fig = plt.figure(figsize=(10, 8))
    ax = fig.add_subplot(projection="3d")
    drawing.TriangleDrawer(ax, lens, color="cyan", alpha=0.4).draw()
    drawing.TriangleDrawer(ax, mirror, color="silver", alpha=0.4).draw()
    rd = drawing.RayDrawer3D(ax, drawing.history_rays(res))
    rd.draw()
    ax.set_xlim(-3, 6)
    ax.set_ylim(-3, 3)
    ax.set_zlim(-2, 3)
    if show:
        plt.show()
    else:
        fig.savefig("trace_3d.png", dpi=100)
        print("saved trace_3d.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true")
    main(**vars(ap.parse_args()))
