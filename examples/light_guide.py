"""2D TIR light guide: a Lambertian source feeds a tapered acrylic guide;
rays bounce by total internal reflection up to 50 times.

Rebuild of /root/reference/dev/light_guide.py (compile_dead_rays=True,
dead_ray_length=10, 50-bounce trace).

Run:  python examples/light_guide.py [--show]
"""

import argparse
import math

import jax
import numpy as np

from tensorflowraytrace_tpu import DEAD, RaySet, Scene2D, SegmentSet, TraceConfig, trace
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops.spectrum import YELLOW

PI = math.pi


def main(show=False):
    # triangular guide outline (dev/light_guide.py:31-36)
    guide = SegmentSet.make(
        [[-0.1, -4.0], [0.0, 4.0], [0.1, -4.0]],
        [[0.0, 4.0], [0.1, -4.0], [-0.1, -4.0]],
        mat_in=1, mat_out=0)
    scene = Scene2D.build(optical_segments=[guide])

    n = 100
    angles = dist.RandomLambertianAngularDistribution(-0.4 * PI, 0.4 * PI, n)
    beam = dist.RandomUniformBeam(-0.09, 0.09, n)
    source = src.AngularSource(2, (0.0, -4.001), PI / 2, angles, beam,
                               [YELLOW] * n, dense=False)
    rays = source.sample(jax.random.PRNGKey(0))

    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=50, dead_ray_length=10.0, keep_history=True)
    res = trace(rays, scene, materials, cfg)

    states = np.asarray(res.rays.state)
    print(f"{n} rays traced {cfg.max_bounces} bounces: "
          f"{int((states == DEAD).sum())} escaped (dead), "
          f"{int((states == 0).sum())} still bouncing")
    alive_per_bounce = np.asarray(res.history_alive).sum(axis=1)
    print("rays still alive per bounce:", alive_per_bounce.tolist())

    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from tensorflowraytrace_tpu import drawing

    fig, ax = plt.subplots(1, 1, figsize=(6, 9))
    ax.set_aspect("equal")
    ax.set_xlim(-2, 2)
    ax.set_ylim(-5, 5)
    drawing.SegmentDrawer(ax, guide, color="cyan").draw()
    drawing.RayDrawer2D(ax, drawing.history_rays(res)).draw()
    if show:
        plt.show()
    else:
        fig.savefig("light_guide.png", dpi=100)
        print("saved light_guide.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true")
    main(**vars(ap.parse_args()))
