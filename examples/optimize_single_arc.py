"""2D minimal end-to-end: focus a beam with one trainable refractive arc.

Rebuild of /root/reference/dev/optimize_single_arc.py: a uniform beam passes
through a single circular-arc surface (x_center == radius == the one trained
parameter, so the arc's left rim stays at the origin) into acrylic, and the
loss is the squared landing height on a target plane at x=10.

Run:  python examples/optimize_single_arc.py [--show]
"""

import argparse
import math

import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, ArcSet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.optim import Optimizer
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops.spectrum import RAINBOW_6

PI = math.pi


def main(show=False):
    beam = dist.StaticUniformBeam(-1.5, 1.5, 10)
    angles = dist.StaticUniformAngularDistribution(0.0, 0.0, 1)
    source = src.AngularSource(2, (-1.0, 0.0), 0.0, angles, beam, RAINBOW_6)
    rays0 = source.sample()
    target = SegmentSet.make([[10.0, -5.0]], [[10.0, 5.0]])
    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=2)

    def build_scene(p):
        arc = ArcSet.make(
            jnp.stack([jnp.stack([p, jnp.zeros_like(p)])]),
            3 * PI / 4, 5 * PI / 4, p, mat_in=1, mat_out=0)
        return Scene2D.build(optical_arcs=[arc], target_segments=[target])

    def loss(params, key):
        res = trace(rays0, build_scene(params[0][0]), materials, cfg)
        finished = res.rays.state == FINISHED
        return jnp.sum(jnp.where(finished, res.rays.p1[:, 1] ** 2, 0.0))

    opt = Optimizer(loss, [jnp.asarray([5.0])], learning_rate=1.0, grad_clip=0.1)
    for i in range(30):
        e = opt.single_step(None, momentum=0.8, verbose=(i % 10 == 0))
    for i in range(50):
        e = opt.single_step(None, lr_scale=0.1, momentum=0.9,
                            verbose=(i % 10 == 0))
    p = float(opt.parameters[0][0])
    print(f"final arc radius: {p:.4f}, final error: {e:.3e}")

    # draw the result
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from tensorflowraytrace_tpu import drawing

    res = trace(rays0, build_scene(opt.parameters[0][0]), materials,
                TraceConfig(max_bounces=2, keep_history=True))
    fig, ax = plt.subplots(1, 1, figsize=(9, 9))
    ax.set_aspect("equal")
    ax.set_xlim(-2, 12)
    ax.set_ylim(-7, 7)
    drawing.SegmentDrawer(ax, target, color="black",
                          draw_norm_arrows=False).draw()
    arc_set = ArcSet.make([[p, 0.0]], 3 * PI / 4, 5 * PI / 4, p)
    drawing.ArcDrawer(ax, arc_set, color="cyan").draw()
    rd = drawing.RayDrawer2D(ax, drawing.history_rays(res))
    rd.draw()
    if show:
        plt.show()
    else:
        fig.savefig("optimize_single_arc.png", dpi=100)
        print("saved optimize_single_arc.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true")
    main(**vars(ap.parse_args()))
