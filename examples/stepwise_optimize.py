"""Stepwise optimization with checkpoint/resume: the non-interactive
equivalent of /root/reference/dev/stepwise_optimize.py.

The reference steps the single-arc problem one keystroke at a time with a
self-scaling schedule (lr=1.0/momentum=.8 for the first 20 steps, then
lr=.1/momentum=.9 -- dev/stepwise_optimize.py:71-80) so a human can watch
and stop.  Headless environments can't take keystrokes, so the "stop and
look" workflow becomes "checkpoint every N steps and resume": this script
runs the same self-scaling schedule, checkpoints via utils/checkpoint.py,
simulates an interruption by rebuilding the optimizer from scratch, resumes
from the checkpoint, and verifies the trajectory continues exactly.

Run:  python examples/stepwise_optimize.py [--show]
"""

import argparse
import math
import os
import tempfile

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
from tensorflowraytrace_tpu.utils import checkpoint as ckpt

PI = math.pi
CHECKPOINT_EVERY = 10


def build_problem():
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

    return loss, rays0, build_scene, target, materials


def make_optimizer(loss):
    return Optimizer(loss, [jnp.asarray([5.0])], learning_rate=1.0,
                     grad_clip=0.1)


def self_scaling_step(opt, verbose=False):
    """The reference's per-keystroke step (dev/stepwise_optimize.py:71-80):
    lr 1.0 / momentum .8 for the first 20 steps, then lr .1 / momentum .9."""
    if opt.iterations < 20:
        return opt.single_step(None, momentum=0.8, verbose=verbose)
    return opt.single_step(None, lr_scale=0.1, momentum=0.9, verbose=verbose)


def main(show=False):
    loss, rays0, build_scene, target, materials = build_problem()
    path = os.path.join(tempfile.gettempdir(), "stepwise_arc_ckpt")

    # ---- phase 1: step until "interrupted", checkpointing every N ----
    opt = make_optimizer(loss)
    for i in range(25):
        err = self_scaling_step(opt, verbose=(i % 5 == 0))
        if (i + 1) % CHECKPOINT_EVERY == 0:
            saved = ckpt.save_checkpoint(path, opt)
            print(f"checkpointed at step {opt.iterations} -> {saved}")
    interrupted_at = opt.iterations
    # continue to the reference trajectory for comparison
    reference_opt = opt
    for i in range(25):
        ref_err = self_scaling_step(reference_opt)
    ref_param = float(reference_opt.parameters[0][0])

    # ---- phase 2: "crash", rebuild from scratch, resume from checkpoint ----
    opt2 = make_optimizer(loss)
    ckpt.load_checkpoint(path, opt2)
    print(f"resumed at step {opt2.iterations} "
          f"(checkpoint was at {interrupted_at - interrupted_at % CHECKPOINT_EVERY})")
    # replay the steps after the last checkpoint, then the rest
    while opt2.iterations < interrupted_at:
        self_scaling_step(opt2)
    for i in range(25):
        err2 = self_scaling_step(opt2)
    p2 = float(opt2.parameters[0][0])

    print(f"reference trajectory: radius={ref_param:.6f} err={ref_err:.3e}")
    print(f"resumed trajectory:   radius={p2:.6f} err={err2:.3e}")
    drift = abs(p2 - ref_param)
    print(f"post-resume parameter drift: {drift:.2e} "
          f"({'EXACT' if drift == 0 else 'ok' if drift < 1e-9 else 'MISMATCH'})")
    assert drift < 1e-9, "resume diverged from the uninterrupted trajectory"

    # ---- draw the final state ----
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from tensorflowraytrace_tpu import drawing

    res = trace(rays0, build_scene(opt2.parameters[0][0]), materials,
                TraceConfig(max_bounces=2, keep_history=True))
    fig, ax = plt.subplots(1, 1, figsize=(9, 9))
    ax.set_aspect("equal")
    ax.set_xlim(-2, 12)
    ax.set_ylim(-7, 7)
    drawing.SegmentDrawer(ax, target, color="black",
                          draw_norm_arrows=False).draw()
    arc_set = ArcSet.make([[p2, 0.0]], 3 * PI / 4, 5 * PI / 4, p2)
    drawing.ArcDrawer(ax, arc_set, color="cyan").draw()
    drawing.RayDrawer2D(ax, drawing.history_rays(res)).draw()
    if show:
        plt.show()
    else:
        fig.savefig("stepwise_optimize.png", dpi=100)
        print("saved stepwise_optimize.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true")
    main(**vars(ap.parse_args()))
