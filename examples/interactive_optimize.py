"""Keystroke-driven live optimization: the reference's interactive loop.

The reference's flagship workflow steps the optimizer one keypress at a
time on a live plot (/root/reference/dev/stepwise_optimize.py:71-80 and
dev/simple_3d_optimize.py:326-331: draw -> keypress -> step -> redraw) so a
human watches the lens form and stops when satisfied.  This is its driver
for the matplotlib backend (any interactive backend works; pyvista users
get the same via drawing.Pv* live plotters):

  space / enter  one optimization step (the reference's self-scaling
                 schedule: lr 1.0 / momentum .8 first 20 steps, then
                 lr .1 / momentum .9)
  b              burst of 10 steps
  s              save a checkpoint (resume later via
                 examples/stepwise_optimize.py's exact-resume path)
  q / escape     quit

Headless environments can't take keypresses, so ``main(simulate=...)``
drives the SAME event handler with synthetic matplotlib KeyEvents -- that
is what CI runs; with a display, run this file directly and press keys.

Run:  python examples/interactive_optimize.py
"""

import argparse
import math
import os

import matplotlib

if not os.environ.get("DISPLAY") and os.name != "nt":
    matplotlib.use("Agg")  # headless: synthetic-event mode only

import matplotlib.pyplot as plt
import numpy as np

from tensorflowraytrace_tpu import FINISHED, TraceConfig, trace
from tensorflowraytrace_tpu import drawing
from tensorflowraytrace_tpu.utils import checkpoint as ckpt

PI = math.pi


class InteractiveLoop:
    """Holds the live figure + optimizer and maps key events to steps
    (drawing.disable_figure_key_commands clears mpl's own bindings first,
    reference drawing.py:1027-1034)."""

    def __init__(self, verbose=True):
        # reuse stepwise_optimize's exact problem/schedule (examples/ is
        # not a package; load the sibling file directly)
        import importlib.util

        here = os.path.dirname(os.path.abspath(__file__))
        spec = importlib.util.spec_from_file_location(
            "stepwise_optimize_mod", os.path.join(here,
                                                  "stepwise_optimize.py"))
        sw = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(sw)
        build_problem = sw.build_problem
        make_optimizer = sw.make_optimizer
        self_scaling_step = sw.self_scaling_step

        (self.loss, self.rays0, self.build_scene, self.target,
         self.materials) = build_problem()
        self.opt = make_optimizer(self.loss)
        self._step_fn = self_scaling_step
        self.verbose = verbose
        self.losses = []

        self.fig, (self.ax, self.ax_loss) = plt.subplots(
            1, 2, figsize=(10, 4.5), width_ratios=[3, 2])
        drawing.disable_figure_key_commands()
        self.fig.canvas.mpl_connect("key_press_event", self.on_key)
        self.redraw()

    # ---- event handling ----------------------------------------------
    def on_key(self, event):
        if event.key in (" ", "enter"):
            self.step()
        elif event.key == "b":
            for _ in range(10):
                self.step(redraw=False)
            self.redraw()
        elif event.key == "s":
            path = f"interactive_ckpt_{self.opt.iterations:04d}.npz"
            ckpt.save_checkpoint(path, self.opt)
            print(f"saved {path} (resume: see examples/stepwise_optimize.py)")
        elif event.key in ("q", "escape"):
            plt.close(self.fig)

    def step(self, redraw=True):
        err = self._step_fn(self.opt, verbose=self.verbose)
        self.losses.append(float(err))
        if redraw:
            self.redraw()

    # ---- drawing ------------------------------------------------------
    def redraw(self):
        p = float(self.opt.parameters[0][0])
        scene = self.build_scene(self.opt.parameters[0][0])
        res = trace(self.rays0, scene, self.materials,
                    TraceConfig(max_bounces=2, keep_history=True))
        self.ax.clear()
        drawing.SegmentDrawer(self.ax, self.target, color="black",
                              draw_norm_arrows=False).draw()
        drawing.ArcDrawer(self.ax, scene.arcs, color="cyan").draw()
        drawing.RayDrawer2D(self.ax, drawing.history_rays(res)).draw()
        n_fin = int(np.sum(np.asarray(res.rays.state) == FINISHED))
        self.ax.set_title(
            f"step {self.opt.iterations}  radius {p:.3f}  "
            f"{n_fin}/{self.rays0.n_rays} land  "
            "(space: step, b: x10, s: save, q: quit)", fontsize=9)
        self.ax.set_xlim(-2, 11)
        self.ax.set_ylim(-6, 6)
        self.ax_loss.clear()
        if self.losses:
            self.ax_loss.semilogy(self.losses)
        self.ax_loss.set_xlabel("step")
        self.ax_loss.set_ylabel("loss")
        drawing.redraw_current_figure()

    def simulate_key(self, key):
        """Drive the handler with a synthetic event (headless CI path)."""
        from matplotlib.backend_bases import KeyEvent

        self.on_key(KeyEvent("key_press_event", self.fig.canvas, key))


def main(simulate=None, verbose=True):
    loop = InteractiveLoop(verbose=verbose)
    if simulate is not None:
        for key in simulate:
            loop.simulate_key(key)
        assert loop.losses and loop.losses[-1] < loop.losses[0], (
            "simulated keystroke steps should reduce the loss")
        print(f"simulated keys {simulate!r}: loss "
              f"{loop.losses[0]:.4f} -> {loop.losses[-1]:.4f} over "
              f"{loop.opt.iterations} steps")
        print("OK")
        return loop
    print(__doc__.split("Run:")[0])
    plt.show()  # blocks; the key bindings drive everything from here
    return loop


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--simulate", type=str, default=None,
                    help="drive N synthetic keys headlessly, e.g. ' b s'")
    a = ap.parse_args()
    main(simulate=list(a.simulate) if a.simulate else None)
