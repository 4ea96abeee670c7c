"""Batched design-space exploration: a POPULATION of lens candidates traced
and optimized in one device program via ``jax.vmap``.

The reference cannot express this: its scenes are stateful object graphs
(one `tf.Variable` per surface), so evaluating K design candidates means K
sequential update()+trace passes.  Here a scene is a pure function of its
parameter vector, so ``vmap(loss)`` turns the whole multi-bounce trace into
a batched program -- XLA lays the candidate axis out alongside the ray axis
and the TPU sweeps the entire design space in parallel.  The same transform
composes with ``jax.grad`` for population-based gradient descent, and with
the ray-axis sharding for multi-chip sweeps.

Workflow (the classic lens-design loop, batched):
  1. coarse sweep: vmap(loss) over a radius grid  -> loss landscape
  2. refine: vmap(grad(loss)) gradient-descends the TOP-K candidates
     simultaneously (K independent optimizations, ONE jitted step)
  3. report the best design

Run:  python examples/design_sweep.py [--population N] [--steps N]
"""

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    ArcSet, FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi


def build_problem(n_rays=128, dtype=jnp.float32):
    """The optimize_single_arc problem (dev/optimize_single_arc.py): a beam
    through one trainable arc (x_center == radius), focused on a target."""
    ys = np.linspace(-1.2, 1.2, n_rays)
    p0 = np.stack([np.full(n_rays, -1.0), ys], 1)
    rays = RaySet.make(jnp.asarray(p0, dtype),
                       jnp.asarray(p0 + [1.0, 0.0], dtype), 550.0, dtype=dtype)
    target = SegmentSet.make([[10.0, -5.0]], [[10.0, 5.0]], dtype=dtype)
    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=2)

    def loss(radius):
        center = jnp.stack([jnp.stack([radius, jnp.zeros_like(radius)])])
        arc = ArcSet.make(center, 0.75 * PI, 1.25 * PI, radius,
                          mat_in=1, mat_out=0, dtype=dtype)
        scene = Scene2D.build(optical_arcs=[arc], target_segments=[target])
        res = trace(rays, scene, materials, cfg)
        hit = res.rays.state == FINISHED
        # focus: squared height at the target plane; miss penalty keeps the
        # landscape informative where rays stop hitting the target
        err = jnp.sum(jnp.where(hit, res.rays.p1[:, 1] ** 2, 1.0))
        return err / n_rays

    return loss


def main(population=64, steps=60, top_k=8):
    loss = build_problem()

    # ---- 1. coarse sweep over the whole population in ONE program ----
    radii = jnp.linspace(2.0, 12.0, population)
    losses = jax.jit(jax.vmap(loss))(radii)
    order = jnp.argsort(losses)
    print(f"swept {population} candidates in one vmapped trace; "
          f"best coarse: r={float(radii[order[0]]):.3f} "
          f"loss={float(losses[order[0]]):.5f}")

    # ---- 2. batched gradient refinement of the top-K ----
    params = radii[order[:top_k]]
    velocity = jnp.zeros_like(params)

    @jax.jit
    def step(params, velocity):
        g = jax.vmap(jax.grad(loss))(params)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        g = jnp.clip(g, -0.1, 0.1)
        velocity = 0.8 * velocity + g
        return params - (g + 0.8 * velocity), velocity

    for i in range(steps):
        params, velocity = step(params, velocity)
    # evaluate the refined population PLUS the unrefined coarse best: the
    # momentum loop keeps its last iterate, which can sit mid-oscillation
    # above where it started, so the coarse best is kept as a floor
    pool = jnp.concatenate([params, radii[order[:1]]])
    final = jax.jit(jax.vmap(loss))(pool)
    best = int(jnp.argmin(final))
    print(f"refined top-{top_k} for {steps} batched steps: "
          f"best r={float(pool[best]):.4f} loss={float(final[best]):.6f}")
    assert float(final[best]) <= float(losses[order[0]]) + 1e-9
    return float(pool[best]), float(final[best])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--population", type=int, default=64)
    ap.add_argument("--steps", type=int, default=60)
    a = ap.parse_args()
    main(a.population, a.steps)
