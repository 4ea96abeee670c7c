"""Mega-batch gradient training: 8M+ rays PER STEP through streaming.

`examples/sharded_light_guide.py` scales the per-step ray count across
chips; this example scales it past a single chip's limits by streaming:
the step loss is a sum over ray super-blocks, so its gradient is the sum
of per-block gradients (`streamed_value_and_grad`), and each device
program stays bounded -- under both the HBM ceiling AND the TPU
runtime's execution watchdog that kills long fused fwd+bwd streams
(docs/notes.md: a ~90 s single-program differentiated stream dies; the
same blocks as separate dispatches run fine, measured 67M rays fwd+bwd).

The workload is the parametric cylindrical light guide: Lambertian rays
enter one end, the trainable radius profile must steer them through the
exit disk; lost rays are pulled toward the exit center by the squared
landing distance (the differentiable flux surrogate of
sharded_light_guide).  Every block re-samples fresh rays from a
counter-folded PRNG stream, so a 4-block step IS an 8.4M-ray batch --
gradient noise falls as 1/sqrt(rays) at fixed memory.

With ``--mesh N`` the same step runs multi-chip: the block index space is
sharded over an N-device ray mesh (`parallel_streamed_value_and_grad`),
each chip streams its own blocks, and one psum per dispatch reduces
value/grad -- rays/step scales as chips x blocks with identical
`block_loss` code.

Run:  python examples/streamed_training.py [--rays-per-step N] [--mesh N]
Under CI this runs at toy sizes, including the mesh path
(tests/test_examples.py).
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp

from tensorflowraytrace_tpu import FINISHED, Scene3D, TraceConfig, TriangleSet
from tensorflowraytrace_tpu.engine import (
    streamed_value_and_grad, trace,
)
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi


def main(rays_per_step=1 << 23, block=1 << 21, steps=4, bounces=12,
         theta_res=12, z_res=10, blocks_per_dispatch=2, lr=3e-3,
         momentum=0.8, mesh_devices=0):
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    dtype = (jnp.float64 if not on_tpu and jax.config.read("jax_enable_x64")
             else jnp.float32)
    block = min(block, rays_per_step)
    n_blocks = max(1, rays_per_step // block)

    guide = bd.ParametricCylindricalGuide(
        (0.0, 0.0, 0.0), (0.0, 0.0, 6.0), minimum_radius=0.3,
        theta_res=theta_res, z_res=z_res, rotationally_symmetric=True,
        initial_taper=(0.7, 0.0), mat_in=1, mat_out=0, dtype=dtype)
    half = 0.35
    target = TriangleSet.make(
        [[-half, -half, 6.05], [half, half, 6.05]],
        [[half, -half, 6.05], [-half, half, 6.05]],
        [[half, half, 6.05], [-half, -half, 6.05]], dtype=dtype)
    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=bounces, use_pallas=on_tpu, cull=on_tpu,
                      remat=True)

    sphere = dist.RandomLambertianSphere(PI / 2.001, block)
    source = src.PointSource(3, (0.0, 0.0, 0.05), (0.0, 0.0, 1.0), sphere,
                             [575.0] * block, dense=False)
    exit_center = jnp.asarray([0.0, 0.0, 6.05], dtype)

    def block_loss(params, i, step_key):
        """Summed lost-ray exit distance of block i; the step loss is the
        mean over the whole stream (scaled after accumulation).  The
        step's PRNG key arrives as a pass-through aux argument -- closing
        over it would bake the first step's key into the compiled chunk."""
        scene = Scene3D.build(optical=[guide.build(params)],
                              targets=[target])
        rays = source.sample(jax.random.fold_in(step_key, i), dtype=dtype)
        res = trace(rays, scene, materials, cfg)
        dist2 = jnp.sum((res.rays.p1 - exit_center) ** 2, axis=1)
        lost = res.rays.state != FINISHED
        return jnp.sum(jnp.where(lost, dist2, 0.0))

    if mesh_devices:
        from tensorflowraytrace_tpu.parallel.sharding import (
            parallel_streamed_value_and_grad, ray_mesh,
        )

        mesh = ray_mesh(mesh_devices)
        run = parallel_streamed_value_and_grad(
            block_loss, n_blocks, mesh=mesh,
            blocks_per_dispatch=blocks_per_dispatch)
        where = f"{mesh.devices.size}-device mesh"
    else:
        run = streamed_value_and_grad(
            block_loss, n_blocks, blocks_per_dispatch=blocks_per_dispatch)
        where = "single device"

    params = guide.init_params()
    vel = jnp.zeros_like(params)
    print(f"{n_blocks} blocks x {block:,} rays = {n_blocks * block:,} "
          f"rays/step, {bounces} bounces, {blocks_per_dispatch} "
          f"blocks/dispatch, {where}")
    losses = []
    for s in range(steps):
        step_key = jax.random.fold_in(jax.random.PRNGKey(7), s)
        t0 = time.time()
        v, g = jax.tree.map(lambda a: a.block_until_ready(),
                            run(params, step_key))
        loss = float(v) / (n_blocks * block)
        g = g / (n_blocks * block)
        vel = momentum * vel - lr * g
        params = params + vel
        losses.append(loss)
        print(f"step {s}: lost-flux loss = {loss:.5f}   "
              f"({time.time() - t0:.1f}s)")
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    print("OK")
    return losses


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays-per-step", type=int, default=1 << 23)
    ap.add_argument("--block", type=int, default=1 << 21)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--bounces", type=int, default=12)
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the block stream over an N-device ray mesh")
    a = ap.parse_args()
    main(rays_per_step=a.rays_per_step, block=a.block, steps=a.steps,
         bounces=a.bounces, mesh_devices=a.mesh)
