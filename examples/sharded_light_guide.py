"""Multi-chip light-guide optimization: 10M+ rays/step sharded over the
device mesh with psum gradient accumulation (BASELINE.json config 5).

On a single real chip this still runs (mesh of 1); on CPU run with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/sharded_light_guide.py --rays 80000
to exercise the 8-way sharding.

The guide is a parametric cylinder (rotationally symmetric radius profile);
the loss asks rays entering one end to exit through a target disk at the far
end.

Run:  python examples/sharded_light_guide.py [--rays N] [--steps N]
"""

import argparse
import math
import os
import time

import jax

if __name__ == "__main__":
    # persistent compile cache for standalone bench runs ONLY: setting it at
    # import time would leak a shared on-disk cache into any process that
    # imports this module (e.g. the test suite) -- a concurrent writer can
    # corrupt a read mid-deserialization (observed: segfault in
    # jax compilation_cache.get_executable_and_time under pytest while
    # bench.py wrote the same directory).
    os.makedirs(os.path.expanduser("~/.jax_bench_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_bench_cache"))

import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import FINISHED, Scene3D, TraceConfig, TriangleSet, trace
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.parallel import sharding as par

PI = math.pi


def main(rays=1 << 20, steps=10, bounces=12):
    n_dev = len(jax.devices())
    mesh = par.ray_mesh()
    local_rays = max(rays // n_dev, 1)
    print(f"{n_dev} devices x {local_rays} rays/device = "
          f"{n_dev * local_rays} rays/step, {bounces} bounces")

    guide = bd.ParametricCylindricalGuide(
        (0.0, 0.0, 0.0), (0.0, 0.0, 6.0), minimum_radius=0.3, theta_res=12,
        z_res=10, rotationally_symmetric=True, initial_taper=(0.7, 0.0),
        mat_in=1, mat_out=0)
    half = 0.35
    target = TriangleSet.make(
        [[-half, -half, 6.05], [half, half, 6.05]],
        [[half, -half, 6.05], [-half, half, 6.05]],
        [[half, half, 6.05], [-half, -half, 6.05]])

    materials = (mats.vacuum, mats.acrylic)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    # conservative chunk culling: big win on elongated guide scenes.
    # per-bounce ray re-sorting only pays off once the scene spans many
    # kernel chunks -- on a few-hundred-triangle guide the argsort of every
    # ray every bounce costs more than the skipped chunks save
    big_scene = guide.mesh.n_faces >= 2048
    # remat is REQUIRED at this scale: without it the backward pass saves
    # every per-bounce intermediate (measured 40.3 GB at 10.5M rays x 12
    # bounces -- 2.5x the chip).  With the save-hit checkpoint policy the
    # backward rematerializes the cheap elementwise work and never re-runs
    # the N x M search (see engine._tag_hit).
    cfg = TraceConfig(max_bounces=bounces, use_pallas=on_tpu, cull=on_tpu,
                      resort_rays=on_tpu and big_scene, remat=True)

    sphere = dist.RandomLambertianSphere(PI / 2.001, local_rays)
    source = src.PointSource(3, (0.0, 0.0, 0.05), (0.0, 0.0, 1.0), sphere,
                             [575.0] * local_rays, dense=False)

    def local_loss(params, key):
        scene = Scene3D.build(optical=[guide.build(params[0])],
                              targets=[target])
        res = trace(source.sample(key), scene, materials, cfg)
        finished = res.rays.state == FINISHED
        # differentiable flux objective: pull every LOST ray's final
        # position toward the exit-disk center.  (A pure lost-flux count,
        # where(finished, 0, 1), is piecewise-CONSTANT in the parameters --
        # its gradient is identically zero and the optimizer would no-op.
        # The squared landing distance is the standard differentiable
        # surrogate: the mask is fixed per trajectory fate, gradients flow
        # through the geometry of the lost rays.)
        exit_center = jnp.asarray([0.0, 0.0, 6.05], res.rays.p1.dtype)
        dist2 = jnp.sum((res.rays.p1 - exit_center) ** 2, axis=1)
        return jnp.sum(jnp.where(finished, 0.0, dist2)) / local_rays

    # data-parallel training through the FULL optimizer pipeline: the same
    # Optimizer as single-chip scripts, handed the mesh -- psum-reduced
    # grads, shared _apply_param_update, chained phases in one dispatch
    from tensorflowraytrace_tpu.optim import Optimizer

    opt = Optimizer(local_loss, [guide.init_params()], learning_rate=3e-3,
                    grad_clip=0.05, momentum=0.8, mesh=mesh,
                    key=jax.random.PRNGKey(0))
    # warm up: the first run_phase compiles the chained lax.scan program
    # (minutes through a remote-attached TPU tunnel, and highly variable).
    # The warmup must run run_phase itself with the SAME step count -- a
    # single_step warmup compiles a DIFFERENT executable and would leave
    # the chained compile inside the timed region.
    t0 = time.time()
    errors = opt.run_phase(steps)
    print(f"warmup phase ({steps} steps, compile + run): "
          f"{time.time() - t0:.1f}s, loss = {errors[-1] / n_dev:.4f}")
    t0 = time.time()
    # steady state: whole schedule in ONE device dispatch (lax.scan)
    errors = opt.run_phase(steps)
    for i, e in enumerate(errors):
        print(f"step {i}: lost-ray exit-distance loss (mean over devices) = "
              f"{e / n_dev:.4f}")
    dt = time.time() - t0
    n_tris = guide.mesh.n_faces + 2
    inter = n_dev * local_rays * n_tris * bounces * steps
    print(f"{dt:.1f}s wall for {steps} sharded steps -> "
          f"{inter / dt / 1e9:.2f} G forward intersections/s aggregate")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--bounces", type=int, default=12)
    a = ap.parse_args()
    main(rays=a.rays, steps=a.steps, bounces=a.bounces)
