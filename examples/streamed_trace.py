"""Stream 100M+ rays through one chip: trace_streamed past the HBM ceiling.

The single-dispatch trace holds every per-ray slot in HBM at once --
measured ceiling ~16.8M rays x 4k tris per chip (docs/notes.md).  This demo
streams ray super-blocks through ``lax.map`` with a block GENERATOR (the
input rays never materialize either: each block is sampled from the source
with a counter-folded PRNG key), folding a landing loss + state counts, so
device memory is O(block_size) and the ray count is bounded by wall-clock
only.

Workload: the structured cylindrical light guide (bench.py's second
metric), Lambertian-lit, traced deep.  Prints per-stream throughput and the
linear-time scaling across stream sizes.

Blocks are mapped in HOST dispatches of a few blocks each
(``blocks_per_dispatch``): fusing the whole stream into one XLA program
runs multi-minute device times that trip the TPU runtime's execution
watchdog (measured: an 8-block ~160 s single dispatch reproducibly kills
the remote worker; the same blocks in 2-block dispatches stream fine).

On a TPU chip the default arguments push past 100M rays; under CI this runs
at toy sizes (see tests/test_examples.py).

Run:  python examples/streamed_trace.py [--n-rays 134217728] [--block 4194304]
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import RaySet, Scene3D, TraceConfig, TriangleSet
from tensorflowraytrace_tpu.engine import landing_sum_fold, trace_streamed
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models.acceleration import morton_sort_triangles
from tensorflowraytrace_tpu.ops import materials as mats


def build_guide(dtype, theta_res=64, z_res=128):
    guide = bd.ParametricCylindricalGuide(
        (0.0, 0.0, 0.0), (0.0, 0.0, 40.0), minimum_radius=0.3,
        theta_res=theta_res, z_res=z_res, rotationally_symmetric=True,
        initial_taper=(0.7, 0.0), mat_in=1, mat_out=0)
    surf = guide.build(guide.init_params())
    surf, _ = morton_sort_triangles(surf)
    half = 0.35
    target = TriangleSet.make(
        [[-half, -half, 40.05], [half, half, 40.05]],
        [[half, -half, 40.05], [-half, half, 40.05]],
        [[half, half, 40.05], [-half, -half, 40.05]], dtype=dtype)
    scene = Scene3D.build(optical=[surf], targets=[target])
    return scene, (mats.vacuum, mats.acrylic)


def block_generator(key, block, dtype):
    """Lambertian-ish cone of rays from the guide's entrance disk; block i
    draws from fold_in(key, i) -- the stream is reproducible and never
    materialized."""

    def gen(i):
        k = jax.random.fold_in(key, i)
        k1, k2, k3 = jax.random.split(k, 3)
        r = 0.2 * jnp.sqrt(jax.random.uniform(k1, (block,), dtype))
        th = jax.random.uniform(k2, (block,), dtype, 0.0, 2.0 * math.pi)
        p0 = jnp.stack([r * jnp.cos(th), r * jnp.sin(th),
                        jnp.full((block,), 0.1, dtype)], 1)
        d = jax.random.normal(k3, (block, 3), dtype)
        d = d.at[:, 2].set(jnp.abs(d[:, 2]) * 3.0 + 1.0)
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
        return RaySet.make(p0, p0 + d, 575.0, dtype=dtype)

    return gen


def main(n_rays=1 << 27, block=1 << 22, bounces=24, theta_res=64, z_res=128,
         scaling_points=3, blocks_per_dispatch="auto"):
    import os

    # repeated trace_streamed calls build fresh jit closures; the
    # persistent cache makes their identical chunk programs compile once
    os.makedirs(os.path.expanduser("~/.jax_bench_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    dtype = jnp.float32
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if blocks_per_dispatch == "auto":
        # ~11 s of device time per 4.2M-ray block on v5e: 2 blocks per
        # dispatch stays far below the TPU runtime's execution watchdog
        # (an 8-block single program reproducibly kills the worker)
        blocks_per_dispatch = 2
    scene, materials = build_guide(dtype, theta_res, z_res)
    m = scene.triangles.n_surfaces
    cfg = TraceConfig(max_bounces=bounces, use_pallas=on_tpu,
                      cull="grid" if on_tpu else False, resort_rays=on_tpu)
    init, fn = landing_sum_fold(
        lambda p1: p1[:, 0] ** 2 + p1[:, 1] ** 2, dtype)
    gen = block_generator(jax.random.PRNGKey(0), block, dtype)

    def run(n_blocks):
        res = trace_streamed(
            gen, scene, materials, cfg, fold_fn=fn, fold_init=init,
            block_size=block, n_blocks=n_blocks, remat_blocks=False,
            blocks_per_dispatch=blocks_per_dispatch)
        return res.fold, res.state_counts

    total_blocks = max(1, n_rays // block)

    # warm up / compile one full dispatch chunk
    fold, counts = jax.tree.map(lambda a: a.block_until_ready(),
                                run(blocks_per_dispatch))
    print(f"scene: {m} triangles, {bounces} bounces, block = {block} rays, "
          f"{blocks_per_dispatch} blocks/dispatch")

    sizes = sorted({max(1, total_blocks >> k)
                    for k in range(scaling_points)})
    last = None
    for nb in sizes:
        t0 = time.time()
        fold, counts = jax.tree.map(lambda a: a.block_until_ready(),
                                    run(nb))
        dt = time.time() - t0
        n = nb * block
        rate = n / dt
        eq = n * m * bounces / dt
        c = np.asarray(counts)
        print(f"  {n:>12,} rays  {dt:8.2f}s  {rate / 1e6:8.2f} M rays/s  "
              f"{eq / 1e9:8.2f} G equiv int/s  "
              f"finished {c[1]:,} dead {c[3]:,}")
        assert np.isfinite(float(fold))
        assert c.sum() == n
        if last is not None:
            # linear time: double the rays ~ double the time (amortized
            # dispatch; allow generous slack for small sizes)
            n0, t0s = last
            assert dt < (n / n0) * t0s * 1.8 + 1.0, (
                "streaming should scale linearly in ray count")
        last = (n, dt)
    print("OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rays", type=int, default=1 << 27)
    ap.add_argument("--block", type=int, default=1 << 22)
    ap.add_argument("--bounces", type=int, default=24)
    ap.add_argument("--blocks-per-dispatch", type=int, default=None)
    a = ap.parse_args()
    main(n_rays=a.n_rays, block=a.block, bounces=a.bounces,
         blocks_per_dispatch=a.blocks_per_dispatch or "auto")
