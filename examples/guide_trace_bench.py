"""Benchmark: full deep trace of a light guide across acceleration modes.

Reproduces the docs/notes.md "24-bounce guide" rows: a 16k-triangle
elongated cylindrical guide (the structured-scene best case for the
conservative chunk culling), 1M rays injected at one end, full engine trace.
All modes are exact -- checksums must match brute force.

The reference has no counterpart (its only harness is
/root/reference/dev/performance.py's rays x segments sweep, covered by
examples/performance.py); this script exists because culling wins are
scene-dependent and mid-trace ray coherence differs from bounce-0 coherence,
so kernel-only microbenchmarks overstate structured-scene throughput.

Run:  python examples/guide_trace_bench.py [--rays N] [--bounces N]
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

from tensorflowraytrace_tpu import RaySet, Scene3D, TraceConfig, TriangleSet, trace
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models.acceleration import morton_sort_triangles
from tensorflowraytrace_tpu.ops import materials as mats


def main(n_rays=1 << 20, bounces=24, theta_res=64, z_res=128):
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
        [[half, half, 40.05], [-half, -half, 40.05]])
    scene = Scene3D.build(optical=[surf], targets=[target])
    m = scene.triangles.n_surfaces
    print(f"{n_rays} rays x {m} tris x {bounces} bounces")

    rng = np.random.default_rng(0)
    r = 0.2 * np.sqrt(rng.uniform(0, 1, n_rays))
    th = rng.uniform(0, 2 * math.pi, n_rays)
    p0 = np.stack([r * np.cos(th), r * np.sin(th), np.full(n_rays, 0.1)],
                  1).astype(np.float32)
    d = rng.normal(0, 1, (n_rays, 3))
    d[:, 2] = np.abs(d[:, 2]) * 3 + 1   # forward-biased: rays bounce down the guide
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = RaySet.make(jnp.asarray(p0), jnp.asarray(p0 + d.astype(np.float32)),
                       575.0)
    materials = (mats.vacuum, mats.acrylic)

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    modes = [("grid+resort", dict(cull="grid", resort_rays=True)),
             ("block+resort", dict(cull=True, resort_rays=True)),
             ("block", dict(cull=True, resort_rays=False)),
             ("brute", dict(cull=False, resort_rays=False))]
    checksums = set()
    for name, kw in modes:
        cfg = TraceConfig(max_bounces=bounces, use_pallas=on_tpu, **kw)

        def f(rays, scene, cfg=cfg):
            return trace(rays, scene, materials, cfg).rays.p1.sum()

        f = jax.jit(f)
        out = f(rays, scene)
        float(out)  # compile + first run
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            out = f(rays, scene)
            float(out)
        per = (time.time() - t0) / reps
        checksums.add(repr(float(out)))  # full precision: catch any divergence
        print(f"{name:14s}: {per * 1e3:7.0f} ms "
              f"-> {n_rays * m * bounces / per / 1e9:6.0f} G equiv int/s "
              f"(checksum {float(out)!r})", flush=True)
    assert len(checksums) == 1, f"modes disagree: {checksums}"
    print("all modes bit-identical OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--bounces", type=int, default=24)
    a = ap.parse_args()
    main(a.rays, a.bounces)
