"""Benchmark: analytic sequential tracer vs the general mesh engine.

Reproduces the docs/notes.md "sequential vs mesh" row.  The same asphere
singlet (front cap c=0.5 k=-0.3, plane back at z=0.3, image plane at z=2)
is traced two ways at 1M collimated rays:

  analytic   `trace_sequential` on the 2-surface AsphereStack (closed-form
             conic seed + Newton tail: machine-precision hits, no
             tessellation, classical lens-design workflow)
  mesh       the general engine on the SAME surfaces tessellated at
             edge=0.02 (the convergence-test discretization of
             tests/test_sequential.py), grid-culled pallas search, 3 bounces

`--check` first runs a small-N landing-agreement pass: every ray must land
within the tessellation floor of the analytic position (measured 0.0056 at
edge=0.02), which pins that the two engines implement the same optics.

Measured on v5e (f32): analytic 31.9 ms = 32.8 M rays/s vs mesh 304.6 ms =
3.4 M rays/s -- 9.5x, and the analytic path is exact.  For ordered centered
asphere stacks the sequential tracer is strictly better; the mesh engine is
the tool for freeform / non-sequential scenes.

Run:  python examples/sequential_vs_mesh_bench.py [--check]
"""
import os
import sys
import time

import jax

if __name__ == "__main__":
    os.makedirs(os.path.expanduser("~/.jax_bench_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_bench_cache"))

import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    AsphereStack, RaySet, Scene3D, TraceConfig, TriangleSet,
    collimated_bundle, trace, trace_sequential,
)
from tensorflowraytrace_tpu.config import FINISHED
from tensorflowraytrace_tpu.models.acceleration import morton_sort_triangles
from tensorflowraytrace_tpu.models.boundaries import ParametricAsphereBoundary
from tensorflowraytrace_tpu.ops import materials as mats

C, K = 0.5, -0.3
Z_BACK = 0.3
Z_IMG = 2.0
EDGE = 0.02
N_RAYS = 1 << 20
MATERIALS = (mats.vacuum, mats.build_constant_material(1.5))


def build_mesh_scene(dtype):
    front = ParametricAsphereBoundary(
        (0.0, 0.0, 0.0), (0.0, 0.0, 1.0), aperture_radius=1.0,
        target_edge_size=EDGE, mat_in=0, mat_out=1, dtype=dtype)
    back = ParametricAsphereBoundary(
        (0.0, 0.0, Z_BACK), (0.0, 0.0, 1.0), aperture_radius=1.0,
        target_edge_size=EDGE, mat_in=1, mat_out=0, dtype=dtype)
    s_front = front.build(jnp.asarray([C, K], dtype))
    s_back = back.build(jnp.asarray([0.0, 0.0], dtype))
    half = 5.0
    target = TriangleSet.make(
        [[-half, -half, Z_IMG], [half, half, Z_IMG]],
        [[half, -half, Z_IMG], [-half, half, Z_IMG]],
        [[half, half, Z_IMG], [-half, -half, Z_IMG]], dtype=dtype)
    n_tris = s_front.n_surfaces + s_back.n_surfaces + 2
    from tensorflowraytrace_tpu.models.surfaces import concat_triangles
    merged = concat_triangles([s_front, s_back])
    merged, _ = morton_sort_triangles(merged)
    scene = Scene3D.build(optical=[merged], targets=[target])
    return scene, n_tris


def bundle(n, dtype):
    return collimated_bundle(n, 0.6, z_start=-1.0, grid="hex", dtype=dtype)


def stack(dtype):
    return AsphereStack.make(vertex_z=[0.0, Z_BACK], c=[C, 0.0], k=[K, 0.0],
                             mat_after=[1, 0], dtype=dtype)


def timeit(f, reps=5):
    f()  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def check(dtype):
    n = 512
    p, d = bundle(n, dtype)
    res = trace_sequential(p, d, 550.0, stack(dtype), MATERIALS,
                           image_z=Z_IMG)
    exact = np.asarray(res.p[:, :2])
    scene, _ = build_mesh_scene(dtype)
    rays = RaySet.make(p, p + d, 550.0, dtype=dtype)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    ccfg = TraceConfig(max_bounces=3, use_pallas=on_tpu,
                       cull="grid" if on_tpu else False, resort_rays=on_tpu)
    mres = jax.jit(lambda r, s: trace(r, s, MATERIALS, ccfg))(rays, scene)
    land = np.asarray(mres.rays.p1[:, :2])
    fin = np.asarray(mres.rays.state) == FINISHED
    assert fin.mean() > 0.9, fin.mean()
    err = np.abs(land[fin] - exact[fin]).max()
    print(f"check: finished {fin.mean():.3f}, max landing dev {err:.4f} "
          f"(tessellation floor at edge={EDGE})")
    assert err < 0.02, err


def main():
    dtype = jnp.float32
    if "--check" in sys.argv:
        check(dtype)

    p, d = bundle(N_RAYS, dtype)
    st = stack(dtype)

    seq = jax.jit(lambda p, d: trace_sequential(
        p, d, 550.0, st, MATERIALS, image_z=Z_IMG).p)
    t_seq = timeit(lambda: np.asarray(seq(p, d)[:4]))

    scene, n_tris = build_mesh_scene(dtype)
    rays = RaySet.make(p, p + d, 550.0, dtype=dtype)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    cfg = TraceConfig(max_bounces=3, use_pallas=on_tpu,
                      cull="grid" if on_tpu else False, resort_rays=on_tpu)
    mesh = jax.jit(lambda r, s: trace(r, s, MATERIALS, cfg).rays.p1)
    t_mesh = timeit(lambda: np.asarray(mesh(rays, scene)[:4]))

    print(f"platform={jax.devices()[0].platform}, rays={N_RAYS}, "
          f"tessellation={n_tris} tris at edge={EDGE}")
    print(f"analytic sequential (2 surfaces + image): {t_seq*1e3:8.1f} ms "
          f"-> {N_RAYS/t_seq/1e6:.1f} M rays/s")
    print(f"mesh engine (3 bounces, grid cull):       {t_mesh*1e3:8.1f} ms "
          f"-> {N_RAYS/t_mesh/1e6:.1f} M rays/s  "
          f"({t_mesh/t_seq:.1f}x slower, exact only to the tessellation "
          f"floor)")


if __name__ == "__main__":
    main()
