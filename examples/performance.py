"""Performance sweep: trace wall-clock over rays x surfaces.

Rebuild of /root/reference/dev/performance.py (the reference's only benchmark
harness: 20 traces at {10, 10000} rays x {11, 1001} segments, 2D, depth 2),
extended with a 3D ray-triangle sweep and an intersections/sec metric.

Timing methodology: REPS traces are chained inside ONE jitted program via a
fori_loop (each iteration's rays depend on the previous checksum, preventing
CSE), and a single scalar crosses back to the host.  This amortizes dispatch
and tunnel round-trip latency, which otherwise dwarfs sub-millisecond traces.

Run:  python examples/performance.py [--pallas] [--no-pallas]
"""

import argparse
import dataclasses
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from tensorflowraytrace_tpu import RaySet, Scene2D, Scene3D, SegmentSet, TraceConfig, TriangleSet, trace
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops.spectrum import RAINBOW_6

PI = math.pi
REPS = 20


def timed_traces(rays, scene, materials, cfg):
    """Run REPS chained traces in one device program; return s/trace."""

    @jax.jit
    def run(rays, scene):
        def body(i, carry):
            r = dataclasses.replace(rays, p0=rays.p0 + carry * 1e-37)
            res = trace(r, scene, materials, cfg)
            return carry + jnp.sum(res.rays.p1) * 1e-30
        return lax.fori_loop(0, REPS, body, jnp.asarray(0.0, rays.p0.dtype))

    float(run(rays, scene))  # compile + warm up
    t0 = time.time()
    float(run(rays, scene))  # one dispatch, REPS traces, one scalar back
    wall = time.time() - t0
    return wall / REPS


def sweep_2d(use_pallas):
    materials = (mats.vacuum, mats.acrylic)
    target = SegmentSet.make([[10.0, -5.0]], [[10.0, 5.0]])
    cfg = TraceConfig(max_bounces=2, use_pallas=use_pallas)

    print("== 2D: rays x segments, depth-2 trace (dev/performance.py sweep) ==")
    for n_rays, n_segs in ((10, 11), (10000, 11), (10, 1001), (10000, 1001),
                           (1000000, 1001)):
        pts_y = np.linspace(-2, 2, n_segs + 1)
        surf = SegmentSet.make(
            np.stack([np.full(n_segs, 0.1), pts_y[:-1]], axis=1),
            np.stack([np.full(n_segs, 0.1), pts_y[1:]], axis=1),
            mat_in=1, mat_out=0)
        scene = Scene2D.build(optical_segments=[surf], target_segments=[target])
        beam = dist.StaticUniformBeam(-1.5, 1.5, max(n_rays // 6, 1))
        angles = dist.StaticUniformAngularDistribution(0.0, 0.0, 1)
        source = src.AngularSource(2, (-1.0, 0.0), 0.0, angles, beam, RAINBOW_6)
        rays = source.sample()

        dt = timed_traces(rays, scene, materials, cfg)
        inter = rays.n_rays * (n_segs + 1) * cfg.max_bounces
        print(f"  {rays.n_rays:>8} rays x {n_segs:>5} segments: "
              f"{dt * 1e3:8.3f} ms/trace  ({inter / dt / 1e9:8.2f} G int/s)")


def sweep_3d(use_pallas):
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=4, use_pallas=use_pallas)
    rng = np.random.default_rng(0)

    print("== 3D: rays x triangles, depth-4 trace ==")
    for n_rays, n_tris in ((1000, 128), (100000, 1024), (1000000, 4096)):
        center = rng.uniform(-3, 3, (n_tris, 3))
        tri = TriangleSet.make(
            (center + rng.normal(0, 0.4, center.shape)).astype(np.float32),
            (center + rng.normal(0, 0.4, center.shape)).astype(np.float32),
            (center + rng.normal(0, 0.4, center.shape)).astype(np.float32),
            mat_in=1)
        scene = Scene3D.build(optical=[tri])
        p0 = rng.uniform(-4, 4, (n_rays, 3)).astype(np.float32)
        d = rng.normal(0, 1, (n_rays, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        rays = RaySet.make(p0, p0 + d, 575.0)

        dt = timed_traces(rays, scene, materials, cfg)
        inter = n_rays * n_tris * cfg.max_bounces
        print(f"  {n_rays:>8} rays x {n_tris:>5} triangles: "
              f"{dt * 1e3:8.3f} ms/trace  ({inter / dt / 1e9:8.2f} G int/s)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--no-pallas", action="store_true")
    a = ap.parse_args()
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    use_pallas = (a.pallas or on_tpu) and not a.no_pallas
    print(f"device: {jax.devices()[0]}  pallas: {use_pallas}")
    sweep_2d(use_pallas)
    sweep_3d(use_pallas)
