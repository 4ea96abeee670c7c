"""Benchmark: ray-surface intersection throughput of the full trace engine.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); the driver-set north star
is 1e8 ray-triangle intersections/s/chip (BASELINE.json:5).  vs_baseline is
value / 1e8.

Workload: the light-guide-scale trace (BASELINE.json config 5 shape): 2^20
rays x 4096 triangles x 8 bounces through the full engine (Pallas nearest-hit
search + differentiable refine + vector Snell) in one jit, so tunnel/dispatch
latency is amortized inside the device program.  Diagnostics go to stderr;
stdout carries exactly the one JSON line.
"""

import json
import os
import sys
import time

import jax

# Persistent compile cache: first compilation of the full trace program
# through the remote-attached TPU toolchain can take minutes; later runs
# (including the driver's) should hit this cache.
try:
    os.makedirs("/root/.jax_bench_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

N_RAYS = 1 << 20
N_TRIS = 4096
BOUNCES = 8
BASELINE = 1.0e8  # north-star: 1e8 ray-triangle intersections/s/chip


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_workload(dtype):
    from tensorflowraytrace_tpu import RaySet, Scene3D, TraceConfig, TriangleSet
    from tensorflowraytrace_tpu.ops import materials as mats

    rng = np.random.default_rng(0)

    # a closed-ish box of reflective triangles around the origin plus a
    # distant target plane: rays bounce many times (light-guide style)
    center = rng.uniform(-3, 3, (N_TRIS - 2, 3))
    vp = center + rng.normal(0, 0.5, center.shape)
    v1 = center + rng.normal(0, 0.5, center.shape)
    v2 = center + rng.normal(0, 0.5, center.shape)
    guide = TriangleSet.make(vp.astype(np.float32), v1.astype(np.float32),
                             v2.astype(np.float32), mat_in=1, mat_out=0,
                             dtype=dtype)
    # spatially sort the scene so the kernel's conservative chunk culling
    # has compact AABBs to work with (results are exactly unchanged)
    from tensorflowraytrace_tpu.models.acceleration import morton_sort_triangles

    guide, _ = morton_sort_triangles(guide)
    half = 500.0
    target = TriangleSet.make(
        [[50.0, -half, -half], [50.0, half, half]],
        [[50.0, half, -half], [50.0, -half, half]],
        [[50.0, half, half], [50.0, -half, -half]], dtype=dtype)
    scene = Scene3D.build(optical=[guide], targets=[target])

    p0 = rng.uniform(-4, 4, (N_RAYS, 3)).astype(np.float32)
    d = rng.normal(0, 1, (N_RAYS, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = RaySet.make(jnp.asarray(p0), jnp.asarray(p0 + d), 575.0, dtype=dtype)

    materials = (mats.vacuum, mats.reflective)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    # measured: the differentiable path (fused gather + refine) is slightly
    # FASTER than the inference path here, so bench the default; the full
    # acceleration stack (conservative AABB chunk culling + per-bounce ray
    # re-sorting) is exact, so the traced results equal brute force
    cfg = TraceConfig(max_bounces=BOUNCES, use_pallas=on_tpu,
                      cull="grid" if on_tpu else False, resort_rays=on_tpu)
    return rays, scene, materials, cfg


def build_structured_workload(dtype):
    """The structured-scene benchmark: a 16k-triangle cylindrical light guide
    traced 24 bounces deep (examples/guide_trace_bench.py's scene).  This is
    where the acceleration stack (two-level grid culling + per-bounce ray
    re-sorting) actually pays -- the random-soup headline scene is
    culling-neutral, so this second metric records the structured-scene
    throughput the kernels were built for."""
    import math

    from tensorflowraytrace_tpu import RaySet, Scene3D, TraceConfig, TriangleSet
    from tensorflowraytrace_tpu.models import boundaries as bd
    from tensorflowraytrace_tpu.models.acceleration import morton_sort_triangles
    from tensorflowraytrace_tpu.ops import materials as mats

    guide = bd.ParametricCylindricalGuide(
        (0.0, 0.0, 0.0), (0.0, 0.0, 40.0), minimum_radius=0.3,
        theta_res=64, z_res=128, rotationally_symmetric=True,
        initial_taper=(0.7, 0.0), mat_in=1, mat_out=0)
    surf = guide.build(guide.init_params())
    surf, _ = morton_sort_triangles(surf)
    half = 0.35
    target = TriangleSet.make(
        [[-half, -half, 40.05], [half, half, 40.05]],
        [[half, -half, 40.05], [-half, half, 40.05]],
        [[half, half, 40.05], [-half, -half, 40.05]], dtype=dtype)
    scene = Scene3D.build(optical=[surf], targets=[target])

    n_rays = 1 << 20
    rng = np.random.default_rng(0)
    r = 0.2 * np.sqrt(rng.uniform(0, 1, n_rays))
    th = rng.uniform(0, 2 * math.pi, n_rays)
    p0 = np.stack([r * np.cos(th), r * np.sin(th), np.full(n_rays, 0.1)],
                  1).astype(np.float32)
    d = rng.normal(0, 1, (n_rays, 3))
    d[:, 2] = np.abs(d[:, 2]) * 3 + 1
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    rays = RaySet.make(jnp.asarray(p0), jnp.asarray(p0 + d.astype(np.float32)),
                       575.0, dtype=dtype)
    materials = (mats.vacuum, mats.acrylic)
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    bounces = 24
    cfg = TraceConfig(max_bounces=bounces, use_pallas=on_tpu,
                      cull="grid" if on_tpu else False, resort_rays=on_tpu)
    return rays, scene, materials, cfg, n_rays, bounces


def _measure(run, rays, scene, reps=5):
    """Time ``reps`` synced calls.  Returns ``(compile_and_first, stats)``
    with per-rep timing stats so the artifact self-describes its noise
    (VERDICT r4 #6: the r4 structured metric read 156.5 G in BENCH but
    168.8 G in notes -- ~8% capture-to-capture tunnel variance that the
    JSON must make visible).  The headline uses the MEDIAN rep."""
    t0 = time.time()
    out = run(rays, scene)
    float(out)
    compile_and_first = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = run(rays, scene)
        float(out)  # host sync each rep (includes tunnel RTT)
        times.append(time.time() - t0)
    med = float(np.median(times))
    stats = {
        "reps": reps,
        "min_s": round(float(np.min(times)), 6),
        "median_s": round(med, 6),
        "max_s": round(float(np.max(times)), 6),
        "spread_pct": round(
            100.0 * (float(np.max(times)) - float(np.min(times))) / med, 2),
    }
    return compile_and_first, stats


def main():
    from tensorflowraytrace_tpu import trace

    # Outage guard: when the TPU tunnel is hung, the first in-process
    # jax.devices() blocks indefinitely.  Probe in a bounded subprocess
    # first (3 tries, 120 s each) and fail with one clear line instead of
    # a stall + raw traceback.  An explicit JAX_PLATFORMS=cpu run (local
    # testing) skips the probe.
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        from tensorflowraytrace_tpu.utils.tpu_probe import probe_tpu

        platform = probe_tpu(timeout=120, retries=3, retry_wait=60)
        if platform is None:
            log("TPU unavailable: bounded device probe failed/hung 3x "
                "(tunnel outage?). Set JAX_PLATFORMS=cpu for a CPU run.")
            sys.exit(1)
        log(f"probe: platform={platform}")

    dtype = jnp.float32
    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    rays, scene, materials, cfg = build_workload(dtype)

    @jax.jit
    def run(rays, scene):
        res = trace(rays, scene, materials, cfg)
        # reduce to a scalar so only one value crosses the wire
        return jnp.sum(res.rays.p1) + jnp.sum(res.rays.state)

    compile_and_first, stats = _measure(run, rays, scene)
    log(f"first call (compile+run): {compile_and_first:.2f}s")
    per_call = stats["median_s"]
    intersections = N_RAYS * N_TRIS * BOUNCES
    rate = intersections / per_call
    log(f"{per_call * 1e3:.1f} ms (median of {stats['reps']}, spread "
        f"{stats['spread_pct']}%) per {BOUNCES}-bounce trace of "
        f"{N_RAYS} rays x {N_TRIS} tris -> {rate / 1e9:.2f} G intersections/s")
    # Achieved vs the measured kernel ceiling (docs/notes.md "Kernel
    # headroom -- CLOSED"): the brute intersection kernel runs 30.8 G
    # pairs/s = 84% of its arithmetic-only ablation ceiling (36.6 G, same
    # chip/shape); op-count reformulations measured no faster, so the
    # remaining single-pass headroom is <= 1.19x and already priced.
    log(f"vs measured kernel ceiling: single-pass brute kernel is at 84% of "
        f"its 36.6 G pairs/s arithmetic-only bound; this full-trace metric "
        f"({rate / 1e9:.1f} G) additionally includes culling + per-bounce "
        f"overheads (see docs/notes.md kernel-headroom table)")

    # second metric: the structured light-guide scene where the grid-culling
    # acceleration pays (the headline random-soup scene is culling-neutral)
    s_rays, s_scene, s_materials, s_cfg, s_n, s_bounces = (
        build_structured_workload(dtype))
    s_m = s_scene.triangles.n_surfaces

    @jax.jit
    def run_s(rays, scene):
        res = trace(rays, scene, s_materials, s_cfg)
        return jnp.sum(res.rays.p1) + jnp.sum(res.rays.state)

    s_first, s_stats = _measure(run_s, s_rays, s_scene)
    s_per = s_stats["median_s"]
    s_rate = s_n * s_m * s_bounces / s_per
    log(f"structured guide: first {s_first:.2f}s; {s_per * 1e3:.1f} ms "
        f"(median of {s_stats['reps']}, spread {s_stats['spread_pct']}%) per "
        f"{s_bounces}-bounce trace of {s_n} rays x {s_m} tris -> "
        f"{s_rate / 1e9:.2f} G equiv intersections/s")

    print(json.dumps({
        "metric": "ray_triangle_intersections_per_sec_per_chip",
        "value": rate,
        "unit": "intersections/s (equivalent; exact-result AABB culling on)",
        "vs_baseline": rate / BASELINE,
        "timing": stats,
        "structured_scene": {
            "metric": "guide_16k_tri_24_bounce_equiv_intersections_per_sec",
            "value": s_rate,
            "unit": "intersections/s (equivalent; grid culling + resort)",
            "vs_baseline": s_rate / BASELINE,
            "timing": s_stats,
        },
    }))


if __name__ == "__main__":
    main()
