"""On-chip timings of the r3/r4 physics batch (VERDICT r3 next-round #1b).

Every number in docs/notes.md about the round-3/4 physics — the chunked
Huygens PSF, the one-dispatch polychromatic fusion, the thin-film
select-chain cost inside the bounce loop, stochastic roulette sampling,
and the segment-sum gather-VJP crossover — was measured on CPU during the
tunnel outage.  This harness re-measures all of them on the attached TPU
so the notes carry real-hardware rows.

Timing methodology: sub-10ms device programs are chained ``reps`` times
inside one jitted ``fori_loop`` with a numerically-negligible data
dependency between iterations (``+ prev[0,0] * 1e-30``, so XLA cannot
hoist or CSE the body), amortizing the remote-tunnel dispatch latency;
100ms+ programs (PSF evaluations, 1M-ray traces) are timed per dispatch
with ``block_until_ready`` and the minimum of ``reps`` is reported.

Sections (each prints one table row per configuration):

* ``segsum``   — pallas ``segment_sum_pallas`` vs XLA scatter-add at the
  engine's exact VJP shapes (k=13 cotangent rows, 1M rays, slot-order
  uniform indices: the gather-VJP worst case), m in {256 .. 2048}.  This
  is the measurement that pins ``SEGSUM_MAX_M`` (the kernel/scatter
  crossover) on real hardware; the 2048→1024 retune was CPU-reasoned.
* ``psf``      — chunked Huygens PSF at production scale (1M wavelets x
  4096 grid points, f32, phase reduction on), forward and gradient.
* ``poly``     — one-dispatch polychromatic PSF (K=7 lines fused into a
  single (G, N) phase evaluation + MXU one-hot contraction) vs the
  per-line huygens_psf loop it replaced (VERDICT #7's measured-win row,
  so far CPU-only: 6.8x).
* ``reactions``— 1M-ray 8-bounce slab traces under each field tracker:
  default / fresnel intensity / thin-film (1- and 4-layer stacks) /
  russian roulette, isolating the per-bounce reaction overhead on chip.

Run:  python examples/tpu_physics_bench.py [--json] [section ...]
CI runs this at toy sizes on CPU (tests/test_examples.py) to keep the
harness itself green; the numbers only mean something on the chip.
"""

import argparse
import json
import math
import sys
import time
import types

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.analysis import huygens_psf, polychromatic_psf
from tensorflowraytrace_tpu.operations import (
    default_reaction, fresnel_intensity_reaction,
    russian_roulette_reaction, seed_roulette,
    thin_film_intensity_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops import pallas_kernels as pk

F32 = jnp.float32


def timed(fn, reps=4):
    """Compile, then min-of-reps wall time of one dispatch."""
    out = jax.block_until_ready(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def chained_ms(f, args, out_shape, reps):
    """Per-call ms of ``f(*args)`` with ``reps`` dependent calls fused in
    one program (dispatch-amortized; see module docstring)."""

    @jax.jit
    def run(first):
        def body(_, acc):
            return f(first + acc[(0,) * acc.ndim] * 1e-30, *args[1:])

        return jax.lax.fori_loop(
            0, reps, body, jnp.zeros(out_shape, F32))

    t, _ = timed(lambda: run(args[0]), reps=3)
    return t / reps * 1e3


def bench_segsum(results, n=1 << 20, k=13, reps=16, ms_list=(256, 512,
                                                             1024, 2048)):
    print(f"-- segment-sum gather-VJP crossover (k={k}, n={n:,}, "
          "slot-order uniform idx) --")
    rng = np.random.default_rng(0)
    for m in ms_list:
        ct = jnp.asarray(rng.normal(0, 1, (k, n)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, m, n).astype(np.int32))
        t_scat = chained_ms(
            lambda c, i, m=m: jnp.zeros((m, k), F32).at[i].add(c.T),
            (ct, idx), (m, k), reps)
        t_kern = chained_ms(
            lambda c, i, m=m: pk.segment_sum_pallas(c, i, m),
            (ct, idx), (m, k), reps)
        results[f"segsum/m={m}"] = {"scatter_ms": t_scat,
                                    "kernel_ms": t_kern}
        win = "kernel" if t_kern < t_scat else "scatter"
        print(f"  m={m:5d}  scatter {t_scat:8.3f} ms   kernel "
              f"{t_kern:8.3f} ms   -> {win} wins "
              f"({max(t_scat, t_kern) / min(t_scat, t_kern):.2f}x)")


def _wavelets(rng, n, spread=1.0):
    src = jnp.asarray(
        rng.normal(0, spread, (n, 2)).astype(np.float32))
    opl = jnp.asarray(rng.uniform(99.0, 101.0, n).astype(np.float32))
    return src, opl


def _grid(g):
    ys = np.linspace(-0.05, 0.05, g).astype(np.float32)
    return jnp.asarray(np.stack([np.full(g, 50.0, np.float32), ys], 1))


def bench_psf(results, n=1 << 20, g=4096, chunk=1 << 16, reps=4):
    print(f"-- chunked Huygens PSF (N={n:,} wavelets, G={g} points, "
          f"ray_chunk={chunk}, f32, phase reduction on) --")
    rng = np.random.default_rng(1)
    src, opl = _wavelets(rng, n)
    grid = _grid(g)
    wl = 550e-6  # nm -> mm-scale scene units

    fwd = jax.jit(lambda s, o: huygens_psf(s, o, wl, grid,
                                           ray_chunk=chunk))
    t, psf = timed(lambda: fwd(src, opl), reps)
    assert bool(jnp.all(jnp.isfinite(psf)))
    rate = n * g / t
    results["psf/forward"] = {"ms": t * 1e3, "wavelet_points_per_s": rate}
    print(f"  forward   {t * 1e3:9.1f} ms   {rate / 1e9:7.2f} G "
          "wavelet-points/s")

    grad = jax.jit(jax.grad(
        lambda o: jnp.sum(huygens_psf(src, o, wl, grid, ray_chunk=chunk))))
    tg, gout = timed(lambda: grad(opl), reps)
    assert bool(jnp.all(jnp.isfinite(gout)))
    results["psf/grad"] = {"ms": tg * 1e3, "ratio_vs_forward": tg / t}
    print(f"  grad(opl) {tg * 1e3:9.1f} ms   ({tg / t:.2f}x forward; "
          "chunk body is rematerialized)")


def bench_poly(results, n=1 << 18, g=2048, k_lines=7, chunk=1 << 15,
               reps=3):
    print(f"-- polychromatic PSF: fused one-dispatch vs per-line loop "
          f"(N={n:,}, G={g}, K={k_lines}) --")
    rng = np.random.default_rng(2)
    src, opl = _wavelets(rng, n)
    grid = _grid(g)
    lines = [float(w) for w in np.linspace(420.0, 680.0, k_lines)]
    wl_ray = jnp.asarray(np.resize(np.asarray(lines, np.float32), n))
    scale = 1e-6
    rays = RaySet.make(
        src, src + jnp.asarray([1.0, 0.0], F32), wl_ray,
        state=jnp.full((n,), FINISHED, jnp.int32),
        dtype=F32).with_field("opl", opl)
    res = types.SimpleNamespace(rays=rays)

    fused = jax.jit(lambda: polychromatic_psf(
        res, grid, lines, scale, medium_n=1.0, ray_chunk=chunk))

    def loop():
        tot = jnp.zeros(g, F32)
        for wl_nm in lines:
            amp = jnp.isclose(wl_ray, wl_nm).astype(F32)
            tot = tot + huygens_psf(src, opl, wl_nm * scale, grid,
                                    amplitudes=amp, medium_n=1.0,
                                    ray_chunk=chunk)
        return tot

    loopj = jax.jit(loop)
    tf, pf = timed(fused, reps)
    tl, plp = timed(loopj, reps)
    # sanity only (correctness is pinned in tests/test_psf.py): the fused
    # path reduces phases against one shared reference wavelet, the
    # per-line loop against per-line references -- |E|^2 is invariant but
    # the f32 rounding differs, so allow percent-level slack here
    dev = float(jnp.max(jnp.abs(pf - plp))
                / jnp.maximum(jnp.max(jnp.abs(plp)), 1e-30))
    assert dev < 5e-2, f"fused/loop disagree: {dev}"
    results["poly"] = {"fused_ms": tf * 1e3, "loop_ms": tl * 1e3,
                       "speedup": tl / tf, "max_rel_dev": dev}
    print(f"  fused {tf * 1e3:9.1f} ms   per-line loop {tl * 1e3:9.1f} ms"
          f"   -> {tl / tf:.2f}x (agree to {dev:.1e})")


def _slab_scene(dtype=F32):
    front = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=dtype)
    back = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=1,
                           mat_out=0, dtype=dtype)
    tgt = SegmentSet.make([[60.0, -900.0]], [[60.0, 900.0]], dtype=dtype)
    scene = Scene2D.build(optical_segments=[front, back],
                          target_segments=[tgt])
    return scene, (mats.vacuum, mats.acrylic)


def bench_reactions(results, n=1 << 20, bounces=8, reps=4):
    print(f"-- field-tracker reaction cost (N={n:,} rays, {bounces} "
          "bounces, 2-surface slab, f32) --")
    scene, materials = _slab_scene()
    rng = np.random.default_rng(3)
    p0 = np.zeros((n, 2), np.float32)
    p0[:, 1] = rng.uniform(-40, 40, n)
    th = rng.uniform(-0.9, 0.9, n).astype(np.float32)
    p1 = p0 + np.stack([np.cos(th), np.sin(th)], 1)
    base = RaySet.make(jnp.asarray(p0), jnp.asarray(p1), 550.0, dtype=F32)
    rays = seed_roulette(base).with_field("intensity",
                                          jnp.ones(n, F32))
    cfg = TraceConfig(max_bounces=bounces)
    nf, d4 = 1.38, 99.6  # quarter-wave-ish MgF2 at 550nm, thickness in nm
    variants = {
        "default": default_reaction,
        "fresnel_intensity": fresnel_intensity_reaction(),
        "thinfilm_1layer": thin_film_intensity_reaction(
            [[(nf, d4)]], {"segments": np.asarray([0, 0, -1])}),
        "thinfilm_4layer": thin_film_intensity_reaction(
            [[(nf, d4), (2.35, 60.0), (nf, d4), (2.35, 60.0)]],
            {"segments": np.asarray([0, 0, -1])}),
        "russian_roulette": fresnel_intensity_reaction(
            base_reaction=russian_roulette_reaction(jax.random.PRNGKey(0))),
    }
    t0 = None
    for name, rx in variants.items():
        fn = jax.jit(lambda rx=rx: trace(rays, scene, materials, cfg,
                                         reaction=rx).rays.p1)
        t, _ = timed(fn, reps)
        if t0 is None:
            t0 = t
        results[f"reactions/{name}"] = {"ms": t * 1e3,
                                        "vs_default": t / t0}
        print(f"  {name:18s} {t * 1e3:9.1f} ms   ({t / t0:.2f}x default)")


SECTIONS = {"segsum": bench_segsum, "psf": bench_psf, "poly": bench_poly,
            "reactions": bench_reactions}


def main(sections=None, tiny=False, emit_json=False):
    dev = jax.devices()[0]
    print(f"device: {dev} platform={dev.platform}")
    results = {}
    kw = {}
    if tiny:  # CI harness check only — numbers are meaningless here
        kw = {
            "segsum": dict(n=4096, k=5, reps=2, ms_list=(64,)),
            "psf": dict(n=2048, g=64, chunk=512, reps=1),
            "poly": dict(n=1024, g=64, k_lines=3, chunk=256, reps=1),
            "reactions": dict(n=512, bounces=4, reps=1),
        }
    for name in sections or SECTIONS:
        SECTIONS[name](results, **kw.get(name, {}))
    print("TPU_PHYSICS_BENCH OK")
    if emit_json:
        print("PHYSICS_JSON " + json.dumps(results))
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("sections", nargs="*", choices=list(SECTIONS) + [[]])
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--json", action="store_true")
    a = ap.parse_args()
    main(a.sections or None, tiny=a.tiny, emit_json=a.json)
