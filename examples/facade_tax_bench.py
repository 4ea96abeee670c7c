"""Benchmark: the stateful-facade tax vs the jitted functional trace.

Reproduces the docs/notes.md "facade tax" row.  The facade
(`system.OpticalEngine`, object-for-object parity with reference
tfrt/engine.py:2311) wraps the functional core; this measures what that
wrapping costs on the same 2D light-guide scene, four ways:

  functional        one jitted `trace` call on a prebuilt (rays, scene)
  facade ray_trace  engine.ray_trace only (scene already up to date) --
                    since r5 this jit-caches the functional trace per
                    (materials, config, reaction), so it should be ~1x
  facade step       system.update() [re-sample the random source, rebuild
                    the amalgamated scene host-side] + engine.ray_trace --
                    the reference's per-optimization-step usage pattern
  facade jit=False  the pre-r5 eager op-by-op dispatch (the raw tax)

Measured on v5e (131k rays x 12 bounces, f32): 39.9 ms / 1.01x / 6.2x /
62x.  The residual 6.2x of the step pattern is HOST work inside update(),
which is inherent to the stateful API -- sustained training belongs on the
functional `optim.Optimizer` (docs/api.md "Functional vs facade").

Run:  python examples/facade_tax_bench.py
"""
import math
import os
import time

import jax

if __name__ == "__main__":
    os.makedirs(os.path.expanduser("~/.jax_bench_cache"), exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.jax_bench_cache"))

import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import SegmentSet, trace
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.system import OpticalEngine, OpticalSystem2D

PI = math.pi
N_RAYS = 1 << 17
BOUNCES = 12


def build(dtype):
    # the light-guide facade scene of tests/test_engine.py, at bench scale
    guide = SegmentSet.make(
        [[-0.1, -4.0], [0.0, 4.0], [0.1, -4.0]],
        [[0.0, 4.0], [0.1, -4.0], [-0.1, -4.0]],
        mat_in=1, mat_out=0, dtype=dtype)
    exitp = SegmentSet.make([[-0.3, 4.2]], [[0.3, 4.2]], dtype=dtype)
    angles = dist.RandomLambertianAngularDistribution(-0.3 * PI, 0.3 * PI,
                                                      N_RAYS)
    beam = dist.RandomUniformBeam(-0.09, 0.09, N_RAYS)
    source = src.AngularSource(2, (0.0, -3.999), PI / 2, angles, beam,
                               [575.0] * N_RAYS, dense=False)
    system = OpticalSystem2D(dtype=dtype)
    system.optical_segments = [guide]
    system.target_segments = [exitp]
    system.sources = [source]
    system.materials = [{"n": mats.vacuum}, {"n": mats.acrylic}]
    system.update()
    return system


def timeit(f, reps=10):
    f()  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    dtype = jnp.float32
    system = build(dtype)
    engine = OpticalEngine(2)
    engine.optical_system = system
    eager = OpticalEngine(2, jit=False)
    eager.optical_system = system

    def sync(res):
        _ = np.asarray(res.rays.p1[:4])  # forced host fetch

    # functional: prebuilt scene + rays, one jitted call
    rays = system.sources
    scene = system.scene
    materials = system.material_callables()
    cfg = engine.trace_config(BOUNCES)

    fn = jax.jit(lambda r, s: trace(r, s, materials, cfg))
    t_fn = timeit(lambda: sync(fn(rays, scene)))

    # facade (jit cache), scene already current
    t_facade = timeit(lambda: sync(engine.ray_trace(BOUNCES)))

    # facade per-step pattern: update (re-sample source, re-amalgamate
    # boundaries) + ray_trace
    def step():
        system.update()
        sync(engine.ray_trace(BOUNCES))

    t_step = timeit(step)

    # legacy eager facade (jit=False): op-by-op dispatch
    t_eager = timeit(lambda: sync(eager.ray_trace(BOUNCES)), reps=3)

    print(f"rays={N_RAYS}, bounces={BOUNCES}, "
          f"platform={jax.devices()[0].platform}, dtype=f32")
    print(f"functional jitted trace:       {t_fn*1e3:8.1f} ms")
    print(f"facade ray_trace (jit cache):  {t_facade*1e3:8.1f} ms "
          f"({t_facade/t_fn:.2f}x)")
    print(f"facade update()+ray_trace:     {t_step*1e3:8.1f} ms "
          f"({t_step/t_fn:.2f}x)")
    print(f"facade ray_trace (jit=False):  {t_eager*1e3:8.1f} ms "
          f"({t_eager/t_fn:.2f}x)")


if __name__ == "__main__":
    main()
