"""Stray-light analysis: rough housing walls + black-paint absorptivity.

Beyond the reference (perfectly smooth lossless surfaces only): a lens in
a barrel whose walls SCATTER (`operations.rough_surface_reaction`, a
Monte-Carlo Gaussian lobe) and ABSORB (`operations.
surface_absorber_reaction`, per-surface absorptivity), the standard
stray-light questions:

* how much off-axis power reaches the detector OUTSIDE the nominal image
  (ghost fraction), as a function of wall roughness, and
* how much black paint (absorptivity) it takes to knock the ghosts down.

The trace composes both trackers; ensembles over scatter keys are vmapped.

Run:  python examples/stray_light.py [--rays N]
"""

import argparse
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.models.surfaces import ArcSet
from tensorflowraytrace_tpu.operations import (
    rough_surface_reaction, seed_scatter, surface_absorber_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
N_GLASS = 1.5
DET_X = 8.0
IMAGE_HALF = 0.6  # nominal image region on the detector


def build_scene(dtype):
    """Biconvex lens at x~1, barrel walls at y = +-1, detector at x=8.
    Wall normals face the barrel interior (mirror sentinel reflects
    external hits on the n_in == 0 side)."""
    r = 4.0
    th = math.asin(0.95 / r)
    front = ArcSet.make([[1.0 + r, 0.0]], [PI - th], [PI + th], [r],
                        mat_in=1, mat_out=0, dtype=dtype)
    back = ArcSet.make([[1.4 - r, 0.0]], [-th], [th], [r],
                       mat_in=1, mat_out=0, dtype=dtype)
    top = SegmentSet.make([[7.5, 1.0]], [[0.0, 1.0]], mat_in=2, mat_out=0,
                          dtype=dtype)
    bot = SegmentSet.make([[0.0, -1.0]], [[7.5, -1.0]], mat_in=2, mat_out=0,
                          dtype=dtype)
    det = SegmentSet.make([[DET_X, -3.0]], [[DET_X, 3.0]], dtype=dtype)
    scene = Scene2D.build(optical_arcs=[front, back],
                          optical_segments=[top, bot],
                          target_segments=[det])
    materials = (mats.vacuum, mats.build_constant_material(N_GLASS),
                 mats.reflective)
    return scene, materials


def ghost_fraction(sigma, absorptivity, key, rays0, scene, materials):
    # walls are merged segments [top, bot, det]; arcs [front, back]
    rough_ids = {"segments": jnp.asarray([0, 0, -1])}
    absorb = {"segments": jnp.asarray([absorptivity, absorptivity, 0.0])}
    rx = surface_absorber_reaction(
        absorb, base_reaction=rough_surface_reaction(
            [sigma], rough_ids, key))
    res = trace(rays0, scene, materials,
                TraceConfig(max_bounces=12), reaction=rx)
    ok = res.rays.state == FINISHED
    y = res.rays.p1[:, 1]
    power = res.rays.fields["intensity"]
    # wall-mediated ghosts: outside the nominal image AND scattered more
    # than the two lens interactions (scatter_ctr counts every reaction)
    ghost = ok & (jnp.abs(y) > IMAGE_HALF) & (
        res.rays.fields["scatter_ctr"] > 2)
    return jnp.sum(jnp.where(ghost, power, 0.0)) / rays0.n_rays


def main(rays=4000):
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    scene, materials = build_scene(dtype)
    rng = np.random.default_rng(0)
    # a wide fan: many rays miss the lens and hit the barrel
    ys = rng.uniform(-0.95, 0.95, rays)
    ang = rng.uniform(-0.35, 0.35, rays)
    p0 = np.stack([np.full(rays, -0.5), ys], axis=1)
    d = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    r0 = RaySet.make(jnp.asarray(p0, dtype), jnp.asarray(p0 + d, dtype),
                     550.0, dtype=dtype)
    r0 = dataclasses.replace(
        seed_scatter(r0),
        fields={**seed_scatter(r0).fields,
                "intensity": jnp.ones(rays, dtype)})

    gf = jax.jit(lambda s, a, k: ghost_fraction(s, a, k, r0, scene,
                                                materials))
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    print("wall-mediated ghost power per launched ray "
          "(4-key Monte-Carlo mean):")
    results = {}
    for sigma in (0.0, 0.05, 0.2):
        for absorb in (0.0, 0.9):
            vals = [float(gf(sigma, absorb, k)) for k in keys]
            results[(sigma, absorb)] = float(np.mean(vals))
            print(f"  wall sigma {sigma:4.2f}  absorptivity {absorb:3.1f}"
                  f"  -> ghost power {results[(sigma, absorb)]:.4f}")

    # physics sanity: wall-mediated ghost power exists, and black paint
    # (0.9 absorptivity per wall hit) suppresses it hard
    assert results[(0.2, 0.0)] > 0.0
    assert results[(0.2, 0.9)] < 0.3 * results[(0.2, 0.0)]
    assert results[(0.0, 0.9)] < 0.3 * results[(0.0, 0.0)]
    print("OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=4000)
    a = ap.parse_args()
    main(rays=a.rays)
