"""Fresnel intensity tracking: a differentiable illumination map.

Beyond the reference (tfrt carries no per-ray power): every refraction
attenuates the continuing ray's ``intensity`` field by the unpolarized
Fresnel transmittance of the branch it took (TIR and mirrors are lossless),
via the engine's field-update reaction protocol
(``operations.fresnel_intensity_reaction``).  This demo:

* traces a diverging fan through a plano-convex lens (two interfaces);
* histograms the target plane twice -- ray COUNT vs ray POWER -- showing
  the oblique rays' extra Fresnel loss darken the screen edges;
* prints the total transmitted power fraction and checks it against the
  normal-incidence bound;
* differentiates total delivered power w.r.t. the lens radius: the Fresnel
  factors participate in gradients, so power-delivery objectives can drive
  design.

Run:  python examples/fresnel_intensity.py [--rays N]
"""

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.analysis import histogram2d
from tensorflowraytrace_tpu.models.surfaces import ArcSet
from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi


def build_scene(radius, dtype):
    """Flat entry face + convex exit arc (plano-convex), target screen."""
    entry = SegmentSet.make([[0.0, -3.0]], [[0.0, 3.0]], mat_in=1, mat_out=0,
                            dtype=dtype)
    exit_arc = ArcSet.make(
        jnp.stack([jnp.stack([1.0 - radius, jnp.zeros_like(radius)])]),
        -PI / 3, PI / 3, radius, mat_in=0, mat_out=1, dtype=dtype)
    screen = SegmentSet.make([[14.0, -30.0]], [[14.0, 30.0]], dtype=dtype)
    return Scene2D.build(optical_segments=[entry], optical_arcs=[exit_arc],
                         target_segments=[screen])


def main(rays=2000, show=False):
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    n_glass = 1.52
    materials = (mats.vacuum, mats.build_constant_material(n_glass))
    cfg = TraceConfig(max_bounces=3)
    reaction = fresnel_intensity_reaction()

    # diverging fan from a point source left of the lens
    angles = np.linspace(-0.5, 0.5, rays)
    p0 = np.full((rays, 2), [-2.0, 0.0])
    p1 = p0 + np.stack([np.cos(angles), np.sin(angles)], axis=1)
    ray_set = RaySet.make(jnp.asarray(p0, dtype), jnp.asarray(p1, dtype),
                          550.0, fields={"intensity": jnp.ones(rays, dtype)},
                          dtype=dtype)

    res = trace(ray_set, build_scene(jnp.asarray(8.0, dtype), dtype),
                materials, cfg, reaction=reaction)
    fin = np.asarray(res.rays.state == FINISHED)
    inten = np.asarray(res.rays.fields["intensity"])
    power = float(inten[fin].sum()) / rays
    print(f"{fin.sum()}/{rays} rays reach the screen carrying "
          f"{power:.4f} of the emitted power")
    # two interfaces at >= normal-incidence loss each
    T0 = 1.0 - ((1.0 - n_glass) / (1.0 + n_glass)) ** 2
    assert power <= T0 * T0 * (fin.sum() / rays) + 1e-9
    assert power > 0.5 * fin.sum() / rays

    rng = ((13.9, 14.1), (-12.0, 12.0))
    counts = histogram2d(res.rays.p1[:, 0], res.rays.p1[:, 1], rng, 1, 48,
                         weights=jnp.asarray(fin, dtype))
    powers = histogram2d(res.rays.p1[:, 0], res.rays.p1[:, 1], rng, 1, 48,
                         weights=jnp.asarray(fin, dtype) * res.rays.fields["intensity"])
    # histogram2d returns (y_bins, x_bins) with y on axis 0; take the
    # single-x-bin column = the screen's y profile
    counts = np.asarray(counts)[:, 0]
    powers = np.asarray(powers)[:, 0]
    occupied = counts > 0
    ratio = powers[occupied] / counts[occupied]
    print(f"per-bin power/count ratio: center {ratio[len(ratio)//2]:.4f}, "
          f"edges {ratio[0]:.4f} / {ratio[-1]:.4f}")
    # oblique rays land toward the screen edges with extra Fresnel loss
    assert ratio[0] <= ratio[len(ratio) // 2] + 1e-9
    assert ratio[-1] <= ratio[len(ratio) // 2] + 1e-9

    # power delivery is differentiable in the lens shape
    def delivered(radius):
        r = trace(ray_set, build_scene(radius, dtype), materials, cfg,
                  reaction=reaction)
        ok = r.rays.state == FINISHED
        return jnp.sum(jnp.where(ok, r.rays.fields["intensity"], 0.0))

    g = float(jax.grad(delivered)(jnp.asarray(8.0, dtype)))
    print(f"d(delivered power)/d(exit radius) = {g:.6f}")
    assert np.isfinite(g)

    if show:  # pragma: no cover
        import matplotlib.pyplot as plt

        plt.bar(np.linspace(-12, 12, 48), powers, width=0.5)
        plt.xlabel("screen y")
        plt.ylabel("power")
        plt.show()
    return power


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2000)
    ap.add_argument("--show", action="store_true")
    a = ap.parse_args()
    main(rays=a.rays, show=a.show)
