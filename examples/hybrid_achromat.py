"""Hybrid refractive-metasurface achromat, co-designed by gradient descent.

Glass disperses one way (n falls with wavelength: red focuses LONG);
metasurfaces disperse the other (the phase kick scales with wavelength: red
focuses SHORT).  A crown singlet with a quadratic metasurface corrector on
its exit face can therefore cancel primary chromatic aberration -- and
because `operations.metasurface_reaction` differentiates through the phase
profile's parameters, the cancellation is FOUND by gradient descent on the
polychromatic spot, co-optimizing glass curvature and phase coefficient in
the same step (no reference counterpart; tfrt has neither metasurfaces nor
cross-wavelength objectives).

Layout: collimated F/d/C-line beams -> crown-glass arc (curvature c1) ->
flat exit face carrying phase c_m2 y^2 + c_m4 y^4 (the quartic term also
soaks up spherical aberration) -> screen.  Control: the same optimizer run
with the metasurface frozen at zero (a curvature-only singlet), which the
hybrid run warm-starts from.  Printed: per-line RMS spot and the
polychromatic RMS, hybrid vs refractive-only.

Run:  python examples/hybrid_achromat.py [--steps N] [--n-heights N]
"""

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.models.surfaces import ArcSet
from tensorflowraytrace_tpu.operations import metasurface_reaction
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
F_LINE, D_LINE, C_LINE = 486.1, 587.6, 656.3
LINES = (F_LINE, D_LINE, C_LINE)
SCREEN_X = 15.0
APERTURE = 1.0
X_FLAT = 0.5


def build_scene(c1, dtype):
    """Entry arc (vacuum -> crown, curvature c1) + flat exit + screen."""
    # softplus keeps the curvature strictly positive WITH gradient flow --
    # a hard clip lets the optimizer push c1 out of range and strands it on
    # a zero-gradient plateau (observed: meta-only local minimum)
    c1 = jax.nn.softplus(c1 * 20.0) / 20.0 + 1.0 / 500.0
    r1 = 1.0 / jnp.minimum(c1, 1.0 / 3.0)
    cx = jnp.asarray(0.0, dtype) + r1  # bulges toward -x
    center = jnp.stack([jnp.stack([cx, jnp.zeros_like(cx)])])
    s1 = ArcSet.make(center, 3 * PI / 4, 5 * PI / 4, r1, mat_in=1,
                     mat_out=0, dtype=dtype)
    flat = SegmentSet.make([[X_FLAT, -3.0]], [[X_FLAT, 3.0]], mat_in=0,
                           mat_out=1, dtype=dtype)
    screen = SegmentSet.make([[SCREEN_X, -6.0]], [[SCREEN_X, 6.0]],
                             dtype=dtype)
    return Scene2D.build(optical_arcs=[s1], optical_segments=[flat],
                         target_segments=[screen])


def make_rays(n_heights, dtype):
    ys = np.linspace(-APERTURE, APERTURE, n_heights)
    ys = ys[np.abs(ys) > 1e-9]  # skip the axial ray (zero signal)
    n = len(ys) * len(LINES)
    p0 = np.stack([np.full(n, -1.0),
                   np.tile(ys, len(LINES))], axis=1)
    wl = np.repeat(LINES, len(ys))
    rays = RaySet.make(jnp.asarray(p0, dtype),
                       jnp.asarray(p0 + [1.0, 0.0], dtype),
                       jnp.asarray(wl, dtype), dtype=dtype)
    return rays, jnp.asarray(wl, dtype)


def trace_landings(params, rays, dtype, use_meta=True):
    c1, cm2, cm4 = params
    scene = build_scene(c1, dtype)
    phase = (lambda p, w: cm2 * p[1] ** 2 + cm4 * p[1] ** 4)
    rx = metasurface_reaction(
        [(phase, "transmission")] if use_meta else [],
        {"segments": jnp.asarray([0, -1])})
    res = trace(rays, scene, (mats.vacuum, mats.crown_glass),
                TraceConfig(max_bounces=3), reaction=rx)
    return res.rays.p1[:, 1], res.rays.state


def optimize(rays, dtype, use_meta, steps, q0=None):
    import optax

    def loss(q):
        y, _ = trace_landings((q[0], q[1] * 1e-4, q[2] * 1e-4), rays, dtype,
                              use_meta=use_meta)
        return jnp.mean(y * y)

    if q0 is None:
        q0 = jnp.asarray([1.0 / 14.0, 0.0, 0.0], dtype)
    q = jnp.asarray(q0, dtype)
    tx = optax.adam(5e-3)
    state = tx.init(q)
    vg = jax.jit(jax.value_and_grad(loss))
    mask = jnp.asarray([True, use_meta, use_meta])

    @jax.jit
    def step(q, state):
        v, g = vg(q)
        g = jnp.where(mask, g, 0.0)
        upd, state = tx.update(g, state, q)
        return optax.apply_updates(q, upd), state, v

    for i in range(steps):
        q, state, v = step(q, state)
        if i % max(1, steps // 6) == 0:
            print(f"    step {i:4d}  loss {float(v):.3e}  c1 "
                  f"{float(q[0]):.5f}  c_m2 {float(q[1]) * 1e-4:.3e}  "
                  f"c_m4 {float(q[2]) * 1e-4:.3e}")
    return q


def report(tag, params, rays, wl, dtype, use_meta):
    y, state = trace_landings(params, rays, dtype, use_meta=use_meta)
    y = np.asarray(y)
    ok = np.asarray(state) == FINISHED
    spots = []
    for line in LINES:
        sel = ok & (np.asarray(wl) == line)
        spots.append(float(np.sqrt(np.mean(y[sel] ** 2))))
    spread = max(spots) - min(spots)
    print(f"  {tag}: RMS spot per line (F/d/C) = "
          f"{spots[0]:.4f} / {spots[1]:.4f} / {spots[2]:.4f}; "
          f"poly RMS {np.sqrt(np.mean(y[ok] ** 2)):.4f}")
    return float(np.sqrt(np.mean(y[ok] ** 2))), spread


def main(steps=600, n_heights=13):
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    rays, wl = make_rays(n_heights, dtype)

    print("refractive-only control (curvature only):")
    q_ref = optimize(rays, dtype, use_meta=False, steps=steps)
    print("hybrid (curvature + metasurface y^2/y^4 coefficients), "
          "warm-started from the control:")
    q_hyb = optimize(rays, dtype, use_meta=True, steps=steps, q0=q_ref)

    ref_rms, _ = report("refractive",
                        (q_ref[0], q_ref[1] * 1e-4, q_ref[2] * 1e-4),
                        rays, wl, dtype, use_meta=False)
    hyb_rms, _ = report("hybrid    ",
                        (q_hyb[0], q_hyb[1] * 1e-4, q_hyb[2] * 1e-4),
                        rays, wl, dtype, use_meta=True)
    gain = ref_rms / hyb_rms
    print(f"polychromatic RMS spot: {ref_rms:.4f} -> {hyb_rms:.4f} "
          f"({gain:.1f}x smaller with the metasurface corrector)")
    assert gain > 2.0
    print("OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--n-heights", type=int, default=13)
    a = ap.parse_args()
    main(steps=a.steps, n_heights=a.n_heights)
