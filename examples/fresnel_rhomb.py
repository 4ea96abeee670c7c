"""Design a Fresnel rhomb by gradient descent on the traced polarization.

Beyond the reference (tfrt carries no polarization): rays here transport
complex s/p Jones amplitudes (``operations.jones_polarization_reaction``),
so TIR phase shifts are differentiable quantities.  A Fresnel rhomb turns
45-degree linear light into circular light using two total internal
reflections whose combined relative phase is 90 degrees -- the classic
achromatic quarter-wave device (no birefringence needed).

This demo:

* traces one ray through a two-TIR glass channel whose geometry is a pure
  function of the internal incidence angle ``theta``;
* optimizes ``theta`` by gradient descent so the emerging Stokes vector is
  circular (``S2 -> 0`` with equal s/p powers, i.e. |S3| -> 1);
* checks the converged angle against the textbook root of
  ``delta(theta) = 45 deg`` for n = 1.5 (~50.2 or ~53.3 degrees).

Run:  python examples/fresnel_rhomb.py [--steps N]
"""

import argparse
import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import RaySet, Scene2D, SegmentSet, TraceConfig, trace
from tensorflowraytrace_tpu.operations import (
    jones_polarization_reaction, seed_polarization, stokes_parameters,
)
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
N_GLASS = 1.5


def tir_phase(theta):
    """Analytic relative TIR phase delta_s - delta_p at internal incidence
    theta (eta = n_glass against vacuum)."""
    b = np.sqrt(N_GLASS ** 2 * np.sin(theta) ** 2 - 1.0)
    ds = -2.0 * np.arctan2(b, N_GLASS * np.cos(theta))
    dp = -2.0 * np.arctan2(N_GLASS * b, np.cos(theta))
    return ds - dp


def traced_stokes(theta, materials, dtype):
    """Build the two-TIR channel for incidence angle theta (glass between
    y = -1 and y = +1; one short wall patch per bounce so the ray makes
    exactly two TIRs) and return the emerging Stokes parameters.  The whole
    geometry is a traced function of theta, so gradients flow through both
    the launch direction and the wall placement."""
    climb = PI / 2 - theta
    t = jnp.tan(climb)
    x1 = 1.0 / t
    x2 = x1 + 2.0 / t
    one = jnp.ones((), dtype)

    def seg(xc, y, mat_in, mat_out):
        p0 = jnp.stack([jnp.stack([xc - 0.5, y * one])])
        p1 = jnp.stack([jnp.stack([xc + 0.5, y * one])])
        return SegmentSet.make(p0, p1, mat_in=mat_in, mat_out=mat_out,
                               dtype=dtype)

    # both wall norms point +y: the top wall's glass side is mat_in, the
    # bottom wall's is mat_out
    scene = Scene2D.build(optical_segments=[
        seg(x1, 1.0, mat_in=1, mat_out=0),
        seg(x2, -1.0, mat_in=0, mat_out=1),
    ])
    d = jnp.stack([jnp.cos(climb), jnp.sin(climb)])[None, :]
    rays = RaySet.make(jnp.zeros((1, 2), dtype), d.astype(dtype), 550.0,
                       dtype=dtype)
    rays = seed_polarization(rays, jones=(1 / math.sqrt(2), 1 / math.sqrt(2)))
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=jones_polarization_reaction())
    return stokes_parameters(res.rays)


def main(steps=150, lr=0.03, theta0=0.80):
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    materials = (mats.vacuum, mats.build_constant_material(N_GLASS))

    crit = math.asin(1.0 / N_GLASS)
    print(f"critical angle: {math.degrees(crit):.2f} deg; "
          f"start: {math.degrees(theta0):.2f} deg")

    @jax.jit
    def loss_fn(theta):
        s = traced_stokes(theta, materials, dtype)
        # circular <=> no linear component; S1 == 0 by construction (TIR
        # preserves |Es| = |Ep|), so the objective is S2^2
        return (s["S2"][0] / s["S0"][0]) ** 2

    vag = jax.jit(jax.value_and_grad(loss_fn))
    theta = jnp.asarray(theta0, dtype)
    for i in range(steps):
        loss, g = vag(theta)
        theta = theta - lr * g
        if i % max(1, steps // 6) == 0:
            print(f"step {i:4d}  loss {float(loss):.3e}  "
                  f"theta {math.degrees(float(theta)):.4f} deg")

    s = jax.jit(lambda t: traced_stokes(t, materials, dtype))(theta)
    s0, s1 = float(s["S0"][0]), float(s["S1"][0])
    s2, s3 = float(s["S2"][0]), float(s["S3"][0])
    delta = tir_phase(float(theta))
    print(f"converged theta = {math.degrees(float(theta)):.4f} deg; "
          f"per-bounce TIR phase = {math.degrees(delta):.4f} deg")
    print(f"Stokes out: S0={s0:.6f} S1={s1:.2e} S2={s2:.2e} S3={s3:.6f}")

    # textbook: per-bounce phase is 45 deg, output is circular
    assert abs(abs(delta) - PI / 4) < 2e-3, delta
    assert abs(s2) < 5e-3 and abs(abs(s3) / s0 - 1.0) < 1e-4
    print("OK: two TIRs at the designed angle produce circular polarization")
    return float(theta)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=0.03)
    a = ap.parse_args()
    main(steps=a.steps, lr=a.lr)
