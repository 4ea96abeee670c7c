"""First-order analysis: cardinal points, axial color, and an EFL solve.

The classical front end of lens design (no counterpart anywhere in the
reference, which answers every question with real-ray traces): y-nu/ABCD
tracing gives focal lengths, principal planes, image conjugates, and the
Petzval field curvature directly from the prescription — and because
``paraxial_system`` is differentiable, first-order TARGETS become ordinary
terms of a jitted design loss.

This demo:
  1. prints the full first-order report of a Cooke-triplet prescription
     (EFL, cardinal points, f-number, Petzval radius, F/d/C axial color);
  2. checks the back focal point against a REAL marginal ray from the
     analytic sequential tracer (first-order theory is the small-aperture
     limit of the real trace);
  3. solves one curvature to hit a target EFL exactly, by Newton on the
     differentiable system power — the "effective-focal-length solve" of
     classical design codes, in four lines of jax.

Run:  python examples/paraxial_analysis.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    AsphereStack, axial_color, paraxial_system, petzval_sum, seidel_sums,
    trace_sequential,
)
from tensorflowraytrace_tpu.ops import materials as mats

MATERIALS = (mats.vacuum, mats.crown_glass, mats.flint_glass)

# the Cooke-triplet layout of examples/cooke_triplet.py (start prescription)
VERTEX_Z = [0.0, 0.55, 1.45, 1.85, 2.75, 3.15]
MAT_AFTER = [1, 0, 2, 0, 1, 0]
CURVATURES = [0.32, -0.04, -0.30, 0.30, 0.04, -0.32]
HALF_AP = 0.62
F_LINE, D_LINE, C_LINE = 486.1, 587.6, 656.3


def build(curvatures, dtype=jnp.float64):
    return AsphereStack.make(
        vertex_z=jnp.asarray(VERTEX_Z, dtype), c=jnp.asarray(curvatures,
                                                             dtype),
        mat_after=MAT_AFTER, dtype=dtype)


def main(verbose=True):
    x64 = jax.config.jax_enable_x64
    dtype = jnp.float64 if x64 else jnp.float32
    tol = 1e-9 if x64 else 1e-4
    stack = build(CURVATURES, dtype)

    # one jitted program for the whole first-order report (eager scalar
    # chains dispatch op-by-op, which is pathological through a remote TPU
    # tunnel; the report is a single tiny fused program instead)
    @jax.jit
    def report(stack):
        s = paraxial_system(stack, MATERIALS, D_LINE)
        return (s.efl, s.back_focal_point, s.front_focal_point,
                s.front_principal_plane, s.back_principal_plane,
                petzval_sum(stack, MATERIALS, D_LINE),
                axial_color(stack, MATERIALS,
                            jnp.asarray([F_LINE, D_LINE, C_LINE], dtype)))

    (efl, bfp, ffp, pp_f, pp_b, pz, curve) = report(stack)
    efl, bfp, pz = float(efl), float(bfp), float(pz)
    curve = np.asarray(curve)
    if verbose:
        print(f"EFL (d line)              {efl:10.4f}")
        print(f"back focal point z        {bfp:10.4f}"
              f"   (BFD {bfp - VERTEX_Z[-1]:.4f})")
        print(f"front focal point z       {float(ffp):10.4f}")
        print(f"principal planes P, P'    "
              f"{float(pp_f):10.4f} {float(pp_b):10.4f}")
        print(f"working f-number          {efl / (2 * HALF_AP):10.4f}")
        print(f"Petzval radius            {-1.0 / pz:10.4f}")
        print(f"axial color F/d/C         {curve[0]:.4f} {curve[1]:.4f}"
              f" {curve[2]:.4f}  (F-C split {curve[0] - curve[2]:+.4f})")

    # --- 2. real-ray check ----------------------------------------------
    y0 = 1e-7 if x64 else 1e-3
    p = jnp.array([[0.0, y0, -1.0]], dtype)
    d = jnp.array([[0.0, 0.0, 1.0]], dtype)

    @jax.jit
    def marginal_focus(p, d, stack):
        res = trace_sequential(p, d, D_LINE, stack, MATERIALS)
        t = -res.p[0, 1] / res.d[0, 1]
        return res.p[0, 2] + t * res.d[0, 2]

    z_cross = float(marginal_focus(p, d, stack))
    assert abs(z_cross - bfp) < 100 * tol * (1 + abs(bfp)), (z_cross, bfp)
    if verbose:
        print(f"real marginal-ray focus   {z_cross:10.4f}   (matches)")

    # --- 2b. Seidel aberration table -------------------------------------
    # marginal from the axial point through the aperture edge, chief at the
    # full field through the front vertex (the stop here): the classical
    # "which surface hurts" diagram, all third-order, all differentiable.
    field = 0.05
    z_pupil = VERTEX_Z[0]
    z_start = -1.0

    @jax.jit
    def seidel(stack):
        return seidel_sums(
            stack, MATERIALS, D_LINE,
            marginal=(HALF_AP, 0.0),
            chief=(field * (z_start - z_pupil), field),
            z_start=z_start, chromatic=(F_LINE, C_LINE))

    S = seidel(stack)
    per = np.asarray(S.per_surface)
    # third-order sanity: S4 is H^2 x the Petzval sum by construction
    s4_ref = float(S.H) ** 2 * pz
    assert abs(float(S.S4) - s4_ref) < tol * (1e-3 + abs(s4_ref)), (
        float(S.S4), s4_ref)
    if verbose:
        print("\nSeidel sums (Welford), d line, full field"
              f" {field:.3f} rad:")
        print("  surf        S1         S2         S3         S4"
              "         S5         C1")
        for i in range(per.shape[0]):
            print(f"  {i + 1:4d} " + " ".join(
                f"{per[i, j]:+.3e}" for j in (0, 1, 2, 3, 4, 5)))
        print("   sum " + " ".join(
            f"{float(v):+.3e}" for v in (S.S1, S.S2, S.S3, S.S4, S.S5,
                                         S.C1)))

    # --- 3. EFL solve on the last curvature ------------------------------
    target_efl = 10.0

    def power_err(c_last):
        c = jnp.asarray(CURVATURES, dtype).at[-1].set(c_last)
        return paraxial_system(build(c, dtype), MATERIALS,
                               D_LINE).power - 1.0 / target_efl

    @jax.jit
    def solve(c_last):
        # the whole 6-step Newton solve is one fused program
        def newton(c, _):
            f, g = jax.value_and_grad(power_err)(c)
            return c - f / g, None
        c_last, _ = jax.lax.scan(newton, c_last, None, length=6)
        c = jnp.asarray(CURVATURES, dtype).at[-1].set(c_last)
        return c_last, paraxial_system(build(c, dtype), MATERIALS,
                                       D_LINE).efl

    c_last, efl_solved = solve(jnp.asarray(CURVATURES[-1], dtype))
    efl_solved = float(efl_solved)
    assert abs(efl_solved - target_efl) < tol * target_efl, efl_solved
    if verbose:
        print(f"EFL solve: c6 {float(c_last):+.5f} -> EFL"
              f" {efl_solved:.6f} (target {target_efl})")
    return efl, bfp, efl_solved


if __name__ == "__main__":
    main()
