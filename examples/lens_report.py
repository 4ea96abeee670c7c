"""The classical lens-design REPORT, end to end, on one prescription.

Every production lens-design tool prints this page for a finished (or
in-progress) design; this example produces it with the analytic
sequential tracer + the first-order/third-order/diffraction layers, all
from ONE shared prescription pytree:

1. first-order: EFL, back focal point, f/number, entrance/exit pupils
   (``paraxial_system`` + ``solve_stop``);
2. the per-surface Seidel table S1..S5 / C1 / C2 (which surface hurts);
3. real-ray field curves: tangential/sagittal astigmatic field plot and
   the distortion curve (``field_curves``);
4. chromatic: axial color at the F/d/C lines and lateral color at the
   full field (``axial_color`` / ``lateral_color``);
5. real-ray RMS spot radii per field at the d line;
6. physical optics: on-axis Huygens PSF at the paraxial focus and the
   MTF curve from it (``analysis.huygens_psf`` + ``analysis.mtf_at``).

The reference framework answers only #5's kind of question (trace, then
histogram landings -- /root/reference/tfrt/analyze.py); items 1-4 and 6
are the beyond-reference classical/diffraction workflow.  Every number on
the page is differentiable in the prescription, so ANY line of this
report can be turned into a design constraint.

Run:  python examples/lens_report.py          (writes lens_report.png)
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    AsphereStack, axial_color, collimated_bundle, field_curves,
    lateral_color, paraxial_system, seidel_sums, solve_stop,
    trace_sequential,
)
from tensorflowraytrace_tpu.analysis import huygens_psf, mtf_at
from tensorflowraytrace_tpu.ops import materials as mats

MATERIALS = (mats.vacuum, mats.crown_glass, mats.flint_glass)

# the Cooke-triplet layout of examples/cooke_triplet.py (its symmetric
# starting prescription: visibly aberrated, so the curves have content)
VERTEX_Z = [0.0, 0.55, 1.45, 1.85, 2.75, 3.15]
MAT_AFTER = [1, 0, 2, 0, 1, 0]
CURVATURES = [0.32, -0.04, -0.30, 0.30, 0.04, -0.32]
STOP_INDEX = 2                       # the flint front face is the stop
STOP_SEMI_AP = 0.45
MAX_FIELD = 0.05                     # radians
Z_START = -1.0
WL_D, WL_F, WL_C = 587.6, 486.1, 656.3   # nm; scene units are mm


def build_stack(dtype):
    return AsphereStack.make(
        vertex_z=jnp.asarray(VERTEX_Z, dtype),
        c=jnp.asarray(CURVATURES, dtype),
        mat_after=MAT_AFTER, dtype=dtype)


def spot_rms(stack, z_image, n_rays, dtype, field, wl=WL_D):
    p, d = collimated_bundle(n_rays, STOP_SEMI_AP, z_start=Z_START,
                             field_angle=field, grid="hex", dtype=dtype)
    res = trace_sequential(p, d, wl, stack, MATERIALS, image_z=z_image)
    pts = np.asarray(res.landing)[np.asarray(res.alive)]
    c = pts.mean(0)
    return float(np.sqrt(((pts - c) ** 2).sum(1).mean())), pts


def onaxis_psf_mtf(stack, z_image, psf_rays, grid_pts, dtype, verbose,
                   f_no=None):
    """On-axis Huygens PSF on a square image-plane patch + its MTF."""
    p, d = collimated_bundle(psf_rays, STOP_SEMI_AP, z_start=Z_START,
                             grid="hex", dtype=dtype)
    res = trace_sequential(p, d, WL_D, stack, MATERIALS)  # stop at last surf
    lam = WL_D * 1e-6                      # mm
    # window: cover the geometric spot plus a few diffraction lobes
    rms, _ = spot_rms(stack, z_image, min(psf_rays, 512), dtype, 0.0)
    half = float(max(4.0 * rms, 30.0 * lam))
    ax = np.linspace(-half, half, grid_pts)
    gx, gy = np.meshgrid(ax, ax)
    grid = jnp.asarray(
        np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z_image)], 1),
        dtype)
    amp = jnp.where(res.alive, 1.0, 0.0).astype(dtype)
    psf = huygens_psf(res.p, res.opl, lam, grid, amplitudes=amp,
                      ray_chunk=1024)
    psf2d = psf.reshape(grid_pts, grid_pts)
    dx = float(ax[1] - ax[0])
    nyq = 1.0 / (2.0 * dx)
    # plot out to just past the diffraction cutoff 1/(lambda f#)
    f_max = 0.9 * nyq if f_no is None else min(0.9 * nyq,
                                               1.15 / (lam * f_no))
    freqs = jnp.asarray(np.linspace(0.0, f_max, 32), dtype)
    mtf = mtf_at(psf2d, dx, freqs)
    if verbose:
        print(f"\nPSF window +-{half * 1e3:.1f} um, {grid_pts}x{grid_pts} "
              f"pts; MTF Nyquist {nyq:.0f} cyc/mm")
    return psf2d, ax, np.asarray(freqs), np.asarray(mtf)


def main(n_rays=2000, psf_rays=2048, grid_pts=101, n_fields=5,
         make_plot=True, verbose=True):
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    stack = build_stack(dtype)
    say = print if verbose else (lambda *a, **k: None)

    # 1. first-order ------------------------------------------------------
    sys_d = paraxial_system(stack, MATERIALS, WL_D)
    sol = solve_stop(stack, MATERIALS, WL_D, stop_index=STOP_INDEX,
                     aperture=STOP_SEMI_AP, field_angle=MAX_FIELD,
                     z_start=Z_START)
    efl = float(sys_d.efl)
    bfp = float(sys_d.back_focal_point)
    # working f/# for the infinite conjugate: 1 / (2 n' u'_marginal)
    from tensorflowraytrace_tpu import paraxial_trace
    _, us_m = paraxial_trace(sol.marginal[0], sol.marginal[1], stack,
                             MATERIALS, WL_D, z_start=Z_START)
    f_no = abs(1.0 / (2.0 * float(us_m[-1])))
    say(f"EFL {efl:.4f} mm   BFP z = {bfp:.4f} mm   f/{f_no:.2f}")
    say(f"entrance pupil z = {float(sol.entrance_pupil):.4f}   "
        f"exit pupil z = {float(sol.exit_pupil):.4f}")

    # 2. Seidel table ------------------------------------------------------
    S = seidel_sums(stack, MATERIALS, WL_D, sol.marginal, sol.chief,
                    z_start=Z_START, chromatic=(WL_F, WL_C))
    say("\nper-surface Seidel sums (x1e6):")
    say("  srf      S1      S2      S3      S4      S5      C1      C2")
    for i, row in enumerate(np.asarray(S.per_surface) * 1e6):
        say("  %3d " % (i + 1) + " ".join(f"{v:7.1f}" for v in row))
    say("  sum " + " ".join(
        f"{v * 1e6:7.1f}" for v in
        (float(S.S1), float(S.S2), float(S.S3), float(S.S4), float(S.S5),
         float(S.C1), float(S.C2))))

    # 3. field curves ------------------------------------------------------
    fields = jnp.asarray(np.linspace(0.0, MAX_FIELD, n_fields), dtype)
    fc = field_curves(stack, MATERIALS, WL_D, stop_index=STOP_INDEX,
                      aperture=STOP_SEMI_AP, field_angles=fields,
                      z_start=Z_START, rho=0.1)
    say("\nfield curves (z - paraxial image plane, um) + distortion:")
    say("  theta    tan      sag     dist%")
    for th, zt, zs, dist in zip(np.asarray(fields),
                                np.asarray(fc.tangential),
                                np.asarray(fc.sagittal),
                                np.asarray(fc.distortion)):
        say(f"  {th:.3f} {1e3 * (zt - bfp):8.2f} {1e3 * (zs - bfp):8.2f}"
            f" {100 * dist:8.4f}")

    # 4. chromatic ---------------------------------------------------------
    wls = jnp.asarray([WL_F, WL_D, WL_C], dtype)
    ax_col = np.asarray(axial_color(stack, MATERIALS, wls))
    lat_col = np.asarray(lateral_color(stack, MATERIALS, wls, sol.chief,
                                       Z_START, bfp))
    say(f"\naxial color F-C: {1e3 * (ax_col[0] - ax_col[2]):.2f} um"
        f"   lateral color F-C: {1e3 * (lat_col[0] - lat_col[2]):.3f} um")

    # 5. real-ray spots ----------------------------------------------------
    say("\nRMS spot radius (d line, um):")
    spots = {}
    for th in np.asarray(fields):
        rms, pts = spot_rms(stack, bfp, n_rays, dtype, float(th))
        spots[float(th)] = (rms, pts)
        say(f"  theta {th:.3f}: {1e3 * rms:8.2f}")

    # 6. PSF + MTF ---------------------------------------------------------
    psf2d, psf_ax, freqs, mtf = onaxis_psf_mtf(
        stack, bfp, psf_rays, grid_pts, dtype, verbose, f_no=f_no)
    say("MTF (on-axis, d line): " + "  ".join(
        f"{f:.0f}cyc/mm={m:.3f}" for f, m in
        zip(freqs[:: len(freqs) // 4], mtf[:: len(freqs) // 4])))
    assert abs(float(mtf[0]) - 1.0) < 1e-9

    if make_plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        a = axes[0, 0]
        a.plot(1e3 * (np.asarray(fc.tangential) - bfp), np.asarray(fields),
               "-o", label="tangential")
        a.plot(1e3 * (np.asarray(fc.sagittal) - bfp), np.asarray(fields),
               "-s", label="sagittal")
        a.set_xlabel("focus shift (um)")
        a.set_ylabel("field (rad)")
        a.set_title("astigmatic field curves")
        a.legend()
        a = axes[0, 1]
        a.plot(100 * np.asarray(fc.distortion), np.asarray(fields), "-o")
        a.set_xlabel("distortion (%)")
        a.set_title("distortion")
        a = axes[1, 0]
        for th, (rms, pts) in spots.items():
            c = pts.mean(0)
            a.plot(1e3 * (pts[:, 0] - c[0]), 1e3 * (pts[:, 1] - c[1]), ".",
                   ms=1, label=f"{th:.3f} rad")
        a.set_xlabel("um")
        a.set_aspect("equal")
        a.set_title("spot diagrams (centroid-relative)")
        a.legend(markerscale=8, fontsize=7)
        a = axes[1, 1]
        a.plot(freqs, mtf, "-")
        a.set_xlabel("spatial frequency (cycles/mm)")
        a.set_ylabel("MTF")
        a.set_ylim(0, 1.02)
        a.set_title("on-axis MTF (d line)")
        fig.tight_layout()
        fig.savefig("lens_report.png", dpi=110)
        say("\nwrote lens_report.png")

    return {"efl": efl, "bfp": bfp, "f_no": f_no,
            "seidel": S, "field_curves": fc,
            "axial_color": ax_col, "lateral_color": lat_col,
            "spots": {k: v[0] for k, v in spots.items()},
            "mtf": (freqs, mtf)}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rays", type=int, default=2000)
    ap.add_argument("--psf-rays", type=int, default=2048)
    ap.add_argument("--grid-pts", type=int, default=101)
    args = ap.parse_args()
    main(n_rays=args.n_rays, psf_rays=args.psf_rays,
         grid_pts=args.grid_pts)
