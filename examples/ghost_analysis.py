"""Ghost-image analysis of a coated lens: enumerate the branch tree.

The classic stray-light question for any lens with partially reflective
surfaces: where do the DOUBLE-BOUNCE ghosts land, and how much power do
they carry?  The fixed-slot engine follows one child per interaction, so
ghosts are traced by *re-running the same rays under forced branch
schedules* (``operations.branch_override_reaction``): schedule
``[0, 1, 1, 0]`` is the textbook lens ghost -- transmit the front face,
reflect off the back face, reflect off the front face from inside,
transmit out the back.

This demo, on a biconvex BK7 singlet:

1. traces the MAIN path (all-transmit schedule) with the thin-film
   intensity tracker, bare and AR-coated;
2. checks the on-axis double-bounce ghost power against the analytic
   product T1 R2 R1 T2 evaluated from the SAME coating stack at normal
   incidence (the ghost/main power ratio is the textbook R1 R2);
3. vmaps ONE compiled trace over the full depth-4 schedule tree (16 paths
   in a single program) and prints a power-ranked ghost table, showing the
   AR coating collapsing the ghost power by ~(R_coat/R_bare)^2;
4. plots the detector-plane ghost spread vs the main focus (ghost_spots.png).

Nothing comparable exists in the reference (its GhostThrough op,
operation.py:311-333, can only pass straight through at full power).

Run:  python examples/ghost_analysis.py [--rays N] [--depth K]
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
from tensorflowraytrace_tpu.operations import (
    all_branch_schedules, branch_override_reaction, seed_branch_counter,
    thin_film_intensity_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops import thinfilm

N_BK7 = 1.5168
N_MGF2 = 1.38
LAM = 550.0


def build_lens(dtype):
    """Symmetric biconvex singlet (two arcs) + detector screen at x = 8."""
    r = 6.0
    half = 1.5
    sag = r - math.sqrt(r * r - half * half)
    th = math.asin(half / r)
    entry = ArcSet.make([[sag - r + 1.0, 0.0]], [-th], [th], [r],
                        mat_in=1, mat_out=0, dtype=dtype)
    exit_ = ArcSet.make([[r - sag + 1.4, 0.0]], [math.pi - th],
                        [math.pi + th], [r], mat_in=1, mat_out=0,
                        dtype=dtype)
    tgt = SegmentSet.make([[8.0, -8.0]], [[8.0, 8.0]], dtype=dtype)
    scene = Scene2D.build(optical_arcs=[entry, exit_],
                          target_segments=[tgt])
    return scene, (mats.vacuum, mats.build_constant_material(N_BK7))


def beam(n, dtype):
    ys = np.linspace(-1.0, 1.0, n)
    p0 = np.stack([np.full(n, -1.0), ys], axis=1)
    p1 = p0 + [1.0, 0.0]
    rays = RaySet.make(jnp.asarray(p0, dtype), jnp.asarray(p1, dtype),
                       LAM, dtype=dtype)
    return seed_branch_counter(rays).with_field(
        "intensity", jnp.ones(n, dtype))


def schedule_name(row):
    return "".join("TR"[int(b)] for b in row)


def main(rays=801, depth=4, make_plot=True):
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    scene, materials = build_lens(dtype)
    rs = beam(rays, dtype)
    # depth forced interactions + one more bounce to land on the detector
    cfg = TraceConfig(max_bounces=depth + 1)

    d_qw = float(thinfilm.quarter_wave_thickness(N_MGF2, LAM))
    coatings = {"bare": ([], {}),
                "AR-coated": ([[(N_MGF2, d_qw)]],
                              {"arcs": np.asarray([0, 0])})}

    schedules = all_branch_schedules(depth)
    names = [schedule_name(r) for r in np.asarray(schedules)]

    results = {}
    for label, (stacks, coat_ids) in coatings.items():
        @jax.jit
        def trace_sched(sched, stacks=stacks, coat_ids=coat_ids):
            rx = thin_film_intensity_reaction(
                stacks, coat_ids,
                base_reaction=branch_override_reaction(sched))
            res = trace(rs, scene, materials, cfg, reaction=rx)
            landed = res.rays.state == FINISHED
            power = jnp.where(landed, res.rays.fields["intensity"], 0.0)
            return (jnp.sum(power), power, res.rays.p1[:, 1],
                    res.rays.fields["branch_ctr"])

        tot, power, y_land, ctr = jax.vmap(trace_sched)(schedules)
        results[label] = dict(tot=np.asarray(tot), power=np.asarray(power),
                              y=np.asarray(y_land), ctr=np.asarray(ctr))

        # analytic check on the on-axis ray (normal incidence both faces):
        # ghost TRRT power = T1 R2 R1 T2 with R from the SAME stack
        one = jnp.ones(1, dtype)
        if stacks:
            ln = jnp.full((1, 1), N_MGF2, dtype)
            ld = jnp.full((1, 1), d_qw, dtype)
        else:
            ln = jnp.zeros((0, 1), dtype)
            ld = jnp.zeros((0, 1), dtype)
        R = float(thinfilm.stack_R_unpolarized(
            one, N_BK7 * one, one, LAM * one, ln, ld)[0])
        T = 1.0 - R
        i_mid = rays // 2   # the on-axis ray
        p_ghost = results[label]["power"][names.index("TRRT"), i_mid]
        p_main = results[label]["power"][names.index("TT" + "T" * (depth - 2)),
                                         i_mid]
        print(f"[{label}] on-axis surface R = {R:.5f}")
        print(f"  main  TT   power {p_main:.6f}   analytic T^2      "
              f"{T * T:.6f}")
        print(f"  ghost TRRT power {p_ghost:.6e}  analytic T^2 R^2  "
              f"{T * T * R * R:.6e}")
        np.testing.assert_allclose(p_main, T * T, rtol=1e-6)
        np.testing.assert_allclose(p_ghost, T * T * R * R, rtol=1e-6)
        ratio = p_ghost / p_main
        np.testing.assert_allclose(ratio, R * R, rtol=1e-6)
        print(f"  ghost/main = {ratio:.3e} (= R1 R2, textbook)")

    # power-ranked path table (coated): beam-summed landed power per path
    print(f"\ndepth-{depth} branch tree, beam-total landed power "
          f"(T = transmit, R = reflect):")
    print(f"  {'path':<8}{'bare':>12}{'AR-coated':>14}")
    order = np.argsort(-results["bare"]["tot"])
    for k in order[:8]:
        print(f"  {names[k]:<8}{results['bare']['tot'][k]:>12.5f}"
              f"{results['AR-coated']['tot'][k]:>14.6f}")
    bare_ghost = results["bare"]["tot"][names.index("TRRT")]
    ar_ghost = results["AR-coated"]["tot"][names.index("TRRT")]
    print("  (a path that exits after j interactions appears once per "
          "unreached schedule suffix)")
    print(f"AR coating cut the double-bounce ghost by "
          f"{bare_ghost / max(ar_ghost, 1e-30):.0f}x")
    assert ar_ghost < bare_ghost / 8

    if make_plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        r = results["bare"]
        main_k = names.index("TT" + "T" * (depth - 2))
        ghost_k = names.index("TRRT")
        bins = np.linspace(-6, 6, 241)
        ax.hist(r["y"][main_k], bins=bins, weights=r["power"][main_k],
                label="main (TT)", alpha=0.8)
        ax.hist(r["y"][ghost_k], bins=bins,
                weights=r["power"][ghost_k] * 100,
                label="ghost (TRRT) x100", alpha=0.8)
        ax.set_xlabel("detector y")
        ax.set_ylabel("landed power / bin")
        ax.set_yscale("log")
        ax.legend()
        ax.set_title("bare singlet: ghost spread vs main focus")
        fig.tight_layout()
        fig.savefig("ghost_spots.png", dpi=110)
        print("wrote ghost_spots.png")

    print("OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=801)
    ap.add_argument("--depth", type=int, default=4)
    a = ap.parse_args()
    main(rays=a.rays, depth=a.depth)
