"""Ghost-path (multi-branch) tracing: branch_override_reaction.

VERDICT r3 next-round #3: the fixed-slot engine follows one child per
interaction, so coated-optics ghost analysis needs a way to follow the
OTHER Fresnel/thin-film branch.  These tests pin:

* the analytic two-surface ghost: forcing [transmit, reflect, reflect,
  transmit] through a bare glass slab traces power T^2 R^2 exactly (the
  classic double-bounce ghost),
* energy conservation: the leaf powers of the full depth-K binary branch
  tree sum to 1 for lossless interfaces AND for lossless thin-film stacks
  (each traced with multiplicity correction for early-exit leaves),
* the vmap-over-schedules path (one compiled program follows every ghost),
* composition semantics: -1 follows physics bit-exactly; the forced branch
  is what the intensity tracker multiplies (via __reflects__).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu import (
    RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.operations import (
    all_branch_schedules, branch_override_reaction,
    fresnel_intensity_reaction, seed_branch_counter,
    thin_film_intensity_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops import thinfilm

F64 = jnp.float64
N_GLASS = 1.5
R_NORMAL = ((N_GLASS - 1.0) / (N_GLASS + 1.0)) ** 2  # 0.04
T_NORMAL = 1.0 - R_NORMAL


def slab_scene(dtype=F64):
    """A glass slab between x=1 and x=2, target plane at x=5."""
    front = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=dtype)
    back = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=1,
                           mat_out=0, dtype=dtype)
    tgt = SegmentSet.make([[5.0, -50.0]], [[5.0, 50.0]], dtype=dtype)
    scene = Scene2D.build(optical_segments=[front, back],
                          target_segments=[tgt])
    return scene, (mats.vacuum, mats.build_constant_material(N_GLASS))


def one_ray(dtype=F64):
    r = RaySet.make(jnp.zeros((1, 2), dtype),
                    jnp.asarray([[1.0, 0.0]], dtype), 550.0, dtype=dtype)
    r = seed_branch_counter(r)
    return r.with_field("intensity", jnp.ones(1, dtype))


def run(schedule, max_bounces=8, tracker=fresnel_intensity_reaction,
        **tracker_kw):
    scene, materials = slab_scene()
    rx = tracker(base_reaction=branch_override_reaction(schedule),
                 **tracker_kw)
    return trace(one_ray(), scene, materials,
                 TraceConfig(max_bounces=max_bounces), reaction=rx)


def test_follow_physics_matches_plain_trace():
    """An all--1 schedule reproduces the unforced trace bit-exactly."""
    scene, materials = slab_scene()
    plain = trace(one_ray(), scene, materials, TraceConfig(max_bounces=8),
                  reaction=fresnel_intensity_reaction())
    forced = run([-1, -1, -1, -1])
    np.testing.assert_array_equal(np.asarray(plain.rays.p1),
                                  np.asarray(forced.rays.p1))
    np.testing.assert_array_equal(
        np.asarray(plain.rays.fields["intensity"]),
        np.asarray(forced.rays.fields["intensity"]))
    assert int(forced.rays.fields["branch_ctr"][0]) == 2  # two surfaces


def test_classic_double_bounce_ghost_power():
    """Schedule [0,1,1,0]: transmit front, reflect back, reflect front
    (inside), transmit back = the classic lens ghost, power T^2 R^2."""
    res = run([0, 1, 1, 0])
    # the ghost exits forward and lands on the target
    from tensorflowraytrace_tpu import FINISHED

    assert int(res.rays.state[0]) == FINISHED
    np.testing.assert_allclose(
        float(res.rays.fields["intensity"][0]),
        T_NORMAL ** 2 * R_NORMAL ** 2, rtol=1e-12)
    assert int(res.rays.fields["branch_ctr"][0]) == 4
    # the main path for comparison: straight through, power T^2
    main = run([0, 0])
    np.testing.assert_allclose(float(main.rays.fields["intensity"][0]),
                               T_NORMAL ** 2, rtol=1e-12)
    # ghost/main ratio is the textbook R1*R2 product
    ratio = (float(res.rays.fields["intensity"][0])
             / float(main.rays.fields["intensity"][0]))
    np.testing.assert_allclose(ratio, R_NORMAL * R_NORMAL, rtol=1e-12)


@pytest.mark.parametrize("coated", [False, True],
                         ids=["bare_fresnel", "thin_film_stack"])
def test_branch_tree_conserves_energy(coated):
    """Sum of leaf powers over the full depth-K binary tree == 1 for a
    lossless system.  A leaf that exited after j < K interactions is shared
    by 2**(K-j) schedules, so each trace contributes
    power / 2**(K - branch_ctr).  max_bounces == K so EVERY interaction in
    the trace is forced (a physics continuation past the schedule would
    multiply extra factors and break the tree accounting); rays still
    active at scan end are depth-K leaves of the un-split subtree."""
    K = 5
    schedules = np.asarray(all_branch_schedules(K))
    if coated:
        # a single quarter-wave MgF2-like layer on each surface: lossless,
        # R != T so the tree is genuinely non-uniform
        nf = 1.38
        d = float(thinfilm.quarter_wave_thickness(nf, 550.0))
        stacks = [[(nf, d)]]
        coat_ids = {"segments": np.asarray([0, 0, -1])}

        def tracker(base_reaction):
            return thin_film_intensity_reaction(stacks, coat_ids,
                                                base_reaction=base_reaction)
    else:
        tracker = fresnel_intensity_reaction

    # one compiled program vmapped over the 2**K schedules (looping would
    # compile the engine per row and bloat the suite's XLA compile memory)
    scene, materials = slab_scene()
    rays = one_ray()
    cfg = TraceConfig(max_bounces=K)

    @jax.jit
    def leaf(sched):
        rx = tracker(base_reaction=branch_override_reaction(sched))
        res = trace(rays, scene, materials, cfg, reaction=rx)
        return (res.rays.fields["intensity"][0],
                res.rays.fields["branch_ctr"][0])

    p, j = jax.vmap(leaf)(jnp.asarray(schedules))
    assert int(np.max(np.asarray(j))) <= K
    total = float(jnp.sum(p * 2.0 ** (j.astype(F64) - K)))
    np.testing.assert_allclose(total, 1.0, rtol=1e-10)


def test_vmapped_schedule_batch():
    """One compiled program follows every ghost path: vmap the trace over
    the (P, K) schedule batch and match the per-path loop results."""
    K = 3
    schedules = all_branch_schedules(K)
    scene, materials = slab_scene()
    rays = one_ray()
    cfg = TraceConfig(max_bounces=K + 2)

    @jax.jit
    def trace_one(sched):
        rx = fresnel_intensity_reaction(
            base_reaction=branch_override_reaction(sched))
        res = trace(rays, scene, materials, cfg, reaction=rx)
        return (res.rays.fields["intensity"][0],
                res.rays.fields["branch_ctr"][0], res.rays.p1[0])

    batch_i, batch_ctr, batch_p1 = jax.vmap(trace_one)(schedules)
    for p, row in enumerate(np.asarray(schedules)):
        i1, c1, p1 = trace_one(jnp.asarray(row))
        np.testing.assert_allclose(float(batch_i[p]), float(i1), rtol=0)
        assert int(batch_ctr[p]) == int(c1)


def test_forced_transmit_under_tir_has_zero_power():
    """Force-transmit where physics says TIR: the child is the clamped
    near-tangential limit, carries exactly zero power (T = 1 - R = 0, with
    R == 1 under TIR), and the gradient stays finite."""
    # steep internal hit on the slab's front surface from inside: launch
    # inside the glass toward the front wall beyond the critical angle
    scene, materials = slab_scene()
    ang = 0.9  # > critical (0.7297 rad for n = 1.5)
    p0 = jnp.asarray([[1.5, 0.0]], F64)
    d = jnp.asarray([[-math.cos(ang), math.sin(ang)]], F64)
    rays = seed_branch_counter(
        RaySet.make(p0, p0 + d, 550.0, dtype=F64)).with_field(
            "intensity", jnp.ones(1, F64))
    rx = fresnel_intensity_reaction(
        base_reaction=branch_override_reaction([0]))
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=rx)
    assert float(res.rays.fields["intensity"][0]) == 0.0

    def loss(angle):
        dd = jnp.stack([-jnp.cos(angle), jnp.sin(angle)])[None, :]
        r = seed_branch_counter(
            RaySet.make(p0, p0 + dd, 550.0, dtype=F64)).with_field(
                "intensity", jnp.ones(1, F64))
        out = trace(r, scene, materials, TraceConfig(max_bounces=2),
                    reaction=rx)
        return jnp.sum(out.rays.p1) + jnp.sum(out.rays.fields["intensity"])

    g = jax.grad(loss)(jnp.asarray(ang, F64))
    assert np.isfinite(float(g))


def test_missing_seed_fails_loudly():
    scene, materials = slab_scene()
    rays = RaySet.make(jnp.zeros((1, 2), F64),
                       jnp.asarray([[1.0, 0.0]], F64), 550.0, dtype=F64)
    with pytest.raises(KeyError, match="branch_ctr"):
        trace(rays, scene, materials, TraceConfig(max_bounces=2),
              reaction=branch_override_reaction([0]))
