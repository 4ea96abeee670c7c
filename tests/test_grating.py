"""Diffraction-grating reaction tests: the traced child directions must
satisfy the grating equation, m = 0 must reduce to Snell, reflection
gratings must auto-collimate in Littrow, and spacing must be a
differentiable design parameter."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, Scene3D, SegmentSet, TraceConfig, TriangleSet,
    trace,
)
from tensorflowraytrace_tpu.operations import grating_reaction
from tensorflowraytrace_tpu.ops import materials as mats

F64 = jnp.float64
LAM = 550.0


def grating_scene_2d(mat_in=0, mat_out=0, n_extra_mats=()):
    gr = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=mat_in,
                         mat_out=mat_out, dtype=F64)
    tgt = SegmentSet.make([[3.0, -80.0]], [[3.0, 80.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[gr], target_segments=[tgt])
    return scene, (mats.vacuum,) + tuple(n_extra_mats)


def run_2d(scene, materials, rx, angle=0.0, lam=LAM):
    p1 = jnp.asarray([[math.cos(angle), math.sin(angle)]], F64)
    rays = RaySet.make(jnp.zeros((1, 2), F64), p1, lam, dtype=F64)
    return trace(rays, scene, materials, TraceConfig(max_bounces=2),
                 reaction=rx)


def test_transmission_orders_match_grating_equation():
    """sin(theta_m) = sin(theta_i) + m lam / a, dispersion along the
    in-plane tangent rot90(normal) (here -y for positive m)."""
    a = 2000.0
    scene, materials = grating_scene_2d()
    for m in (-2, -1, 1, 2):
        for th_i in (0.0, 0.2):
            rx = grating_reaction([(a, m, "transmission")],
                                  {"segments": np.asarray([0, -1])})
            res = run_2d(scene, materials, rx, angle=th_i)
            assert int(res.rays.state[0]) == FINISHED
            d = np.asarray(res.rays.p1[0] - res.rays.p0[0])
            sin_out = d[1] / np.hypot(d[0], d[1])
            # incident tangential component along rot90(n) = (0, -1) is
            # -sin(th_i); output sin measured the same way
            np.testing.assert_allclose(-sin_out,
                                       -math.sin(th_i) + m * LAM / a,
                                       rtol=1e-12)


def test_order_zero_is_snell():
    """m = 0 transmission reduces exactly to Snell refraction, including
    through a refractive interface."""
    scene, materials = grating_scene_2d(
        mat_in=1, mat_out=0, n_extra_mats=(mats.build_constant_material(1.5),))
    rx = grating_reaction([(2000.0, 0, "transmission")],
                          {"segments": np.asarray([0, -1])})
    from tensorflowraytrace_tpu.engine import default_reaction

    res = run_2d(scene, materials, rx, angle=0.3)
    base = run_2d(scene, materials, default_reaction, angle=0.3)
    np.testing.assert_allclose(np.asarray(res.rays.p1),
                               np.asarray(base.rays.p1), atol=1e-12)


def test_littrow_reflection_autocollimates():
    """Reflection grating in Littrow: with a = m lam / (2 sin th), order m
    retro-reflects the incident ray onto itself."""
    th = 0.35
    # incident tangential component along rot90(n) is -sin(th); the
    # retro-reflected tangential is +sin(th), so Littrow needs m = +1 here
    m = 1
    a = abs(m) * LAM / (2 * math.sin(th))
    # reflective-marked surface (mirror sentinel) at x=1, ray from origin
    gr = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1, mat_out=0,
                         dtype=F64)
    tgt = SegmentSet.make([[0.0, -80.0]], [[0.0, 80.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[gr], target_segments=[tgt])
    materials = (mats.vacuum, mats.reflective)
    rx = grating_reaction([(a, m, "reflection")],
                          {"segments": np.asarray([0, -1])})
    res = run_2d(scene, materials, rx, angle=th)
    assert int(res.rays.state[0]) == FINISHED
    d = np.asarray(res.rays.p1[0] - res.rays.p0[0])
    d = d / np.hypot(d[0], d[1])
    # retro-reflection: the child direction is the exact reverse
    np.testing.assert_allclose(d, [-math.cos(th), -math.sin(th)],
                               atol=1e-12)


def test_evanescent_order_falls_back_to_base():
    """An order past 90 degrees (|sin| > 1) is evanescent; the ray takes
    the base reaction's child instead of producing NaNs."""
    scene, materials = grating_scene_2d()
    rx = grating_reaction([(600.0, 2, "transmission")],  # 2*550/600 > 1
                          {"segments": np.asarray([0, -1])})
    res = run_2d(scene, materials, rx)
    assert int(res.rays.state[0]) == FINISHED
    assert np.all(np.isfinite(np.asarray(res.rays.p1)))
    # base (Snell through vacuum-vacuum) goes straight
    np.testing.assert_allclose(float(res.rays.p1[0, 1]), 0.0, atol=1e-12)


def test_3d_matches_2d_in_plane_and_conical_grooves():
    """A 3D grating with grooves along z reproduces the 2D in-plane result;
    the tangential groove projection normalizes out any normal component."""
    big = 200.0
    wall = TriangleSet.make(
        [[1.0, -big, -big]], [[1.0, big, 0.0]], [[1.0, -big, big]],
        mat_in=0, mat_out=0, dtype=F64)
    tgt = TriangleSet.make(
        [[3.0, -big, -big]], [[3.0, big, 0.0]], [[3.0, -big, big]],
        dtype=F64)
    scene = Scene3D.build(optical=[wall], targets=[tgt])
    a, m = 2000.0, 1
    # grating vector along -y (matching the 2D tangent convention above);
    # add a normal (x) component that the projection must strip
    groove = (0.7, -1.0, 0.0)
    rx = grating_reaction([(a, m, "transmission", groove)],
                          {"triangles": np.asarray([0, -1])})
    rays = RaySet.make(jnp.zeros((1, 3), F64),
                       jnp.asarray([[1.0, 0.0, 0.0]], F64), LAM, dtype=F64)
    res = trace(rays, scene, (mats.vacuum,), TraceConfig(max_bounces=2),
                reaction=rx)
    assert int(res.rays.state[0]) == FINISHED
    s = m * LAM / a
    y_expect = -2.0 * s / math.sqrt(1 - s * s)
    np.testing.assert_allclose(float(res.rays.p1[0, 1]), y_expect,
                               rtol=1e-10)
    np.testing.assert_allclose(float(res.rays.p1[0, 2]), 0.0, atol=1e-10)


def test_spacing_is_differentiable_design_parameter():
    """d(landing y)/d(spacing) is finite and matches the analytic grating
    dispersion -- spacing optimization is a gradient problem."""
    scene, materials = grating_scene_2d()

    def land_y(a):
        rx = grating_reaction([(a, 1, "transmission")],
                              {"segments": np.asarray([0, -1])})
        rays = RaySet.make(jnp.zeros((1, 2), F64),
                           jnp.asarray([[1.0, 0.0]], F64), LAM, dtype=F64)
        res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                    reaction=rx)
        return res.rays.p1[0, 1]

    a0 = 2000.0
    g = float(jax.grad(land_y)(jnp.asarray(a0, F64)))
    # y(a) = -2 s / sqrt(1 - s^2), s = lam / a
    s = LAM / a0
    dy_ds = -2.0 * (1 - s * s) ** -1.5
    expect = dy_ds * (-LAM / a0 ** 2)
    np.testing.assert_allclose(g, expect, rtol=1e-9)


def test_reflection_grating_reports_branch_to_trackers():
    """A reflection grating keeps the ray in its medium; a composed OPL
    tracker must NOT switch cur_n to the far side (regression: the Snell
    prelude calls this hit 'refract', and the tracker used to follow it)."""
    from tensorflowraytrace_tpu.operations import (
        optical_path_reaction, seed_optical_path, total_optical_path,
    )

    n_glass = 1.5
    th = 0.35
    # Littrow in-medium: the kick uses lambda/n2 with n2 = n1 = glass for
    # a reflection grating, so retro-reflection needs a = lam/(2 n sin th)
    a = LAM / (2 * n_glass * math.sin(th))
    # an ORDINARY glass-vacuum interface (no mirror sentinel) marked as a
    # reflection grating: the prelude would refract here
    gr = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=0, mat_out=1,
                         dtype=F64)
    tgt = SegmentSet.make([[0.0, -80.0]], [[0.0, 80.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[gr], target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))
    rx = optical_path_reaction(base_reaction=grating_reaction(
        [(a, 1, "reflection")], {"segments": np.asarray([0, -1])}))
    p1 = jnp.asarray([[math.cos(th), math.sin(th)]], F64)
    rays = seed_optical_path(
        RaySet.make(jnp.zeros((1, 2), F64), p1, LAM, dtype=F64),
        n0=n_glass)  # launch medium: glass (mat_out side of the grating)
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=rx)
    assert int(res.rays.state[0]) == FINISHED
    # the retro-reflected ray still travels in glass
    np.testing.assert_allclose(float(res.rays.fields["cur_n"][0]), n_glass)
    # and the OPL of the out-and-back path is n_glass * 2 * path length
    np.testing.assert_allclose(float(total_optical_path(res.rays)[0]),
                               n_glass * 2.0 / math.cos(th), rtol=1e-12)


def test_stacked_trackers_all_see_real_branch():
    """__reflects__ is read without popping: BOTH stacked trackers
    (absorption over OPL over a reflection grating) keep their medium
    state across the reflection (regression: the first consumer used to
    pop the key, leaving outer trackers on the wrong Snell branch)."""
    from tensorflowraytrace_tpu.operations import (
        absorption_reaction, optical_path_reaction, seed_absorption,
        seed_optical_path,
    )

    n_glass = 1.5
    alpha_glass = 0.11
    th = 0.35
    a = LAM / (2 * n_glass * math.sin(th))
    gr = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=0, mat_out=1,
                         dtype=F64)
    tgt = SegmentSet.make([[0.0, -80.0]], [[0.0, 80.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[gr], target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))
    rx = absorption_reaction(
        {"segments": (np.asarray([0.0, 0.0]), np.asarray([0.0, 0.0]))},
        base_reaction=optical_path_reaction(
            base_reaction=grating_reaction(
                [(a, 1, "reflection")], {"segments": np.asarray([0, -1])})))
    p1 = jnp.asarray([[math.cos(th), math.sin(th)]], F64)
    rays = seed_optical_path(
        RaySet.make(jnp.zeros((1, 2), F64), p1, LAM, dtype=F64), n0=n_glass)
    rays = seed_absorption(rays, alpha0=alpha_glass, seed_field=True)
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=rx)
    assert int(res.rays.state[0]) == FINISHED
    # the retro-reflected ray stays in glass for BOTH trackers
    np.testing.assert_allclose(float(res.rays.fields["cur_n"][0]), n_glass)
    np.testing.assert_allclose(float(res.rays.fields["cur_alpha"][0]),
                               alpha_glass)
