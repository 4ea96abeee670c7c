"""Coated-surface polarization tests: thin_film_jones_reaction routes the
multilayer stack's COMPLEX per-polarization amplitudes (ops.thinfilm.stack_rt)
into the Jones transport, so coatings diattenuate and retard.  Pinned limits:
bare rows and zero-thickness coatings reduce EXACTLY to
jones_polarization_reaction on every branch (refract / TIR / mirror), the
unpolarized S0 equals thin_film_intensity_reaction's scalar factor on every
branch, a quarter-wave AR at normal incidence leaves the polarization state
unchanged, and an HR stack near Brewster acts as a polarizer."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.operations import (
    jones_polarization_reaction, seed_polarization, stokes_parameters,
    thin_film_intensity_reaction, thin_film_jones_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops import thinfilm

F64 = jnp.float64
SQ2 = 1.0 / math.sqrt(2.0)
N_GLASS = 1.5
N_MGF2 = 1.38
POL_FIELDS = ("es_re", "es_im", "ep_re", "ep_im")


def glass_interface(internal=False):
    """Vertical interface at x=0 (vacuum | glass); internal=True puts the
    rays inside the glass (TIR available above ~0.7297 rad)."""
    if internal:
        seg = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=0,
                              mat_out=1, dtype=F64)
    else:
        seg = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=1,
                              mat_out=0, dtype=F64)
    scene = Scene2D.build(optical_segments=[seg])
    return scene, (mats.vacuum, mats.build_constant_material(N_GLASS))


def mirror_scene():
    seg = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=1,
                          mat_out=0, dtype=F64)
    scene = Scene2D.build(optical_segments=[seg])
    return scene, (mats.vacuum, mats.reflective)


def rays_at_angles(angles, jones=(SQ2, SQ2)):
    angles = np.atleast_1d(np.asarray(angles, float))
    n = len(angles)
    p0 = np.stack([-np.cos(angles), -np.sin(angles)], axis=1)
    rays = RaySet.make(jnp.asarray(p0, F64), jnp.zeros((n, 2), F64), 550.0,
                       dtype=F64)
    return seed_polarization(rays, jones=jones)


def run(rays, scene, materials, rx, bounces=1):
    return trace(rays, scene, materials, TraceConfig(max_bounces=bounces),
                 reaction=rx)


def assert_pol_equal(a, b, rtol=1e-13, atol=1e-15):
    for f in POL_FIELDS:
        np.testing.assert_allclose(np.asarray(a.rays.fields[f]),
                                   np.asarray(b.rays.fields[f]),
                                   rtol=rtol, atol=atol, err_msg=f)


ANGLES = [0.0, 0.3, math.atan(N_GLASS), 1.2]  # incl. Brewster
TIR_ANGLES = [0.85, 0.95, 1.3]  # internal, above critical 0.7297


def test_bare_rows_match_jones_polarization_every_branch():
    """coat id -1 (and empty tables) must reproduce
    jones_polarization_reaction EXACTLY: refraction amplitudes, TIR complex
    phases, and the mirror r = -1 convention."""
    bare = thin_film_jones_reaction([], {"segments": np.asarray([-1])})
    for scene_fn, angles, kw in (
            (glass_interface, ANGLES, {}),
            (lambda: glass_interface(internal=True), TIR_ANGLES, {}),
            (mirror_scene, [0.0, 0.6], {})):
        scene, materials = scene_fn()
        a = run(rays_at_angles(angles, (0.8, 0.6j)), scene, materials, bare)
        b = run(rays_at_angles(angles, (0.8, 0.6j)), scene, materials,
                jones_polarization_reaction())
        assert_pol_equal(a, b)


def test_zero_thickness_coating_degenerates_to_bare():
    """A coated surface whose layers have zero thickness is the bare
    interface: pins the Verdet->Fresnel rp sign flip and the PEC mirror
    convention (matrix sign kept) on every branch."""
    rx = thin_film_jones_reaction([[(N_MGF2, 0.0), (2.35, 0.0)]],
                                  {"segments": np.asarray([0])})
    for scene_fn, angles in ((glass_interface, ANGLES),
                             (lambda: glass_interface(internal=True),
                              TIR_ANGLES),
                             (mirror_scene, [0.0, 0.6])):
        scene, materials = scene_fn()
        a = run(rays_at_angles(angles, (0.8, 0.6j)), scene, materials, rx)
        b = run(rays_at_angles(angles, (0.8, 0.6j)), scene, materials,
                jones_polarization_reaction())
        assert_pol_equal(a, b, rtol=1e-12, atol=5e-15)


def test_quarter_wave_ar_normal_incidence_preserves_polarization():
    """At normal incidence s and p are indistinguishable: a quarter-wave AR
    coat transmits both components with the SAME amplitude, so the
    normalized polarization state is untouched while S0 drops by exactly
    the stack transmittance."""
    scene, materials = glass_interface()
    d = float(thinfilm.quarter_wave_thickness(N_MGF2, 550.0))
    rx = thin_film_jones_reaction([[(N_MGF2, d)]],
                                  {"segments": np.asarray([0])})
    jones_in = (0.8, 0.6j)  # elliptical input
    res = run(rays_at_angles([0.0], jones_in), scene, materials, rx)
    s = stokes_parameters(res.rays)
    T = 1.0 - ((N_GLASS - N_MGF2 ** 2) / (N_GLASS + N_MGF2 ** 2)) ** 2
    np.testing.assert_allclose(float(s["S0"][0]), T, rtol=1e-12)
    # normalized Stokes vector unchanged from the input state
    s_in = stokes_parameters(seed_polarization(
        RaySet.make(jnp.zeros((1, 2), F64), jnp.ones((1, 2), F64), 550.0,
                    dtype=F64), jones=jones_in))
    for k in ("S1", "S2", "S3"):
        np.testing.assert_allclose(float(s[k][0]) / float(s["S0"][0]),
                                   float(s_in[k][0]) / float(s_in["S0"][0]),
                                   rtol=1e-10, atol=1e-12)


def test_hr_stack_near_brewster_polarizes_transmission():
    """A quarter-wave HR stack near Brewster's angle is a polarizer: Ts is
    tiny while Tp stays large, so unpolarized input emerges strongly
    p-polarized (S1 -> -S0).  The physics a scalar intensity transport
    cannot express."""
    lam, n_hi, n_lo = 550.0, 2.35, 1.38
    layers = [(n_hi, float(thinfilm.quarter_wave_thickness(n_hi, lam))),
              (n_lo, float(thinfilm.quarter_wave_thickness(n_lo, lam)))] * 4
    scene, materials = glass_interface()
    rx = thin_film_jones_reaction([layers], {"segments": np.asarray([0])})
    theta = math.atan(N_GLASS)  # Brewster of the bare substrate
    res = run(rays_at_angles([theta], (SQ2, SQ2)), scene, materials, rx)
    s = stokes_parameters(res.rays)
    s0, s1 = float(s["S0"][0]), float(s["S1"][0])
    i_s, i_p = 0.5 * (s0 + s1), 0.5 * (s0 - s1)
    assert i_p > 10.0 * i_s          # strongly p-polarized output
    assert i_s < 0.05                # s is blocked by the HR stack
    assert i_p > 0.15                # p genuinely transmits (Tp ~ 0.35)
    # degree of polarization of the output
    assert -s1 / s0 > 0.8


def test_s0_equals_thin_film_intensity_on_every_branch():
    """Equal-power (Es, Ep) input: S0 after the coated Jones transport
    equals thin_film_intensity_reaction's scalar unpolarized factor on the
    refract, TIR, and mirror branches -- coated AND bare rows."""
    d_qw = float(thinfilm.quarter_wave_thickness(N_MGF2, 550.0))
    stacks = [[(N_MGF2, d_qw)], [(2.35, 40.0), (N_MGF2, 70.0)]]
    for scene_fn, angles, ids in (
            (glass_interface, ANGLES, [0]),
            (glass_interface, ANGLES, [1]),
            (glass_interface, ANGLES, [-1]),
            (lambda: glass_interface(internal=True), TIR_ANGLES, [1]),
            (mirror_scene, [0.0, 0.6], [0])):
        scene, materials = scene_fn()
        tables = {"segments": np.asarray(ids)}
        res_j = run(rays_at_angles(angles), scene, materials,
                    thin_film_jones_reaction(stacks, tables))
        s0 = np.asarray(stokes_parameters(res_j.rays)["S0"])
        rays_i = rays_at_angles(angles).with_field(
            "intensity", jnp.ones(len(angles), F64))
        res_i = run(rays_i, scene, materials,
                    thin_film_intensity_reaction(stacks, tables))
        np.testing.assert_allclose(
            s0, np.asarray(res_i.rays.fields["intensity"]), rtol=1e-11,
            atol=1e-14)


def test_coating_retardance_on_transmission():
    """An off-quarter-wave coat at oblique incidence RETARDS: 45-degree
    linear input picks up ellipticity (S3 != 0) through the coated
    interface, which the bare interface (real ts/tp) never does -- the
    transmission-phase physics a sqrt(1-R) factor discards."""
    scene, materials = glass_interface()
    rx_coat = thin_film_jones_reaction([[(2.35, 40.0), (N_MGF2, 70.0)]],
                                       {"segments": np.asarray([0])})
    res_c = run(rays_at_angles([0.9], (SQ2, SQ2)), scene, materials, rx_coat)
    res_b = run(rays_at_angles([0.9], (SQ2, SQ2)), scene, materials,
                jones_polarization_reaction())
    s_c = stokes_parameters(res_c.rays)
    s_b = stokes_parameters(res_b.rays)
    assert abs(float(s_b["S3"][0])) < 1e-12     # bare refraction: no phase
    assert abs(float(s_c["S3"][0])) > 1e-3 * float(s_c["S0"][0])


def test_quarter_wave_on_mirror_flips_reflection_phase():
    """A quarter-wave dielectric on an ideal mirror converts r = -1 into
    r = +1 (half-wave round trip): the classic PEC -> PMC conversion, and
    the pin that coated mirrors take the exact perfect-conductor limit."""
    scene, materials = mirror_scene()
    d = float(thinfilm.quarter_wave_thickness(N_MGF2, 550.0))
    rx = thin_film_jones_reaction([[(N_MGF2, d)]],
                                  {"segments": np.asarray([0])})
    res = run(rays_at_angles([0.0], (1.0, 0.0)), scene, materials, rx)
    np.testing.assert_allclose(float(res.rays.fields["es_re"][0]), 1.0,
                               rtol=1e-10)       # +1, not the bare -1
    np.testing.assert_allclose(float(res.rays.fields["es_im"][0]), 0.0,
                               atol=1e-10)
    # energy preserved: |r| = 1 on the lossless coated mirror
    s = stokes_parameters(res.rays)
    np.testing.assert_allclose(float(s["S0"][0]), 1.0, rtol=1e-12)
    # and the bare mirror still reflects with -1
    res_b = run(rays_at_angles([0.0], (1.0, 0.0)), scene, materials,
                thin_film_jones_reaction([], {"segments": np.asarray([-1])}))
    np.testing.assert_allclose(float(res_b.rays.fields["es_re"][0]), -1.0,
                               rtol=1e-12)


def test_differentiable_in_coating_thickness():
    """d(S3)/d(thickness) through the traced coated transport is finite and
    matches central finite differences -- coating retardance can be
    DESIGNED by gradient descent."""
    scene, materials = glass_interface()

    def s3_of(d_thick):
        rx = thin_film_jones_reaction([[(2.35, d_thick), (N_MGF2, 70.0)]],
                                      {"segments": np.asarray([0])})
        res = run(rays_at_angles([0.9], (SQ2, SQ2)), scene, materials, rx)
        return stokes_parameters(res.rays)["S3"][0]

    d0 = jnp.asarray(40.0, F64)
    g = jax.grad(s3_of)(d0)
    assert np.isfinite(float(g))
    h = 1e-4
    fd = (float(s3_of(d0 + h)) - float(s3_of(d0 - h))) / (2 * h)
    np.testing.assert_allclose(float(g), fd, rtol=1e-6)


def test_composes_with_other_trackers():
    """ThinFilmJones under an OPL wrapper: the composed trace matches the
    single-tracker runs field-by-field (same machinery pin as the grand
    composition, now with the coated Jones transport in the stack)."""
    from tensorflowraytrace_tpu.operations import (
        ThinFilmJones, optical_path_reaction, seed_optical_path,
    )

    scene, materials = glass_interface()
    d = float(thinfilm.quarter_wave_thickness(N_MGF2, 550.0))
    spec = ([[(N_MGF2, d)]], {"segments": np.asarray([0])})

    def seeded():
        return seed_optical_path(rays_at_angles([0.4], (SQ2, SQ2)))

    composed = run(seeded(), scene, materials,
                   optical_path_reaction(
                       base_reaction=thin_film_jones_reaction(*spec)))
    r_tfj = run(seeded(), scene, materials, ThinFilmJones(*spec).reaction)
    r_opl = run(seeded(), scene, materials, optical_path_reaction())
    assert_pol_equal(composed, r_tfj)
    np.testing.assert_allclose(float(composed.rays.fields["opl"][0]),
                               float(r_opl.rays.fields["opl"][0]),
                               rtol=1e-12)
