"""Polarization ray tracing tests: the Jones-amplitude transport must
reproduce textbook polarization optics (Fresnel amplitude coefficients,
Brewster's angle, TIR phase shifts / the Fresnel rhomb, basis rotation in
3D).  Beyond the reference (which tracks no polarization); the unpolarized
limit is pinned to fresnel_intensity_reaction's scalar power factor."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, Scene3D, SegmentSet, TraceConfig, TriangleSet,
    trace,
)
from tensorflowraytrace_tpu.operations import (
    fresnel_intensity_reaction, jones_polarization_reaction,
    seed_polarization, stokes_parameters,
)
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
F64 = jnp.float64
SQ2 = 1.0 / math.sqrt(2.0)


def glass_interface_2d(n_glass=1.5, internal=False):
    """Vertical interface at x=0.  internal=False: rays in vacuum, glass
    behind (mat_in=glass index 1).  internal=True: rays inside glass."""
    if internal:
        seg = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=0,
                              mat_out=1, dtype=F64)
    else:
        seg = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=1,
                              mat_out=0, dtype=F64)
    scene = Scene2D.build(optical_segments=[seg])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))
    return scene, materials


def rays_at_angles(angles, jones):
    angles = np.atleast_1d(np.asarray(angles, float))
    n = len(angles)
    p0 = np.stack([-np.cos(angles), -np.sin(angles)], axis=1)
    rays = RaySet.make(jnp.asarray(p0, F64), jnp.zeros((n, 2), F64), 550.0,
                       dtype=F64)
    return seed_polarization(rays, jones=jones)


def run(rays, scene, materials, bounces=1, **kw):
    return trace(rays, scene, materials, TraceConfig(max_bounces=bounces),
                 reaction=jones_polarization_reaction(), **kw)


def test_transmission_amplitudes_match_textbook():
    """Refraction applies sqrt(1-|rs|^2) / sqrt(1-|rp|^2) per component."""
    n_glass = 1.5
    scene, materials = glass_interface_2d(n_glass)
    theta = 0.7
    res = run(rays_at_angles([theta], (1.0, 1.0)), scene, materials)
    s = stokes_parameters(res.rays)

    cos_i = math.cos(theta)
    cos_t = math.sqrt(1 - (math.sin(theta) / n_glass) ** 2)
    rs = (cos_i - n_glass * cos_t) / (cos_i + n_glass * cos_t)
    rp = (cos_t - n_glass * cos_i) / (cos_t + n_glass * cos_i)
    np.testing.assert_allclose(float(res.rays.fields["es_re"][0]) ** 2,
                               1 - rs * rs, rtol=1e-12)
    np.testing.assert_allclose(float(res.rays.fields["ep_re"][0]) ** 2,
                               1 - rp * rp, rtol=1e-12)
    # transmitted amplitudes are real: no phase is introduced on refraction
    assert float(jnp.abs(res.rays.fields["es_im"][0])) < 1e-15
    assert float(jnp.abs(res.rays.fields["ep_im"][0])) < 1e-15
    np.testing.assert_allclose(float(s["S0"][0]), (1 - rs * rs) + (1 - rp * rp),
                               rtol=1e-12)


def test_unpolarized_split_equals_fresnel_intensity():
    """Equal-power (Es, Ep) input: S0 after refraction equals the scalar
    unpolarized factor fresnel_intensity_reaction applies -- the two
    implementations must agree exactly on the incoherent limit."""
    n_glass = 1.52
    scene, materials = glass_interface_2d(n_glass)
    angles = [0.0, 0.3, math.atan(n_glass), 1.2]

    res = run(rays_at_angles(angles, (SQ2, SQ2)), scene, materials)
    s0 = np.asarray(stokes_parameters(res.rays)["S0"])

    rays_i = rays_at_angles(angles, (SQ2, SQ2)).with_field(
        "intensity", jnp.ones(len(angles), F64))
    res_i = trace(rays_i, scene, materials, TraceConfig(max_bounces=1),
                  reaction=fresnel_intensity_reaction())
    np.testing.assert_allclose(
        s0, np.asarray(res_i.rays.fields["intensity"]), rtol=1e-12)


def test_brewster_p_fully_transmitted():
    """At Brewster's angle the p amplitude transmits with unit power
    (rp = 0) while s does not."""
    n_glass = 1.5
    scene, materials = glass_interface_2d(n_glass)
    res = run(rays_at_angles([math.atan(n_glass)], (1.0, 1.0)), scene,
              materials)
    ep = float(res.rays.fields["ep_re"][0])
    es = float(res.rays.fields["es_re"][0])
    np.testing.assert_allclose(abs(ep), 1.0, rtol=1e-12)
    assert abs(es) < 1.0 - 1e-3


def _tir_phase(eta, theta):
    """Relative TIR phase delta = delta_s - delta_p for internal incidence
    at theta with eta = n_inside/n_outside (textbook Fresnel-rhomb form)."""
    b = math.sqrt(eta * eta * math.sin(theta) ** 2 - 1.0)
    ds = -2.0 * math.atan2(b, eta * math.cos(theta))
    dp = -2.0 * math.atan2(eta * b, math.cos(theta))
    return ds - dp


def test_tir_phase_shift_single_bounce():
    """A single TIR keeps |Es| = |Ep| = 1 and imprints the textbook relative
    phase between s and p (checked through the Stokes parameters)."""
    n_glass = 1.5
    scene, materials = glass_interface_2d(n_glass, internal=True)
    theta = 0.95  # above critical angle asin(1/1.5) = 0.7297
    res = run(rays_at_angles([theta], (SQ2, SQ2)), scene, materials)
    s = stokes_parameters(res.rays)
    delta = _tir_phase(n_glass, theta)
    np.testing.assert_allclose(float(s["S0"][0]), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(s["S1"][0]), 0.0, atol=1e-12)
    # 45-degree linear in, relative phase delta out:
    # S2 = S0 cos(delta), S3 = +/- S0 sin(delta) (handedness is convention)
    np.testing.assert_allclose(float(s["S2"][0]), math.cos(delta), rtol=1e-10)
    np.testing.assert_allclose(abs(float(s["S3"][0])), abs(math.sin(delta)),
                               rtol=1e-10)


def test_fresnel_rhomb_two_tirs_make_circular():
    """Two TIRs at the Fresnel-rhomb angle (45 degrees of relative phase
    each) turn 45-degree linear light into circular: |S3| = S0, S1 = S2 = 0.
    The classic polarization integration test."""
    from scipy.optimize import brentq

    n_glass = 1.5
    crit = math.asin(1.0 / n_glass)
    # solve for the rhomb angle: _tir_phase == +45 degrees (delta_s - delta_p
    # is positive over (crit, pi/2), zero at both ends, with its extremum
    # at sin^2(theta) = 2 n_rel^2 / (1 + n_rel^2), n_rel = 1/n; bracket the
    # first crossing between the critical angle and the peak
    n_rel = 1.0 / n_glass
    theta_peak = math.asin(math.sqrt(2 * n_rel ** 2 / (1 + n_rel ** 2)))
    theta = brentq(lambda t: _tir_phase(n_glass, t) - PI / 4, crit + 1e-9,
                   theta_peak)
    np.testing.assert_allclose(_tir_phase(n_glass, theta), PI / 4,
                               atol=1e-12)

    # a glass channel slice: one short wall patch at each of the two TIR
    # bounce points (finite so the ray makes EXACTLY two TIRs, then exits
    # to the target).  Norms face the channel interior (glass = mat_out on
    # the bottom wall whose norm is +y; the top wall's norm is +y too, i.e.
    # away from the interior, so there glass = mat_in).
    climb = PI / 2 - theta  # ray climb angle; incidence is from the +/-y norm
    t = math.tan(climb)
    x1 = 1.0 / t            # first bounce: top wall y=+1
    x2 = x1 + 2.0 / t       # second bounce: bottom wall y=-1
    top = SegmentSet.make([[x1 - 0.5, 1.0]], [[x1 + 0.5, 1.0]], mat_in=1,
                          mat_out=0, dtype=F64)
    bot = SegmentSet.make([[x2 - 0.5, -1.0]], [[x2 + 0.5, -1.0]], mat_in=0,
                          mat_out=1, dtype=F64)
    tgt = SegmentSet.make([[x2 + 2.0, -5.0]], [[x2 + 2.0, 5.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[top, bot],
                          target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))

    d = np.asarray([math.cos(climb), math.sin(climb)])
    rays = RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                       jnp.asarray([d[None, :]], F64).reshape(1, 2), 550.0,
                       dtype=F64)
    rays = seed_polarization(rays, jones=(SQ2, SQ2))
    res = trace(rays, scene, materials, TraceConfig(max_bounces=3),
                reaction=jones_polarization_reaction())
    assert int(res.rays.state[0]) == FINISHED
    s = stokes_parameters(res.rays)
    np.testing.assert_allclose(float(s["S0"][0]), 1.0, rtol=1e-12)
    np.testing.assert_allclose(float(s["S1"][0]), 0.0, atol=1e-10)
    np.testing.assert_allclose(float(s["S2"][0]), 0.0, atol=1e-8)
    np.testing.assert_allclose(abs(float(s["S3"][0])), 1.0, rtol=1e-8)


def test_mirror_preserves_polarization_state():
    """An ideal mirror (n = 0 sentinel) applies r = -1 to both components:
    power and polarization state are exactly preserved."""
    mirror = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=1,
                             mat_out=0, dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror])
    jones = (0.8, 0.6j)  # elliptical input
    rays = rays_at_angles([0.4], jones)
    s_in = stokes_parameters(rays)
    res = trace(rays, scene, (mats.vacuum, mats.reflective),
                TraceConfig(max_bounces=1),
                reaction=jones_polarization_reaction())
    s_out = stokes_parameters(res.rays)
    for k in ("S0", "S1", "S2", "S3"):
        np.testing.assert_allclose(float(s_out[k][0]), float(s_in[k][0]),
                                   atol=1e-14)


def plane3d(x, half, **kw):
    return TriangleSet.make(
        [[x, -half, -half], [x, half, half]],
        [[x, half, half], [x, -half, -half]],
        [[x, half, -half], [x, -half, half]], dtype=F64, **kw)


def test_3d_matches_2d_in_plane():
    """A planar 3D trace reproduces the 2D Stokes output exactly (the basis
    rotation must be the identity when the plane of incidence is fixed)."""
    n_glass = 1.5
    theta = 0.8
    scene2, materials = glass_interface_2d(n_glass)
    res2 = run(rays_at_angles([theta], (0.6, 0.8)), scene2, materials)
    s2 = stokes_parameters(res2.rays)

    scene3 = Scene3D.build(optical=[plane3d(0.0, 50.0, mat_in=1, mat_out=0)])
    p0 = jnp.asarray([[-math.cos(theta), -math.sin(theta), 0.0]], F64)
    rays3 = RaySet.make(p0, jnp.zeros((1, 3), F64), 550.0, dtype=F64)
    # seed with s = out-of-plane (+z), the 2D convention
    rays3 = seed_polarization(rays3, jones=(0.6, 0.8),
                              s_axis=jnp.asarray([0.0, 0.0, 1.0], F64))
    res3 = run(rays3, scene3, materials)
    s3 = stokes_parameters(res3.rays)
    for k in ("S0", "S1", "S2", "S3"):
        np.testing.assert_allclose(float(s3[k][0]), float(s2[k][0]),
                                   atol=1e-12)


def test_3d_basis_rotation_consistency():
    """Hitting a tilted mirror in 3D: the stored s basis stays a unit vector
    transverse to the child ray, and mirror reflection preserves S0 and the
    degree of polarization regardless of the incidence plane's orientation."""
    # mirror plane with normal (1, 1, 1)/sqrt(3) through the origin
    nrm = np.asarray([1.0, 1.0, 1.0]) / math.sqrt(3.0)
    u = np.asarray([1.0, -1.0, 0.0]) / math.sqrt(2.0)
    v = np.cross(nrm, u)
    h = 50.0
    vp = [(-h * u - h * v), (h * u + h * v)]
    v1 = [(h * u - h * v), (-h * u + h * v)]
    v2 = [(h * u + h * v), (-h * u - h * v)]
    mirror = TriangleSet.make(np.asarray(vp), np.asarray(v1), np.asarray(v2),
                              mat_in=1, mat_out=0, dtype=F64)
    scene = Scene3D.build(optical=[mirror])

    d = np.asarray([1.0, 0.2, -0.1])
    d /= np.linalg.norm(d)
    p0 = jnp.asarray([-3.0 * d[None, :]], F64).reshape(1, 3)
    rays = RaySet.make(p0, p0 + jnp.asarray(d[None, :], F64), 550.0,
                       dtype=F64)
    rays = seed_polarization(rays, jones=(0.6, 0.8j))
    s_in = stokes_parameters(rays)
    res = trace(rays, scene, (mats.vacuum, mats.reflective),
                TraceConfig(max_bounces=1),
                reaction=jones_polarization_reaction())
    s_out = stokes_parameters(res.rays)
    np.testing.assert_allclose(float(s_out["S0"][0]), float(s_in["S0"][0]),
                               rtol=1e-12)
    # degree of polarization (fully polarized in, fully polarized out)
    dop = math.sqrt(float(s_out["S1"][0]) ** 2 + float(s_out["S2"][0]) ** 2 +
                    float(s_out["S3"][0]) ** 2) / float(s_out["S0"][0])
    np.testing.assert_allclose(dop, 1.0, rtol=1e-12)
    # stored basis: unit, transverse to the reflected direction
    s_axis = np.asarray([float(res.rays.fields["pol_sx"][0]),
                         float(res.rays.fields["pol_sy"][0]),
                         float(res.rays.fields["pol_sz"][0])])
    np.testing.assert_allclose(np.linalg.norm(s_axis), 1.0, rtol=1e-12)
    d_out = np.asarray(res.rays.p1 - res.rays.p0)[0]
    d_out = d_out / np.linalg.norm(d_out)
    np.testing.assert_allclose(abs(np.dot(s_axis, d_out)), 0.0, atol=1e-12)
    # and the reflected direction is the textbook mirror image
    d_expect = d - 2 * np.dot(d, nrm) * nrm
    np.testing.assert_allclose(d_out, d_expect, atol=1e-12)


def test_polarization_differentiable():
    """d(S3)/d(geometry) through a TIR bounce is finite and nonzero -- the
    phase transport participates in gradients."""
    n_glass = 1.5
    scene, materials = glass_interface_2d(n_glass, internal=True)

    def s3_of_angle(theta):
        p0 = jnp.stack([-jnp.cos(theta), -jnp.sin(theta)])[None, :]
        rays = RaySet.make(p0, jnp.zeros((1, 2), F64), 550.0, dtype=F64)
        rays = seed_polarization(rays, jones=(SQ2, SQ2))
        res = trace(rays, scene, materials, TraceConfig(max_bounces=1),
                    reaction=jones_polarization_reaction())
        return stokes_parameters(res.rays)["S3"][0]

    theta = jnp.asarray(0.95, F64)
    g = jax.grad(s3_of_angle)(theta)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
    # finite-difference agreement
    eps = 1e-6
    fd = (float(s3_of_angle(theta + eps)) - float(s3_of_angle(theta - eps)))\
        / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_missing_seed_raises():
    scene, materials = glass_interface_2d()
    rays = RaySet.make(jnp.asarray([[-1.0, 0.0]], F64),
                       jnp.zeros((1, 2), F64), 550.0, dtype=F64)
    try:
        trace(rays, scene, materials, TraceConfig(max_bounces=1),
              reaction=jones_polarization_reaction())
    except KeyError as e:
        assert "seed_polarization" in str(e)
    else:
        raise AssertionError("expected KeyError for unseeded rays")


def test_exactly_critical_radicand_finite_gradient():
    """radicand == 0.0 exactly (critical incidence) escapes the strict
    ``radicand < 0`` TIR test, so the refract branch's sqrt sees exact zero
    on the SELECTED side of the double-where -- without the eps**2 clamp,
    sqrt'(0) = inf NaNs the whole polarization gradient (the same failure
    snells_law_3D guards against; TPU remat rounds near-critical radicands
    to exactly 0 in the wild)."""
    from tensorflowraytrace_tpu.engine import Projection
    from tensorflowraytrace_tpu.operations import _fresnel_prelude

    cfg = TraceConfig(max_bounces=1)
    p0 = jnp.asarray([[0.0, 0.0, 0.0]], F64)
    p1 = jnp.asarray([[1.0, 0.0, 0.0]], F64)
    norm = jnp.asarray([[0.5, math.sqrt(3.0) / 2.0, 0.0]], F64)

    def make(n_in, ny):
        end = jnp.asarray([[1.0, ny, 0.0]], F64)
        rays = seed_polarization(RaySet.make(p0, end, 550.0, dtype=F64))
        proj = Projection(
            hit_valid=jnp.ones(1, bool), point=end,
            norm=norm, n_in=jnp.asarray([n_in], F64),
            n_out=jnp.ones(1, F64), category=jnp.zeros(1, jnp.int32),
            surf_idx=jnp.zeros(1, jnp.int32), kind=jnp.zeros(1, jnp.int32),
            extras={}, dim=3)
        return proj, rays

    # hunt the float lattice for a (n_in, direction) pair whose radicand
    # lands on exactly 0: one ULP of n_in moves the radicand by ~1.7 ULPs
    # of 1.0 (it can straddle zero forever), so a second knob -- a tiny tilt
    # of the ray direction, changing cos_i -- reshuffles the lattice offset
    base = 2.0 / math.sqrt(3.0)  # analytic critical index for cos_i = 1/2
    n_crit = ny_crit = None
    for j in range(200):
        # one nu ULP per step: 0.866 * 6.4e-17 ~ ULP(0.5), so each j slides
        # the radicand lattice by ~1.5e-16 relative to zero
        ny = j * 6.4e-17
        x = np.float64(base)
        for _ in range(12):
            proj, rays = make(float(x), ny)
            rad = float(_fresnel_prelude(proj, rays)[7][0])
            if rad == 0.0:
                n_crit, ny_crit = float(x), ny
                break
            x = np.nextafter(x, np.float64(2.0) if rad > 0
                             else np.float64(1.0))
        if n_crit is not None:
            break
    if n_crit is None:
        import pytest

        pytest.skip("float lattice near critical index misses exact 0")

    def loss(n_in):
        proj, rays = make(n_in, ny_crit)
        _, _, upd = jones_polarization_reaction()(proj, rays, cfg)
        return sum(jnp.sum(v) for k, v in upd.items()
                   if k.startswith(("es_", "ep_")))

    g = jax.grad(loss)(jnp.asarray(n_crit, F64))
    assert np.isfinite(float(g)), f"gradient at exact critical = {g}"


def test_field_reactions_compose():
    """The field-tracking wrappers accept each other as base reactions:
    OPL over Jones over intensity traces once and updates all three field
    families (regression: each wrapper unpacked its base as a 2-tuple and
    would have discarded inner field updates)."""
    from tensorflowraytrace_tpu.operations import (
        optical_path_reaction, seed_optical_path, total_optical_path,
    )
    import dataclasses

    scene, materials = glass_interface_2d(internal=False)
    rays = rays_at_angles([0.3], jones=(SQ2, SQ2))
    rays = seed_optical_path(rays)
    rays = dataclasses.replace(
        rays, fields={**rays.fields, "intensity": jnp.ones(1, F64)})
    rx = optical_path_reaction(
        base_reaction=jones_polarization_reaction(
            base_reaction=fresnel_intensity_reaction()))
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=rx)
    s = stokes_parameters(res.rays)
    opl = total_optical_path(res.rays)
    inten = res.rays.fields["intensity"]
    # refraction attenuated BOTH the Jones power and the scalar intensity,
    # and the two must agree for this unpolarized-equivalent 45-degree state
    assert 0.0 < float(s["S0"][0]) < 1.0
    np.testing.assert_allclose(float(s["S0"][0]), float(inten[0]),
                               rtol=1e-12)
    # OPL advanced past the seed and the ray now travels in glass
    assert float(opl[0]) > 0.0
    np.testing.assert_allclose(float(res.rays.fields["cur_n"][0]), 1.5)


def test_compose_same_field_semantics():
    """Same-field INTENSITY trackers chain multiplicatively (interface
    factor x interface factor -- fresnel over fresnel applies the factor
    twice), while non-multiplicative trackers of the same field (OPL over
    OPL would double-count legs) still fail loudly."""
    import dataclasses

    import pytest

    from tensorflowraytrace_tpu.operations import (
        optical_path_reaction, seed_optical_path,
    )

    scene, materials = glass_interface_2d()
    rays = rays_at_angles([0.3], jones=(1.0, 0.0))
    rays = dataclasses.replace(
        rays, fields={**rays.fields, "intensity": jnp.ones(1, F64)})
    cfg = TraceConfig(max_bounces=1)
    single = trace(rays, scene, materials, cfg,
                   reaction=fresnel_intensity_reaction())
    double = trace(rays, scene, materials, cfg,
                   reaction=fresnel_intensity_reaction(
                       base_reaction=fresnel_intensity_reaction()))
    f1 = float(single.rays.fields["intensity"][0])
    f2 = float(double.rays.fields["intensity"][0])
    assert 0.0 < f1 < 1.0
    np.testing.assert_allclose(f2, f1 * f1, rtol=1e-12)

    opl_rays = seed_optical_path(rays_at_angles([0.3], jones=(1.0, 0.0)))
    with pytest.raises(ValueError, match="both update"):
        trace(opl_rays, scene, materials, cfg,
              reaction=optical_path_reaction(
                  base_reaction=optical_path_reaction()))
