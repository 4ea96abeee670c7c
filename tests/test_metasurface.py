"""Metasurface (generalized law of refraction) tests: the ideal hyperbolic
metalens must focus perfectly at the design wavelength, degenerate phases
must reduce to Snell / grating / mirror, and phase-profile parameters must
be differentiable design variables."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, Scene3D, SegmentSet, TraceConfig, TriangleSet,
    trace,
)
from tensorflowraytrace_tpu.engine import default_reaction
from tensorflowraytrace_tpu.operations import (
    grating_reaction, hyperbolic_metalens_phase, metasurface_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats

F64 = jnp.float64
LAM0 = 550.0
FOCAL = 2.0


def metalens_scene_2d(det_dist=FOCAL, mat_in=0, mat_out=0):
    ms = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=mat_in,
                         mat_out=mat_out, dtype=F64)
    det = SegmentSet.make([[1.0 + det_dist, -80.0]], [[1.0 + det_dist, 80.0]],
                          dtype=F64)
    return Scene2D.build(optical_segments=[ms], target_segments=[det])


def collimated(ys, lam=LAM0):
    ys = np.atleast_1d(np.asarray(ys, float))
    n = len(ys)
    p0 = np.stack([np.zeros(n), ys], axis=1)
    return RaySet.make(jnp.asarray(p0, F64),
                       jnp.asarray(p0 + [1.0, 0.0], F64), lam, dtype=F64)


def test_hyperbolic_metalens_perfect_focus():
    """At the design wavelength every collimated ray lands exactly on the
    focal point -- the profile is stationary-phase exact, not paraxial."""
    scene = metalens_scene_2d()
    phase = hyperbolic_metalens_phase(FOCAL, LAM0, axis=0, center=(1.0, 0.0))
    rx = metasurface_reaction([(phase, "transmission")],
                              {"segments": np.asarray([0, -1])})
    res = trace(collimated(np.linspace(-1.2, 1.2, 13)), scene,
                (mats.vacuum,), TraceConfig(max_bounces=2), reaction=rx)
    assert bool(jnp.all(res.rays.state == FINISHED))
    np.testing.assert_allclose(np.asarray(res.rays.p1[:, 1]), 0.0,
                               atol=1e-12)


def test_metalens_chromatic_sign():
    """Metalens dispersion is OPPOSITE to refractive glass: longer
    wavelengths get a larger momentum kick and focus SHORTER, so at the
    design-focal detector red crosses past the axis and blue falls short
    (the basis of hybrid refractive-meta achromats)."""
    scene = metalens_scene_2d()
    phase = hyperbolic_metalens_phase(FOCAL, LAM0, axis=0, center=(1.0, 0.0))
    rx = metasurface_reaction([(phase, "transmission")],
                              {"segments": np.asarray([0, -1])})
    y0 = 1.0
    red = trace(collimated([y0], lam=650.0), scene, (mats.vacuum,),
                TraceConfig(max_bounces=2), reaction=rx)
    blue = trace(collimated([y0], lam=450.0), scene, (mats.vacuum,),
                 TraceConfig(max_bounces=2), reaction=rx)
    assert float(red.rays.p1[0, 1]) < 0.0   # crossed the axis before det
    assert float(blue.rays.p1[0, 1]) > 0.0  # not yet at its (longer) focus


def test_constant_phase_is_snell():
    """A constant phase profile imparts no momentum: exactly Snell, even
    through a refractive interface."""
    scene = metalens_scene_2d(mat_in=1, mat_out=0)
    materials = (mats.vacuum, mats.build_constant_material(1.5))
    rx = metasurface_reaction([(lambda p, w: jnp.asarray(1.7, p.dtype),
                                "transmission")],
                              {"segments": np.asarray([0, -1])})
    ang = 0.3
    p1 = jnp.asarray([[math.cos(ang), math.sin(ang)]], F64)
    rays = RaySet.make(jnp.zeros((1, 2), F64), p1, LAM0, dtype=F64)
    a = trace(rays, scene, materials, TraceConfig(max_bounces=2),
              reaction=rx)
    b = trace(rays, scene, materials, TraceConfig(max_bounces=2),
              reaction=default_reaction)
    np.testing.assert_allclose(np.asarray(a.rays.p1), np.asarray(b.rays.p1),
                               atol=1e-12)


def test_linear_phase_is_a_grating():
    """phi = -(2 pi / a) y is a blazed grating of period a in order +1
    (with this scene's tangent rot90(n) = -y): identical children to
    grating_reaction."""
    a = 2000.0
    scene = metalens_scene_2d()
    rx_m = metasurface_reaction(
        [(lambda p, w: -2.0 * jnp.pi / a * p[1], "transmission")],
        {"segments": np.asarray([0, -1])})
    rx_g = grating_reaction([(a, 1, "transmission")],
                            {"segments": np.asarray([0, -1])})
    rays = collimated([0.3])
    rm = trace(rays, scene, (mats.vacuum,), TraceConfig(max_bounces=2),
               reaction=rx_m)
    rg = trace(rays, scene, (mats.vacuum,), TraceConfig(max_bounces=2),
               reaction=rx_g)
    np.testing.assert_allclose(np.asarray(rm.rays.p1),
                               np.asarray(rg.rays.p1), atol=1e-12)


def test_reflection_kind_constant_phase_is_mirror():
    """Reflection kind with zero phase gradient is an ordinary mirror."""
    ms = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=1, mat_out=0,
                         dtype=F64)
    tgt = SegmentSet.make([[0.0, -80.0]], [[0.0, 80.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[ms], target_segments=[tgt])
    materials = (mats.vacuum, mats.reflective)
    rx = metasurface_reaction([(lambda p, w: jnp.asarray(0.0, p.dtype),
                                "reflection")],
                              {"segments": np.asarray([0, -1])})
    rays = RaySet.make(jnp.zeros((1, 2), F64),
                       jnp.asarray([[1.0, 0.25]], F64), LAM0, dtype=F64)
    a = trace(rays, scene, materials, TraceConfig(max_bounces=2),
              reaction=rx)
    b = trace(rays, scene, materials, TraceConfig(max_bounces=2),
              reaction=default_reaction)
    np.testing.assert_allclose(np.asarray(a.rays.p1), np.asarray(b.rays.p1),
                               atol=1e-12)


def test_3d_metalens_focus():
    """The 3D hyperbolic metalens focuses a collimated grid to the axis."""
    big = 200.0
    ms = TriangleSet.make(
        [[1.0, -big, -big]], [[1.0, big, 0.0]], [[1.0, -big, big]],
        mat_in=0, mat_out=0, dtype=F64)
    det = TriangleSet.make(
        [[1.0 + FOCAL, -big, -big]], [[1.0 + FOCAL, big, 0.0]],
        [[1.0 + FOCAL, -big, big]], dtype=F64)
    scene = Scene3D.build(optical=[ms], targets=[det])
    phase = hyperbolic_metalens_phase(FOCAL, LAM0, axis=0,
                                      center=(1.0, 0.0, 0.0))
    rx = metasurface_reaction([(phase, "transmission")],
                              {"triangles": np.asarray([0, -1])})
    ys, zs = np.meshgrid(np.linspace(-0.8, 0.8, 4),
                         np.linspace(-0.8, 0.8, 4))
    n = ys.size
    p0 = np.stack([np.zeros(n), ys.ravel(), zs.ravel()], axis=1)
    rays = RaySet.make(jnp.asarray(p0, F64),
                       jnp.asarray(p0 + [1.0, 0.0, 0.0], F64), LAM0,
                       dtype=F64)
    res = trace(rays, scene, (mats.vacuum,), TraceConfig(max_bounces=2),
                reaction=rx)
    assert bool(jnp.all(res.rays.state == FINISHED))
    np.testing.assert_allclose(np.asarray(res.rays.p1[:, 1:]), 0.0,
                               atol=1e-11)


def test_phase_parameter_gradient_designs_focus():
    """A quadratic profile c r^2 is differentiable in c; gradient descent
    on the spot size recovers the paraxial coefficient c = -pi / (lam f)."""
    scene = metalens_scene_2d()
    ys = np.linspace(-0.05, 0.05, 7)  # paraxial aperture

    def spot(c):
        rx = metasurface_reaction(
            [(lambda p, w: c * (p[1] - 0.0) ** 2, "transmission")],
            {"segments": np.asarray([0, -1])})
        res = trace(collimated(ys), scene, (mats.vacuum,),
                    TraceConfig(max_bounces=2), reaction=rx)
        return jnp.sum(res.rays.p1[:, 1] ** 2)

    c = jnp.asarray(-2e-3, F64)
    g = jax.jit(jax.grad(spot))
    # the loss is ~quadratic in c with curvature ~2 sum(y^2) (2 lam/pi)^2;
    # a too-large step kicks every ray evanescent (flat fallback plateau)
    for _ in range(400):
        c = c - 3e-4 * g(c)
    expect = -math.pi / (LAM0 * FOCAL)
    np.testing.assert_allclose(float(c), expect, rtol=1e-3)


def test_metasurface_phase_counts_as_optical_path():
    """The imparted phase IS optical path (phi lambda / 2 pi): composed
    under optical_path_reaction, every collimated ray through the ideal
    metalens has EQUAL total OPL to the focus (that equality is the
    metalens design condition), and the Huygens PSF at the focus is
    diffraction-limited (Strehl ~ 1).  Regression: without the reserved
    __opl_add__ hand-off the tracker missed the phase and the coherent sum
    was scrambled."""
    from tensorflowraytrace_tpu.analysis import huygens_psf
    from tensorflowraytrace_tpu.operations import (
        metasurface_reaction, optical_path_reaction, seed_optical_path,
    )

    lam_nm = 550.0
    lam = lam_nm  # scene units = nm-scale-free here: work in units of nm
    f = 2.0e6     # 2 mm in nm units, so phase and geometry share units
    scene_ms = SegmentSet.make([[1.0e6, -5.0e6]], [[1.0e6, 5.0e6]],
                               mat_in=0, mat_out=0, dtype=F64)
    det = SegmentSet.make([[1.0e6 + f, -8.0e6]], [[1.0e6 + f, 8.0e6]],
                          dtype=F64)
    scene = Scene2D.build(optical_segments=[scene_ms],
                          target_segments=[det])
    phase = hyperbolic_metalens_phase(f, lam, axis=0, center=(1.0e6, 0.0))
    rx = optical_path_reaction(base_reaction=metasurface_reaction(
        [(phase, "transmission")], {"segments": np.asarray([0, -1])}))
    n = 31
    ys = np.linspace(-0.6e6, 0.6e6, n)
    p0 = np.stack([np.zeros(n), ys], axis=1)
    rays = seed_optical_path(
        RaySet.make(jnp.asarray(p0, F64),
                    jnp.asarray(p0 + [1.0, 0.0], F64), lam_nm, dtype=F64))
    res = trace(rays, scene, (mats.vacuum,),
                TraceConfig(max_bounces=2, new_ray_length=1.0e6),
                reaction=rx)
    assert bool(jnp.all(res.rays.state == FINISHED))

    # total OPL to the common focus: equal across the bundle
    focus = np.asarray([1.0e6 + f, 0.0])
    to_focus = np.linalg.norm(np.asarray(res.rays.p0) - focus, axis=1)
    total = np.asarray(res.rays.fields["opl"]) + to_focus
    np.testing.assert_allclose(total, total.mean(), rtol=1e-12)

    # and the coherent Huygens peak at the focus is the full (sum a)^2
    grid = jnp.asarray([focus], F64)
    peak = float(huygens_psf(res.rays.p0, res.rays.fields["opl"], lam,
                             grid)[0])
    np.testing.assert_allclose(peak, n ** 2, rtol=1e-6)
