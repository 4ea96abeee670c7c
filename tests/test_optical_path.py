"""Optical path length tracking tests.  OPL = sum(n_i * d_i) is the
wavefront quantity: Fermat's principle says a perfect imager equalizes it
over the bundle, which pins both the leg arithmetic and the medium-index
bookkeeping to textbook results."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.operations import (
    optical_path_reaction, seed_optical_path, total_optical_path,
)
from tensorflowraytrace_tpu.ops import materials as mats

F64 = jnp.float64


def run(rays, scene, materials, bounces):
    return trace(rays, scene, materials, TraceConfig(max_bounces=bounces),
                 reaction=optical_path_reaction())


def test_opl_through_glass_slab():
    """Normal and oblique passage through a plane-parallel slab: OPL is
    d_vac1 + n * d_glass + d_vac2, each leg computed from Snell geometry."""
    n_glass = 1.5
    entry = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=F64)
    exit_ = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=0,
                            mat_out=1, dtype=F64)
    tgt = SegmentSet.make([[4.0, -50.0]], [[4.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[entry, exit_],
                          target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))

    theta = 0.5  # incidence angle in vacuum
    p0 = np.asarray([[0.0, 0.0], [0.0, 1.0]])
    d = np.asarray([[1.0, 0.0],
                    [math.cos(theta), math.sin(theta)]])
    rays = seed_optical_path(
        RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p0 + d, F64), 550.0,
                    dtype=F64))
    res = run(rays, scene, materials, 3)
    assert bool(jnp.all(res.rays.state == FINISHED))
    opl = np.asarray(total_optical_path(res.rays))

    # ray 0: normal incidence
    np.testing.assert_allclose(opl[0], 1.0 + n_glass * 1.0 + 2.0, rtol=1e-14)
    # ray 1: oblique; in-glass angle from Snell
    theta_g = math.asin(math.sin(theta) / n_glass)
    expect = (1.0 / math.cos(theta)            # vacuum leg to x=1
              + n_glass / math.cos(theta_g)    # glass leg to x=2
              + 2.0 / math.cos(theta))         # vacuum leg to x=4
    np.testing.assert_allclose(opl[1], expect, rtol=1e-13)


def test_opl_mirror_keeps_medium():
    """Reflection does not change the traveling medium: a vacuum ray folded
    by a mirror accumulates pure geometric length."""
    mirror = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=1,
                             mat_out=0, dtype=F64)
    tgt = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror], target_segments=[tgt])
    rays = seed_optical_path(
        RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                    jnp.asarray([[1.0, 0.25]], F64), 550.0, dtype=F64))
    res = run(rays, scene, (mats.vacuum, mats.reflective), 2)
    assert int(res.rays.state[0]) == FINISHED
    hyp = math.hypot(2.0, 0.5)  # out and back, same slope
    np.testing.assert_allclose(float(total_optical_path(res.rays)[0]),
                               2 * hyp, rtol=1e-14)
    np.testing.assert_allclose(float(res.rays.fields["cur_n"][0]), 1.0)


def hyperbola_x(y, f, n):
    """Single refracting surface (vacuum -> glass, vertex at origin) that
    focuses collimated light perfectly at (f, 0) INSIDE the glass: Fermat
    gives x (1 - 1/n^2) x^2 - 2 f (1 - 1/n) x + y^2 = 0 -- a hyperbola with
    eccentricity n.  Returns the branch through the vertex."""
    a = 1.0 - 1.0 / n ** 2
    b = -2.0 * f * (1.0 - 1.0 / n)
    c = y ** 2
    return (-b - np.sqrt(b * b - 4 * a * c)) / (2 * a)


def build_hyperbolic_surface(f, n_glass, half_aperture, n_segments):
    ys = np.linspace(-half_aperture, half_aperture, n_segments + 1)
    xs = hyperbola_x(ys, f, n_glass)
    p0 = np.stack([xs[:-1], ys[:-1]], axis=1)
    p1 = np.stack([xs[1:], ys[1:]], axis=1)
    # glass fills x > surface; segment norms must face the incoming rays
    # (-x side): with p0->p1 going +y the norm is atan2+pi/2 pointing -x
    return SegmentSet.make(p0, p1, mat_in=1, mat_out=0, dtype=F64)


def test_fermat_perfect_focus_equal_opl():
    """The eccentricity-n hyperbolic entrance surface focuses collimated
    rays to a point inside the glass, and (Fermat) every ray's OPL from the
    launch plane to the focus is IDENTICAL.  This pins the full pipeline:
    Snell geometry, per-leg n weighting, the final-leg closure."""
    n_glass = 1.5
    f = 3.0
    half_ap = 1.2
    surf = build_hyperbolic_surface(f, n_glass, half_ap, 4096)
    # target: tiny vertical segment at the focus (rays converge onto it)
    tgt = SegmentSet.make([[f, -0.05]], [[f, 0.05]], dtype=F64)
    scene = Scene2D.build(optical_segments=[surf], target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))

    n_rays = 64
    ys = np.linspace(-0.95 * half_ap, 0.95 * half_ap, n_rays)
    p0 = np.stack([np.full(n_rays, -2.0), ys], axis=1)
    rays = seed_optical_path(
        RaySet.make(jnp.asarray(p0, F64),
                    jnp.asarray(p0 + [1.0, 0.0], F64), 550.0, dtype=F64))
    res = run(rays, scene, materials, 2)
    state = np.asarray(res.rays.state)
    assert (state == FINISHED).all()

    # all rays land at the focus.  The chord normals are first-order wrong
    # in the segment size (~3e-4 rad here), so landing y is only ~1e-3
    # accurate -- but Fermat makes the OPL STATIONARY at the true surface,
    # so the OPL equality below still holds to second order.  That contrast
    # is itself the physics under test.
    land = np.asarray(res.rays.p1)
    np.testing.assert_allclose(land[:, 0], f, atol=1e-9)
    np.testing.assert_allclose(land[:, 1], 0.0, atol=2e-3)

    expect = 2.0 + n_glass * f  # axial ray: 2 in vacuum + n * f in glass

    # the helper (OPL to each ray's own landing point) carries the
    # first-order landing scatter
    opl_land = np.asarray(total_optical_path(res.rays))
    np.testing.assert_allclose(opl_land, expect, rtol=1e-4)

    # Fermat proper: OPL measured to the common focus is stationary w.r.t.
    # the surface-point perturbation (the chord is ~4e-8 off the true
    # hyperbola), so it is equal across the bundle to SECOND order
    last_p0 = np.asarray(res.rays.p0)  # the refraction point
    to_focus = np.linalg.norm(last_p0 - np.asarray([f, 0.0]), axis=1)
    opl_focus = np.asarray(res.rays.fields["opl"]) + \
        np.asarray(res.rays.fields["cur_n"]) * to_focus
    # measured residual: 1.4e-8 relative = O(sag), vs 4.5e-5 first-order
    np.testing.assert_allclose(opl_focus, expect, rtol=5e-8)
    assert opl_focus.std() < 1e-7


def test_opl_differentiable():
    """d(OPL)/d(surface position) is finite and matches finite differences
    -- OPD objectives can drive design."""
    n_glass = 1.5
    materials = (mats.vacuum, mats.build_constant_material(n_glass))

    def opl_of_x(x_iface):
        entry = SegmentSet.make(
            jnp.stack([jnp.stack([x_iface, jnp.asarray(-50.0, F64)])]),
            jnp.stack([jnp.stack([x_iface, jnp.asarray(50.0, F64)])]),
            mat_in=1, mat_out=0, dtype=F64)
        tgt = SegmentSet.make([[4.0, -50.0]], [[4.0, 50.0]], dtype=F64)
        scene = Scene2D.build(optical_segments=[entry],
                              target_segments=[tgt])
        rays = seed_optical_path(
            RaySet.make(jnp.asarray([[0.0, 0.3]], F64),
                        jnp.asarray([[1.0, 0.55]], F64), 550.0, dtype=F64))
        res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                    reaction=optical_path_reaction())
        return total_optical_path(res.rays)[0]

    x = jnp.asarray(1.7, F64)
    g = float(jax.grad(opl_of_x)(x))
    assert np.isfinite(g) and abs(g) > 0
    eps = 1e-6
    fd = (float(opl_of_x(x + eps)) - float(opl_of_x(x - eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_missing_seed_raises():
    scene = Scene2D.build(optical_segments=[SegmentSet.make(
        [[1.0, -5.0]], [[1.0, 5.0]], mat_in=1, mat_out=0, dtype=F64)])
    rays = RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                       jnp.asarray([[1.0, 0.0]], F64), 550.0, dtype=F64)
    try:
        trace(rays, scene, (mats.vacuum, mats.acrylic),
              TraceConfig(max_bounces=1), reaction=optical_path_reaction())
    except KeyError as e:
        assert "seed_optical_path" in str(e)
    else:
        raise AssertionError("expected KeyError for unseeded rays")


def test_one_sided_mirror_back_refracts_bookkeeping():
    """2D reference parity: a ray hitting an n_in == 0 mirror from the
    INTERNAL side REFRACTS through (the refract test is ``|theta2| <= 1 and
    eta != 0`` with eta = 1/n_out there, reference geometry.py:601-653) --
    the one-sided mirror.  The field trackers must follow that geometric
    branch: cur_n becomes the far side's index and the intensity takes the
    Fresnel transmittance, not the lossless-mirror factor 1 (regression:
    the reflect predicate used to include n_in == 0 unconditionally)."""
    import dataclasses

    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction

    n_glass = 1.5
    # materials: 0 = mirror sentinel, 1 = glass.  Segment oriented as in
    # test_opl_mirror_keeps_medium, so a ray arriving from +x hits the
    # mat_in side along the normal (internal hit).
    mirror = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=0,
                             mat_out=1, dtype=F64)
    tgt = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror], target_segments=[tgt])
    materials = (mats.reflective, mats.build_constant_material(n_glass))

    rays = seed_optical_path(
        RaySet.make(jnp.asarray([[4.0, 0.0]], F64),
                    jnp.asarray([[3.0, 0.0]], F64), 550.0, dtype=F64))
    rays = dataclasses.replace(
        rays, fields={**rays.fields, "intensity": jnp.ones(1, F64)})
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=optical_path_reaction(
                    base_reaction=fresnel_intensity_reaction()))
    assert int(res.rays.state[0]) == FINISHED
    # geometric parity: the ray passed THROUGH the mirror to the target
    np.testing.assert_allclose(float(res.rays.p1[0, 0]), 0.0, atol=1e-9)
    # medium bookkeeping followed the refraction: now traveling in glass
    np.testing.assert_allclose(float(res.rays.fields["cur_n"][0]), n_glass)
    # OPL: 2 in "vacuum" (seed n0=1) + 2 in glass
    np.testing.assert_allclose(float(total_optical_path(res.rays)[0]),
                               2.0 + n_glass * 2.0, rtol=1e-13)
    # intensity took the eta = 1/n_out Fresnel transmittance at normal
    # incidence, not the mirror's factor 1
    r = (1.0 / n_glass - 1.0) / (1.0 / n_glass + 1.0)
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]),
                               1.0 - r * r, rtol=1e-12)


# ----------------------------------------------------------------------
# Beer-Lambert absorption (absorption_reaction shares the medium-tracking
# machinery with OPL, so its tests live here)
# ----------------------------------------------------------------------

def test_beer_lambert_through_slab():
    """Passage through an absorbing slab: I = exp(-alpha * d_glass), legs
    in the lossless surround unaffected, final leg closed by
    final_intensity."""
    from tensorflowraytrace_tpu.operations import (
        absorption_reaction, final_intensity, seed_absorption,
    )

    alpha = 0.37
    entry = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=F64)
    exit_ = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=0,
                            mat_out=1, dtype=F64)
    tgt = SegmentSet.make([[4.0, -50.0]], [[4.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[entry, exit_],
                          target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(1.5))
    # alpha_in/alpha_out per merged segment [entry, exit, target]:
    # the glass (mat_in of entry, mat_out of exit) absorbs
    tables = {"segments": (np.asarray([alpha, 0.0, 0.0]),
                           np.asarray([0.0, alpha, 0.0]))}

    theta = 0.5
    p0 = np.asarray([[0.0, 0.0], [0.0, 1.0]])
    d = np.asarray([[1.0, 0.0], [math.cos(theta), math.sin(theta)]])
    rays = seed_absorption(
        RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p0 + d, F64), 550.0,
                    dtype=F64))
    res = trace(rays, scene, materials,
                TraceConfig(max_bounces=3),
                reaction=absorption_reaction(tables))
    assert bool(jnp.all(res.rays.state == FINISHED))
    out = np.asarray(final_intensity(res.rays))
    np.testing.assert_allclose(out[0], math.exp(-alpha * 1.0), rtol=1e-13)
    theta_g = math.asin(math.sin(theta) / 1.5)
    np.testing.assert_allclose(out[1],
                               math.exp(-alpha / math.cos(theta_g)),
                               rtol=1e-12)


def test_absorbing_final_leg_and_mirror():
    """A mirror fold keeps the current medium's alpha; the final leg to the
    target is attenuated by final_intensity (launch medium absorbing)."""
    from tensorflowraytrace_tpu.operations import (
        absorption_reaction, final_intensity, seed_absorption,
    )

    alpha0 = 0.21
    mirror = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=1,
                             mat_out=0, dtype=F64)
    tgt = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror], target_segments=[tgt])
    rays = seed_absorption(
        RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                    jnp.asarray([[1.0, 0.25]], F64), 550.0, dtype=F64),
        alpha0=alpha0)
    res = trace(rays, scene, (mats.vacuum, mats.reflective),
                TraceConfig(max_bounces=2),
                reaction=absorption_reaction({}))
    assert int(res.rays.state[0]) == FINISHED
    total_len = 2 * math.hypot(2.0, 0.5)
    np.testing.assert_allclose(float(final_intensity(res.rays)[0]),
                               math.exp(-alpha0 * total_len), rtol=1e-13)


def test_absorption_alpha_gradient():
    """d(final intensity)/d(alpha) must equal -d_glass * I (differentiable
    absorption for fitting/optimization)."""
    from tensorflowraytrace_tpu.operations import (
        absorption_reaction, final_intensity, seed_absorption,
    )

    entry = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=F64)
    exit_ = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=0,
                            mat_out=1, dtype=F64)
    tgt = SegmentSet.make([[4.0, -50.0]], [[4.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[entry, exit_],
                          target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(1.5))

    def out_intensity(alpha):
        tables = {"segments": (jnp.stack([alpha, 0.0 * alpha, 0.0 * alpha]),
                               jnp.stack([0.0 * alpha, alpha, 0.0 * alpha]))}
        rays = seed_absorption(
            RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                        jnp.asarray([[1.0, 0.0]], F64), 550.0, dtype=F64))
        res = trace(rays, scene, materials, TraceConfig(max_bounces=3),
                    reaction=absorption_reaction(tables))
        return final_intensity(res.rays)[0]

    a0 = jnp.asarray(0.4, F64)
    val = float(out_intensity(a0))
    g = float(jax.grad(out_intensity)(a0))
    np.testing.assert_allclose(val, math.exp(-0.4), rtol=1e-13)
    np.testing.assert_allclose(g, -1.0 * val, rtol=1e-10)
