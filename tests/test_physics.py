"""Physics golden-value tests: traced systems must reproduce textbook
optics (focal lengths, mirror equations, TIR critical angle).  The reference
had no such validation; these pin the engine to analytically known results."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    DEAD, FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.models.surfaces import ArcSet
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
F64 = jnp.float64


def paraxial_rays(n, height, x0=-5.0, direction=1.0):
    ys = np.linspace(-height, height, n)
    p0 = np.stack([np.full(n, x0), ys], axis=1)
    p1 = p0 + np.asarray([direction, 0.0])
    return RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p1, F64), 550.0,
                       dtype=F64)


def crossing_x(res):
    """x where each traced (finished) ray crosses the optical axis."""
    p0 = np.asarray(res.rays.p0)
    p1 = np.asarray(res.rays.p1)
    t = -p0[:, 1] / (p1[:, 1] - p0[:, 1])
    return p0[:, 0] + t * (p1[:, 0] - p0[:, 0])


def test_plano_convex_focal_length():
    """A single convex refracting surface (radius R, index n) focuses
    paraxial rays at f = R / (n - 1) behind the surface."""
    n_glass = 1.5
    R = 2.0
    # surface: arc centered at (R, 0) with radius R -> vertex at origin,
    # convex toward the incoming rays; glass fills the space behind
    arc = ArcSet.make([[R, 0.0]], 3 * PI / 4, 5 * PI / 4, R, mat_in=1,
                      mat_out=0, dtype=F64)
    target = SegmentSet.make([[30.0, -50.0]], [[30.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_arcs=[arc], target_segments=[target])

    rays = paraxial_rays(20, 0.05 * R)
    res = trace(rays, scene, (mats.vacuum,
                              mats.build_constant_material(n_glass)),
                TraceConfig(max_bounces=2))
    assert bool(jnp.all(res.rays.state == FINISHED))
    # for refraction INTO a medium of index n at a single spherical surface:
    # image distance (from vertex) = n R / (n - 1)
    f_expected = n_glass * R / (n_glass - 1.0)
    f_traced = crossing_x(res)
    np.testing.assert_allclose(f_traced, f_expected, rtol=0.01)


def test_spherical_mirror_focal_length():
    """A concave mirror of radius R focuses paraxial rays at R/2."""
    R = 4.0
    # mirror arc centered at origin; rays approach the CONCAVE side, so the
    # radius is negative to flip the norm toward them (the reference's
    # negative-radius convention, engine.py:666-670)
    arc = ArcSet.make([[0.0, 0.0]], 3 * PI / 4, 5 * PI / 4, -R, mat_in=1,
                      mat_out=0, dtype=F64)
    target = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]],
                             dtype=F64)  # plane through the center
    scene = Scene2D.build(optical_arcs=[arc], target_segments=[target])

    # rays travel toward -x into the concave mirror (vertex at x=-R)
    rays = paraxial_rays(20, 0.04 * R, x0=-1.0, direction=-1.0)
    res = trace(rays, scene, (mats.vacuum, mats.reflective),
                TraceConfig(max_bounces=2))
    # reflected rays cross the axis at x = -(R - R/2) = -R/2 (focal point
    # halfway between mirror vertex at -R and center at 0)
    f_traced = crossing_x(res)
    np.testing.assert_allclose(f_traced, -R / 2, rtol=0.01)


def test_tir_critical_angle():
    """Rays inside glass hitting a flat interface: refract below the
    critical angle, totally internally reflect above it."""
    n_glass = 1.5
    crit = math.asin(1.0 / n_glass)
    # interface along x=0 with norm pointing -x (toward the incoming rays);
    # the norm-side material (mat_out) is the glass the rays travel in, the
    # far side (mat_in) is vacuum
    interface = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=0,
                                mat_out=1, dtype=F64)
    scene = Scene2D.build(optical_segments=[interface])

    angles = np.asarray([crit - 0.1, crit - 0.01, crit + 0.01, crit + 0.1])
    n = len(angles)
    p0 = np.stack([-np.cos(angles), -np.sin(angles)], axis=1)
    p1 = np.zeros((n, 2))
    rays = RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p1, F64), 550.0,
                       dtype=F64)
    res = trace(rays, scene, (mats.vacuum,
                              mats.build_constant_material(n_glass)),
                TraceConfig(max_bounces=1))
    d = np.asarray(res.rays.p1 - res.rays.p0)
    # below critical angle: transmitted (continues +x); above: reflected (-x)
    assert d[0, 0] > 0 and d[1, 0] > 0
    assert d[2, 0] < 0 and d[3, 0] < 0
    # transmitted angle obeys Snell: n sin(theta1) = sin(theta2)
    sin_t2 = abs(d[0, 1]) / np.hypot(d[0, 0], d[0, 1])
    np.testing.assert_allclose(n_glass * math.sin(angles[0]), sin_t2,
                               rtol=1e-10)
    # reflected angle equals incidence angle
    sin_r = abs(d[3, 1]) / np.hypot(d[3, 0], d[3, 1])
    np.testing.assert_allclose(sin_r, math.sin(angles[3]), rtol=1e-10)


def test_optical_path_reversibility():
    """Tracing a refracted ray backward recovers the original direction
    (Snell reversibility)."""
    interface = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=1,
                                mat_out=0, dtype=F64)
    scene = Scene2D.build(optical_segments=[interface])
    materials = (mats.vacuum, mats.build_constant_material(1.5))
    cfg = TraceConfig(max_bounces=1)

    t1 = 0.5
    rays = RaySet.make(jnp.asarray([[math.cos(t1), -math.sin(t1)]], F64),
                       jnp.asarray([[0.0, 0.0]], F64), 550.0, dtype=F64)
    res = trace(rays, scene, materials, cfg)
    # reverse the refracted ray and trace back through the interface
    fwd = np.asarray(res.rays.p1[0] - res.rays.p0[0])
    back_start = np.asarray(res.rays.p0[0]) + 2.0 * fwd
    rays_back = RaySet.make(jnp.asarray([back_start], F64),
                            jnp.asarray([back_start - fwd], F64), 550.0,
                            dtype=F64)
    res_back = trace(rays_back, scene, materials, cfg)
    back = np.array(res_back.rays.p1[0] - res_back.rays.p0[0])
    back /= np.linalg.norm(back)
    orig = np.asarray([math.cos(t1), -math.sin(t1)])
    orig = -orig / np.linalg.norm(orig)
    np.testing.assert_allclose(back, -orig, atol=1e-10)

def test_2d_and_3d_engines_agree_on_planar_interface():
    """Engine-level cross-check (SURVEY section 4): the same planar
    refracting interface traced as a 2D segment scene and as a 3D triangle
    scene must land rays at the same (x, y), with z identically 0 in 3D."""
    from tensorflowraytrace_tpu import Scene3D, TriangleSet

    n = 41
    angles = np.linspace(-0.5, 0.5, n)
    d2 = np.stack([np.cos(angles), np.sin(angles)], axis=1)
    p0_2d = np.zeros((n, 2))
    rays2 = RaySet.make(jnp.asarray(p0_2d, F64), jnp.asarray(p0_2d + d2, F64),
                        550.0, dtype=F64)

    # interface at x = 1 (glass behind), target at x = 3
    iface2 = SegmentSet.make([[1.0, -4.0]], [[1.0, 4.0]], mat_in=1, mat_out=0,
                             dtype=F64)
    tgt2 = SegmentSet.make([[3.0, -6.0]], [[3.0, 6.0]], dtype=F64)
    scene2 = Scene2D.build(optical_segments=[iface2], target_segments=[tgt2])

    d3 = np.concatenate([d2, np.zeros((n, 1))], axis=1)
    p0_3d = np.zeros((n, 3))
    rays3 = RaySet.make(jnp.asarray(p0_3d, F64), jnp.asarray(p0_3d + d3, F64),
                        550.0, dtype=F64)

    def plane(x, half, **kw):
        # winding chosen so the face normal points -x, matching the 2D
        # segment's norm (atan2(dy=8, dx=0) + pi/2 = pi): the engines'
        # internal/external classification must see the same orientation
        return TriangleSet.make(
            [[x, -half, -half], [x, half, half]],
            [[x, half, half], [x, -half, -half]],
            [[x, half, -half], [x, -half, half]], dtype=F64, **kw)

    scene3 = Scene3D.build(optical=[plane(1.0, 4.0, mat_in=1, mat_out=0)],
                           targets=[plane(3.0, 6.0)])

    m = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=2)
    res2 = trace(rays2, scene2, m, cfg)
    res3 = trace(rays3, scene3, m, cfg)

    s2 = np.asarray(res2.rays.state)
    s3 = np.asarray(res3.rays.state)
    np.testing.assert_array_equal(s2, s3)
    assert (s2 == FINISHED).all()

    e2 = np.asarray(res2.rays.p1)
    e3 = np.asarray(res3.rays.p1)
    np.testing.assert_allclose(e3[:, 2], 0.0, atol=1e-9)   # stays planar
    np.testing.assert_allclose(e3[:, :2], e2, atol=1e-9)   # same landing


# ----------------------------------------------------------------------
# Fresnel intensity tracking (beyond the reference; 3-tuple reaction
# protocol in engine.single_pass)
# ----------------------------------------------------------------------

def _fresnel_R(n1, n2, theta_i):
    """Textbook unpolarized Fresnel power reflectance."""
    sin_t = n1 * math.sin(theta_i) / n2
    if abs(sin_t) >= 1.0:
        return 1.0
    theta_t = math.asin(sin_t)
    rs = (n1 * math.cos(theta_i) - n2 * math.cos(theta_t)) / \
         (n1 * math.cos(theta_i) + n2 * math.cos(theta_t))
    rp = (n1 * math.cos(theta_t) - n2 * math.cos(theta_i)) / \
         (n1 * math.cos(theta_t) + n2 * math.cos(theta_i))
    return 0.5 * (rs * rs + rp * rp)


def test_fresnel_intensity_normal_incidence_plate():
    """Normal incidence through a glass plate (2 interfaces): intensity ends
    at T^2 with T = 1 - ((n1-n2)/(n1+n2))^2."""
    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction

    n_glass = 1.52
    entry = SegmentSet.make([[1.0, -5.0]], [[1.0, 5.0]], mat_in=1, mat_out=0,
                            dtype=F64)
    exit_ = SegmentSet.make([[2.0, -5.0]], [[2.0, 5.0]], mat_in=0, mat_out=1,
                            dtype=F64)
    tgt = SegmentSet.make([[3.0, -5.0]], [[3.0, 5.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[entry, exit_],
                          target_segments=[tgt])
    n = 5
    starts = np.stack([np.zeros(n), np.linspace(-1, 1, n)], axis=1)
    rays = RaySet.make(jnp.asarray(starts, F64),
                       jnp.asarray(starts + [1.0, 0.0], F64), 550.0,
                       fields={"intensity": jnp.ones(n, F64)}, dtype=F64)
    res = trace(rays, scene,
                (mats.vacuum, mats.build_constant_material(n_glass)),
                TraceConfig(max_bounces=3),
                reaction=fresnel_intensity_reaction())
    assert bool(jnp.all(res.rays.state == FINISHED))
    T = 1.0 - ((1.0 - n_glass) / (1.0 + n_glass)) ** 2
    np.testing.assert_allclose(np.asarray(res.rays.fields["intensity"]),
                               T * T, rtol=1e-12)


def test_fresnel_intensity_oblique_and_brewster():
    """Oblique incidence matches the textbook unpolarized coefficient,
    including at Brewster's angle (rp = 0)."""
    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction

    n_glass = 1.5
    interface = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=1,
                                mat_out=0, dtype=F64)
    scene = Scene2D.build(optical_segments=[interface])
    brewster = math.atan(n_glass)
    angles = [0.3, brewster, 1.2]
    p0 = np.stack([-np.cos(angles), -np.sin(angles)], axis=1)
    p1 = np.zeros((3, 2))
    rays = RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p1, F64), 550.0,
                       fields={"intensity": jnp.ones(3, F64)}, dtype=F64)
    res = trace(rays, scene,
                (mats.vacuum, mats.build_constant_material(n_glass)),
                TraceConfig(max_bounces=1),
                reaction=fresnel_intensity_reaction())
    got = np.asarray(res.rays.fields["intensity"])
    want = [1.0 - _fresnel_R(1.0, n_glass, a) for a in angles]
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_fresnel_intensity_tir_and_mirror_lossless():
    """TIR and mirror reflections keep intensity exactly 1 (the reflected
    ray IS the continuing ray)."""
    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction

    n_glass = 1.5
    crit = math.asin(1.0 / n_glass)
    glass_iface = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=0,
                                  mat_out=1, dtype=F64)
    scene = Scene2D.build(optical_segments=[glass_iface])
    a = crit + 0.1
    rays = RaySet.make(jnp.asarray([[-math.cos(a), -math.sin(a)]], F64),
                       jnp.asarray([[0.0, 0.0]], F64), 550.0,
                       fields={"intensity": jnp.ones(1, F64)}, dtype=F64)
    res = trace(rays, scene,
                (mats.vacuum, mats.build_constant_material(n_glass)),
                TraceConfig(max_bounces=1),
                reaction=fresnel_intensity_reaction())
    np.testing.assert_allclose(
        float(res.rays.fields["intensity"][0]), 1.0, rtol=0)

    mirror = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                             mat_out=0, dtype=F64)
    mscene = Scene2D.build(optical_segments=[mirror])
    mrays = RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                        jnp.asarray([[1.0, 0.3]], F64), 550.0,
                        fields={"intensity": jnp.ones(1, F64)}, dtype=F64)
    mres = trace(mrays, mscene, (mats.vacuum, mats.reflective),
                 TraceConfig(max_bounces=1),
                 reaction=fresnel_intensity_reaction())
    np.testing.assert_allclose(
        float(mres.rays.fields["intensity"][0]), 1.0, rtol=0)


def test_fresnel_intensity_differentiable():
    """d(intensity)/d(incidence geometry) is finite and nonzero -- the
    attenuation participates in gradients."""
    import jax

    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction

    n_glass = 1.5
    interface = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], mat_in=1,
                                mat_out=0, dtype=F64)
    scene = Scene2D.build(optical_segments=[interface])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))

    def out_intensity(shift_y):
        p0 = jnp.asarray([[-1.0, 0.0]], F64) + jnp.stack(
            [jnp.zeros(1, F64), shift_y[None]], axis=1) * 0
        p1 = jnp.stack([jnp.zeros(1, F64), shift_y[None]], axis=1)
        rays = RaySet.make(p0, p1, 550.0,
                           fields={"intensity": jnp.ones(1, F64)}, dtype=F64)
        res = trace(rays, scene, materials, TraceConfig(max_bounces=1),
                    reaction=fresnel_intensity_reaction())
        return res.rays.fields["intensity"][0]

    g = jax.grad(out_intensity)(jnp.asarray(0.4, F64))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_fresnel_intensity_internal_hit_on_mat_out_mirror():
    """A surface whose mat_out is the reflective sentinel, hit from the
    internal side: the 2D geometry reflects it losslessly (the refract test's
    eta != 0 term), so the intensity must stay exactly 1 -- regression for
    the factor zeroing the ray's downstream power (eta == 0 gave R = 1 and
    the old mirror test only checked n_in == 0)."""
    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction

    # segment top->bottom so the norm points +x and a +x ray hits INTERNALLY
    mirror = SegmentSet.make([[1.0, 50.0]], [[1.0, -50.0]], mat_in=0,
                             mat_out=1, dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror])
    rays = RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                       jnp.asarray([[1.0, 0.2]], F64), 550.0,
                       fields={"intensity": jnp.ones(1, F64)}, dtype=F64)
    res = trace(rays, scene, (mats.vacuum, mats.reflective),
                TraceConfig(max_bounces=1),
                reaction=fresnel_intensity_reaction())
    # the geometry really did reflect (child heads back -x) ...
    assert float(res.rays.p1[0, 0]) < float(res.rays.p0[0, 0])
    # ... and the reflection is lossless
    np.testing.assert_allclose(
        float(res.rays.fields["intensity"][0]), 1.0, rtol=0)


def test_fresnel_intensity_factor_finite_under_nan_indices():
    """Non-finite n on a (non-reacting) slot must not leak NaN into the
    intensity value or its gradient: the engine masks the forward by
    jnp.where(reacts, ...) but the product's backward multiplies the zeroed
    cotangent by the raw factor (0 * NaN = NaN)."""
    from tensorflowraytrace_tpu.engine import Projection
    from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction

    reaction = fresnel_intensity_reaction()
    norm = jnp.asarray([np.pi, np.pi], F64)
    proj = Projection(
        hit_valid=jnp.asarray([True, False]),
        point=jnp.asarray([[1.0, 0.0], [0.0, 0.0]], F64),
        norm=norm,
        n_in=jnp.asarray([1.0, np.nan], F64),
        n_out=jnp.asarray([1.5, np.nan], F64),
        category=jnp.zeros(2, jnp.int32),
        surf_idx=jnp.zeros(2, jnp.int32),
        kind=jnp.zeros(2, jnp.int32),
        extras={},
        dim=2,
    )

    def weighted_power(p1):
        rays = RaySet.make(jnp.zeros((2, 2), F64), p1, 550.0,
                           fields={"intensity": jnp.ones(2, F64)}, dtype=F64)
        _, _, updates = reaction(proj, rays, TraceConfig(max_bounces=1))
        reacts = jnp.asarray([True, False])   # engine's masking
        out = jnp.where(reacts, updates["intensity"],
                        rays.fields["intensity"])
        return jnp.sum(out)

    p1 = jnp.asarray([[1.0, 0.0], [1.0, 0.0]], F64)
    val, grad = jax.value_and_grad(weighted_power)(p1)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))
