"""Trace-engine tests: the golden-value and E2E coverage the reference never
had (SURVEY.md section 4 'rebuild consequence')."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    ACTIVE, DEAD, FINISHED, STOPPED,
    ArcSet, RaySet, Scene2D, Scene3D, SegmentSet, TraceConfig, TriangleSet, trace,
)
from tensorflowraytrace_tpu.engine import project_2d, project_3d, single_pass
from tensorflowraytrace_tpu.operations import annotate_oldest_ancestor, ghost_through
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
F64 = jnp.float64


def make_rays_2d(starts, ends, wavelength=500.0, **kw):
    return RaySet.make(jnp.asarray(starts, F64), jnp.asarray(ends, F64),
                       wavelength, dtype=F64, **kw)


# ----------------------------------------------------------------------
# 2D: segments only
# ----------------------------------------------------------------------

def two_mirror_scene():
    """Vertical mirror at x=1 (optical, reflective), target plane at x=-1."""
    mirror = SegmentSet.make([[1.0, -5.0]], [[1.0, 5.0]], mat_in=1, mat_out=0,
                             dtype=F64)
    target = SegmentSet.make([[-1.0, -5.0]], [[-1.0, 5.0]], dtype=F64)
    return Scene2D.build(optical_segments=[mirror], target_segments=[target])


def test_2d_mirror_bounce_to_target():
    scene = two_mirror_scene()
    rays = make_rays_2d([[0.0, 0.0]], [[1.0, 0.5]])  # toward mirror, upward
    materials = [mats.vacuum, mats.reflective]
    cfg = TraceConfig(max_bounces=3, new_ray_length=1.0)
    res = trace(rays, scene, materials, cfg)
    assert int(res.rays.state[0]) == FINISHED
    # hit mirror at (1, 0.5), reflect to -x, hit target at (-1, 1.5)
    np.testing.assert_allclose(np.asarray(res.rays.p0[0]), [1.0, 0.5], atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.rays.p1[0]), [-1.0, 1.5], atol=1e-9)


def test_2d_miss_goes_dead_with_stretch():
    scene = two_mirror_scene()
    rays = make_rays_2d([[0.0, 0.0]], [[0.0, 1.0]])  # straight up, misses all
    cfg = TraceConfig(max_bounces=2, dead_ray_length=10.0,
                      refractive_index_type="value")
    scene2 = Scene2D(
        segments=SegmentSet.make(
            scene.segments.p0, scene.segments.p1,
            category=scene.segments.category,
            fields={"n_in": jnp.zeros(2, F64), "n_out": jnp.ones(2, F64)},
            dtype=F64,
        ),
        arcs=None,
    )
    res = trace(rays, scene2, None, cfg)
    assert int(res.rays.state[0]) == DEAD
    np.testing.assert_allclose(np.asarray(res.rays.p1[0]), [0.0, 10.0], atol=1e-9)


def test_2d_stop_surface():
    mirror = SegmentSet.make([[1.0, -5.0]], [[1.0, 5.0]], mat_in=1, mat_out=0,
                             dtype=F64)
    stop = SegmentSet.make([[0.5, -5.0]], [[0.5, 5.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror], stop_segments=[stop])
    rays = make_rays_2d([[0.0, 0.0]], [[1.0, 0.0]])
    res = trace(rays, scene, [mats.vacuum, mats.reflective], TraceConfig(max_bounces=2))
    assert int(res.rays.state[0]) == STOPPED
    np.testing.assert_allclose(np.asarray(res.rays.p1[0]), [0.5, 0.0], atol=1e-9)


def test_2d_nearest_hit_chooses_closer_segment():
    """Two parallel optical mirrors; the ray must hit the nearer one."""
    near = SegmentSet.make([[0.6, -5.0]], [[0.6, 5.0]], mat_in=1, dtype=F64)
    far = SegmentSet.make([[2.0, -5.0]], [[2.0, 5.0]], mat_in=1, dtype=F64)
    scene = Scene2D.build(optical_segments=[far, near])  # order shuffled on purpose
    rays = make_rays_2d([[0.0, 0.0]], [[1.0, 0.0]])
    proj = project_2d(rays, scene, [mats.vacuum, mats.reflective],
                      TraceConfig())
    assert bool(proj.hit_valid[0])
    np.testing.assert_allclose(float(proj.point[0, 0]), 0.6, atol=1e-9)


# ----------------------------------------------------------------------
# 2D: arcs & refraction
# ----------------------------------------------------------------------

def test_2d_arc_intersection_and_norm():
    """Ray hits a full-circle arc; hit point on circle, norm radial."""
    arc = ArcSet.make([[2.0, 0.0]], -PI, PI, 1.0, mat_in=1, mat_out=0, dtype=F64)
    scene = Scene2D.build(optical_arcs=[arc])
    rays = make_rays_2d([[0.0, 0.0]], [[1.0, 0.0]])
    proj = project_2d(rays, scene, [mats.vacuum, mats.build_constant_material(1.5)],
                      TraceConfig())
    assert bool(proj.hit_valid[0])
    # nearest intersection with the circle is at x=1 (left rim)
    np.testing.assert_allclose(np.asarray(proj.point[0]), [1.0, 0.0], atol=1e-9)
    # norm at angle pi (pointing toward -x)
    np.testing.assert_allclose(abs(float(proj.norm[0])), PI, atol=1e-9)


def test_2d_arc_angular_window_excludes():
    """Arc spanning only the right half of the circle: a ray aimed at the
    left rim passes through the gap and hits the right rim from inside."""
    arc = ArcSet.make([[2.0, 0.0]], -PI / 2, PI / 2, 1.0, mat_in=1, dtype=F64)
    scene = Scene2D.build(optical_arcs=[arc])
    rays = make_rays_2d([[0.0, 0.0]], [[1.0, 0.0]])
    proj = project_2d(rays, scene, [mats.vacuum, mats.reflective], TraceConfig())
    assert bool(proj.hit_valid[0])
    np.testing.assert_allclose(np.asarray(proj.point[0]), [3.0, 0.0], atol=1e-9)


def test_2d_refraction_through_arc_snell():
    """Plano lens surface: refraction angle obeys Snell at an arc."""
    # circle centered at origin radius 1, glass inside (n_in behind norm)
    arc = ArcSet.make([[0.0, 0.0]], -PI, PI, 1.0, mat_in=1, mat_out=0, dtype=F64)
    target = SegmentSet.make([[-10.0, -50.0]], [[-10.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_arcs=[arc], target_segments=[target])
    # ray hits the circle at 30 degrees off-axis
    t = PI / 6
    start = jnp.asarray([[2.0, math.sin(t)]], F64)
    end = jnp.asarray([[0.0, math.sin(t)]], F64)
    rays = RaySet.make(start, end, 500.0, dtype=F64)
    n_glass = 1.5
    res = trace(rays, scene, [mats.vacuum, mats.build_constant_material(n_glass)],
                TraceConfig(max_bounces=1))
    # after 1 bounce the ray is refracted inside the glass
    d = np.array(res.rays.p1[0] - res.rays.p0[0])
    # incidence angle at the hit: surface normal is radial
    hit = np.asarray(res.rays.p0[0])
    norm = hit / np.linalg.norm(hit)
    cos_t2 = abs(d @ norm) / np.linalg.norm(d)
    sin_t1 = abs((-1.0) * norm[1] - 0.0 * norm[0])  # 2D cross product z-component
    sin_t2 = math.sqrt(1 - cos_t2 ** 2)
    np.testing.assert_allclose(1.0 * sin_t1, n_glass * sin_t2, atol=1e-9)


def test_2d_seg_or_arc_resolution():
    """A segment in front of an arc: the segment must win."""
    seg = SegmentSet.make([[0.5, -5.0]], [[0.5, 5.0]], mat_in=1, dtype=F64)
    arc = ArcSet.make([[2.0, 0.0]], -PI, PI, 1.0, mat_in=1, dtype=F64)
    scene = Scene2D.build(optical_segments=[seg], optical_arcs=[arc])
    rays = make_rays_2d([[0.0, 0.0]], [[1.0, 0.0]])
    proj = project_2d(rays, scene, [mats.vacuum, mats.reflective], TraceConfig())
    np.testing.assert_allclose(float(proj.point[0, 0]), 0.5, atol=1e-9)


# ----------------------------------------------------------------------
# 3D
# ----------------------------------------------------------------------

def quad(x, half, **kw):
    """Two triangles forming a square of half-size `half` in the y-z plane at x."""
    vp = [[x, -half, -half], [x, half, half]]
    v1 = [[x, half, -half], [x, -half, half]]
    v2 = [[x, half, half], [x, -half, -half]]
    return TriangleSet.make(jnp.asarray(vp, F64), jnp.asarray(v1, F64),
                            jnp.asarray(v2, F64), dtype=F64, **kw)


def test_3d_mirror_bounce_to_target():
    mirror = quad(1.0, 5.0, mat_in=1, mat_out=0)
    target = quad(-1.0, 50.0)
    scene = Scene3D.build(optical=[mirror], targets=[target])
    rays = RaySet.make(jnp.asarray([[0.0, 0.0, 0.0]], F64),
                       jnp.asarray([[1.0, 0.3, 0.2]], F64), 500.0, dtype=F64)
    res = trace(rays, scene, [mats.vacuum, mats.reflective],
                TraceConfig(max_bounces=3))
    assert int(res.rays.state[0]) == FINISHED
    np.testing.assert_allclose(np.asarray(res.rays.p0[0]), [1.0, 0.3, 0.2], atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.rays.p1[0]), [-1.0, 0.9, 0.6], atol=1e-9)


def test_3d_nearest_of_many(rng):
    """Stack of parallel quads; every ray must hit the closest one."""
    quads = [quad(float(x), 5.0, mat_in=1) for x in [3.0, 1.0, 2.0, 1.5]]
    scene = Scene3D.build(optical=quads)
    n = 33  # deliberately not a multiple of the surface chunk
    starts = np.zeros((n, 3))
    starts[:, 1] = rng.uniform(-1, 1, n)
    ends = starts + np.array([1.0, 0.0, 0.0])
    rays = RaySet.make(jnp.asarray(starts, F64), jnp.asarray(ends, F64),
                       500.0, dtype=F64)
    proj = project_3d(rays, scene, [mats.vacuum, mats.reflective],
                      TraceConfig(surf_chunk=3))
    assert bool(jnp.all(proj.hit_valid))
    np.testing.assert_allclose(np.asarray(proj.point[:, 0]), 1.0, atol=1e-9)


def test_3d_refraction_snells_law():
    """Flat glass interface: vector Snell through the full engine."""
    glass = quad(1.0, 50.0, mat_in=1, mat_out=0)  # face normal +x (glass behind)
    target = quad(-5.0, 500.0)
    scene = Scene3D.build(optical=[glass], targets=[target])
    t1 = PI / 6
    # ray arrives from the normal side (vacuum), external incidence t1
    rays = RaySet.make(
        jnp.asarray([[1.0 + math.cos(t1), -math.sin(t1), 0.0]], F64),
        jnp.asarray([[1.0, 0.0, 0.0]], F64), 500.0, dtype=F64)
    n_glass = 1.5
    res = trace(rays, scene, [mats.vacuum, mats.build_constant_material(n_glass)],
                TraceConfig(max_bounces=1))
    d = np.array(res.rays.p1[0] - res.rays.p0[0])
    d /= np.linalg.norm(d)
    sin_t2 = math.hypot(d[1], d[2])
    np.testing.assert_allclose(math.sin(t1), n_glass * sin_t2, atol=1e-9)


def test_ghost_through_reaction():
    glass = quad(1.0, 50.0, mat_in=1, mat_out=0)
    target = quad(3.0, 500.0)
    scene = Scene3D.build(optical=[glass], targets=[target])
    rays = RaySet.make(jnp.asarray([[0.0, 0.5, 0.5]], F64),
                       jnp.asarray([[1.0, 1.0, 1.0]], F64), 500.0, dtype=F64)
    res = trace(rays, scene, [mats.vacuum, mats.vacuum],
                TraceConfig(max_bounces=2), reaction=ghost_through)
    assert int(res.rays.state[0]) == FINISHED
    # direction never changed
    d = np.array(res.rays.p1[0] - res.rays.p0[0])
    d /= np.linalg.norm(d)
    expected = np.array([1.0, 0.5, 0.5])
    expected /= np.linalg.norm(expected)
    np.testing.assert_allclose(d, expected, atol=1e-9)


# ----------------------------------------------------------------------
# slot semantics: inheritance, history, gradients
# ----------------------------------------------------------------------

def test_field_inheritance_rides_slot():
    scene = two_mirror_scene()
    rays = make_rays_2d([[0.0, 0.0], [0.0, 1.0]], [[1.0, 0.5], [1.0, 1.5]],
                        fields={"rank": jnp.asarray([0.25, 0.75], F64)})
    rays = annotate_oldest_ancestor(rays)
    res = trace(rays, scene, [mats.vacuum, mats.reflective], TraceConfig(max_bounces=3))
    np.testing.assert_allclose(np.asarray(res.rays.fields["rank"]), [0.25, 0.75])
    np.testing.assert_array_equal(np.asarray(res.rays.fields["oldest_ancestor"]), [0, 1])
    assert int(res.rays.state[0]) == FINISHED


def test_history_reconstructs_path():
    scene = two_mirror_scene()
    rays = make_rays_2d([[0.0, 0.0]], [[1.0, 0.5]])
    res = trace(rays, scene, [mats.vacuum, mats.reflective],
                TraceConfig(max_bounces=3, keep_history=True))
    assert res.history_p0.shape == (3, 1, 2)
    # bounce 0: source ray projected onto the mirror, still active
    np.testing.assert_allclose(np.asarray(res.history_p0[0, 0]), [0.0, 0.0])
    np.testing.assert_allclose(np.asarray(res.history_p1[0, 0]), [1.0, 0.5])
    assert int(res.history_state[0, 0]) == ACTIVE
    assert bool(res.history_alive[0, 0])
    # bounce 1: reflected ray lands on the target, finished
    np.testing.assert_allclose(np.asarray(res.history_p0[1, 0]), [1.0, 0.5])
    np.testing.assert_allclose(np.asarray(res.history_p1[1, 0]), [-1.0, 1.5])
    assert int(res.history_state[1, 0]) == FINISHED
    # bounce 2: slot frozen, not alive
    assert not bool(res.history_alive[2, 0])


def test_trace_is_jittable_and_differentiable():
    """Gradient of a landing-position loss w.r.t. mirror position is correct:
    moving the mirror at x=m moves the landing y by 2*dm*slope."""
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=3)

    def loss(mirror_x):
        mirror = SegmentSet.make(
            jnp.stack([jnp.stack([mirror_x, jnp.asarray(-5.0, F64)])]),
            jnp.stack([jnp.stack([mirror_x, jnp.asarray(5.0, F64)])]),
            mat_in=1, dtype=F64)
        target = SegmentSet.make([[-1.0, -50.0]], [[-1.0, 50.0]], dtype=F64)
        scene = Scene2D.build(optical_segments=[mirror], target_segments=[target])
        rays = make_rays_2d([[0.0, 0.0]], [[1.0, 0.5]])
        res = trace(rays, scene, materials, cfg)
        return res.rays.p1[0, 1]  # landing y on the target

    loss_j = jax.jit(loss)
    m = jnp.asarray(1.0, F64)
    y0 = float(loss_j(m))
    # geometry: y_land = slope * (2m + 1) with slope 0.5
    np.testing.assert_allclose(y0, 1.5, atol=1e-9)
    g = jax.grad(loss)(m)
    np.testing.assert_allclose(float(g), 1.0, atol=1e-8)  # d/dm [0.5(2m+1)] = 1


def test_trace_3d_gradient_through_vertices():
    """Finite-difference check of d(landing)/d(mirror tilt) in 3D."""
    materials = (mats.vacuum, mats.reflective)
    cfg = TraceConfig(max_bounces=2)

    def loss(tilt):
        # mirror quad at x=1 tilted by `tilt` around the y axis
        vp = jnp.asarray([[1.0, -5.0, -5.0], [1.0, 5.0, 5.0]], F64)
        v1 = jnp.asarray([[1.0, 5.0, -5.0], [1.0, -5.0, 5.0]], F64)
        v2 = jnp.asarray([[1.0, 5.0, 5.0], [1.0, -5.0, -5.0]], F64)
        shift = jnp.stack([tilt * vp[:, 2], jnp.zeros(2, F64), jnp.zeros(2, F64)], axis=1)
        mirror = TriangleSet.make(vp + shift, v1 + jnp.stack(
            [tilt * v1[:, 2], jnp.zeros(2, F64), jnp.zeros(2, F64)], axis=1),
            v2 + jnp.stack([tilt * v2[:, 2], jnp.zeros(2, F64), jnp.zeros(2, F64)],
                           axis=1), mat_in=1, dtype=F64)
        target = quad(-1.0, 500.0)
        scene = Scene3D.build(optical=[mirror], targets=[target])
        rays = RaySet.make(jnp.asarray([[0.0, 0.0, 0.1]], F64),
                           jnp.asarray([[1.0, 0.0, 0.1]], F64), 500.0, dtype=F64)
        res = trace(rays, scene, materials, cfg)
        return res.rays.p1[0, 2]  # landing z

    g = float(jax.grad(loss)(jnp.asarray(0.0, F64)))
    eps = 1e-6
    fd = (float(loss(jnp.asarray(eps, F64))) - float(loss(jnp.asarray(-eps, F64)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_inference_mode_matches_differentiable():
    """TraceConfig(differentiable=False) gives identical forward results."""
    scene = two_mirror_scene()
    rays = make_rays_2d([[0.0, 0.0], [0.0, 1.0]], [[1.0, 0.5], [1.0, 1.2]])
    materials = (mats.vacuum, mats.reflective)
    # 3D variant
    mirror = quad(1.0, 5.0, mat_in=1, mat_out=0)
    target = quad(-1.0, 50.0)
    scene3 = Scene3D.build(optical=[mirror], targets=[target])
    rays3 = RaySet.make(jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.5, -0.5]], F64),
                        jnp.asarray([[1.0, 0.3, 0.2], [1.0, 0.0, 0.1]], F64),
                        500.0, dtype=F64)
    for sc, r in ((scene3, rays3),):
        res_d = trace(r, sc, materials, TraceConfig(max_bounces=3))
        res_i = trace(r, sc, materials,
                      TraceConfig(max_bounces=3, differentiable=False))
        np.testing.assert_array_equal(np.asarray(res_d.rays.state),
                                      np.asarray(res_i.rays.state))
        np.testing.assert_allclose(np.asarray(res_d.rays.p1),
                                   np.asarray(res_i.rays.p1), atol=1e-9)
        np.testing.assert_allclose(np.asarray(res_d.rays.p0),
                                   np.asarray(res_i.rays.p0), atol=1e-9)


def test_traceconfig_recommended():
    """TraceConfig.recommended picks platform/scene-appropriate settings."""
    from tensorflowraytrace_tpu import Scene2D, Scene3D, SegmentSet, TraceConfig, TriangleSet

    tri = TriangleSet.make(np.zeros((3000, 3)), np.ones((3000, 3)),
                           np.full((3000, 3), 2.0))
    s3 = Scene3D.build(optical=[tri])
    cfg = TraceConfig.recommended(s3, max_bounces=24)
    # on CPU tests use_pallas/cull are off; remat on for deep traces
    assert cfg.remat and cfg.max_bounces == 24
    assert not cfg.use_pallas and not cfg.cull and not cfg.resort_rays

    seg = SegmentSet.make(np.zeros((10, 2)), np.ones((10, 2)))
    s2 = Scene2D.build(optical_segments=[seg])
    cfg2 = TraceConfig.recommended(s2, max_bounces=3, keep_history=True)
    assert not cfg2.remat and cfg2.keep_history


def test_degenerate_reaction_dies_cleanly():
    """Numeric backstop: a reaction that produces non-finite children must
    kill the ray (state DEAD) while keeping its coordinates finite."""
    from tensorflowraytrace_tpu import DEAD, RaySet, Scene3D, TraceConfig, TriangleSet
    from tensorflowraytrace_tpu.engine import single_pass
    from tensorflowraytrace_tpu.ops import materials as mats

    half = 5.0
    mirror = TriangleSet.make(
        [[1.0, -half, -half], [1.0, half, half]],
        [[1.0, half, -half], [1.0, -half, half]],
        [[1.0, half, half], [1.0, -half, -half]], mat_in=1)
    scene = Scene3D.build(optical=[mirror])
    rays = RaySet.make([[0.0, 0.0, 0.0]], [[1.0, 0.0, 0.0]], 500.0)

    def nan_reaction(proj, r, cfg):
        bad = jnp.full_like(r.p0, jnp.nan)
        return bad, bad

    out, _ = single_pass(rays, scene, (mats.vacuum, mats.reflective),
                         TraceConfig(max_bounces=1), reaction=nan_reaction)
    assert int(out.state[0]) == DEAD
    assert np.isfinite(np.asarray(out.p0)).all()
    assert np.isfinite(np.asarray(out.p1)).all()


def test_chunked_search_pads_nondivisible_ray_blocks(rng):
    """A ray count not divisible by ray_block must still block (and agree
    with the unblocked path) -- it used to fall back to one giant block
    (VERDICT.md round-1 weak #4)."""
    from tensorflowraytrace_tpu.ops import intersect as isect

    n_rays, n_tri = 103, 40
    p0 = jnp.asarray(rng.normal(size=(n_rays, 3)) * 3, F64)
    p1 = p0 + jnp.asarray(rng.normal(size=(n_rays, 3)) * 5, F64)
    vp = jnp.asarray(rng.normal(size=(n_tri, 3)) * 2, F64)
    v1 = vp + jnp.asarray(rng.normal(size=(n_tri, 3)), F64)
    v2 = vp + jnp.asarray(rng.normal(size=(n_tri, 3)), F64)
    tri = TriangleSet.make(vp, v1, v2, dtype=F64)

    kw = dict(intersect_eps=1e-10, size_eps=1e-10, ray_start_eps=1e-10)
    ref = isect.nearest_hit_triangles(p0, p1, tri, ray_block=1 << 20, **kw)
    # ray_block=32 -> 103 rays = 3 full blocks + a 7-ray remainder
    got = isect.nearest_hit_triangles(p0, p1, tri, ray_block=32, **kw)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(np.asarray(ref.idx)[v], np.asarray(got.idx)[v])
    np.testing.assert_allclose(np.asarray(ref.ray_u)[v], np.asarray(got.ray_u)[v])
    assert v.any()  # the comparison actually exercised hits


def test_material_index_range_guard():
    """mat ids >= 1024 would corrupt the packed f32 surface table; the build
    must reject them loudly (VERDICT.md round-1 weak #5)."""
    import pytest

    with pytest.raises(ValueError, match="material index"):
        TriangleSet.make([[0.0, 0, 0]], [[1.0, 0, 0]], [[0.0, 1, 0]],
                         mat_in=1024, dtype=F64)
    with pytest.raises(ValueError, match="material index"):
        SegmentSet.make([[0.0, 0]], [[1.0, 0]], mat_out=-1, dtype=F64)


# ----------------------------------------------------------------------
# in-scan folds: history-free deep-trace reductions (SURVEY hard part 6)
# ----------------------------------------------------------------------

def tir_guide_scene():
    guide = SegmentSet.make(
        [[-0.1, -4.0], [0.0, 4.0], [0.1, -4.0]],
        [[0.0, 4.0], [0.1, -4.0], [-0.1, -4.0]],
        mat_in=1, mat_out=0, dtype=F64)
    exitp = SegmentSet.make([[-0.3, 4.2]], [[0.3, 4.2]], dtype=F64)
    return Scene2D.build(optical_segments=[guide], target_segments=[exitp])


def guide_rays(n, key=0):
    from tensorflowraytrace_tpu.models import distributions as dist
    from tensorflowraytrace_tpu.models import sources as src

    angles = dist.RandomLambertianAngularDistribution(-0.3 * PI, 0.3 * PI, n)
    beam = dist.RandomUniformBeam(-0.09, 0.09, n)
    s = src.AngularSource(2, (0.0, -3.999), PI / 2, angles, beam, [575.0] * n,
                          dense=False)
    return s.sample(jax.random.PRNGKey(key), dtype=F64)


def test_landing_sum_fold_matches_final_slot_loss():
    from tensorflowraytrace_tpu.engine import landing_sum_fold

    scene = tir_guide_scene()
    rays = guide_rays(400)
    m = (mats.vacuum, mats.acrylic)
    value_fn = lambda p1: (p1[:, 0] - 0.05) ** 2
    init, fn = landing_sum_fold(value_fn, F64)
    cfg = TraceConfig(max_bounces=50, remat=True)  # no history
    res = trace(rays, scene, m, cfg, fold_fn=fn, fold_init=init)
    assert res.history_p0 is None
    fin = res.rays.state == FINISHED
    direct = jnp.sum(jnp.where(fin, value_fn(res.rays.p1), 0.0))
    np.testing.assert_allclose(float(res.fold), float(direct), rtol=1e-12)
    assert float(direct) > 0  # rays actually finished


def test_path_length_fold_matches_history():
    from tensorflowraytrace_tpu.engine import path_length_fold

    scene = tir_guide_scene()
    rays = guide_rays(200, key=1)
    m = (mats.vacuum, mats.acrylic)
    init, fn = path_length_fold(rays.n_rays, F64)
    cfg = TraceConfig(max_bounces=30, keep_history=True)
    res = trace(rays, scene, m, cfg, fold_fn=fn, fold_init=init)
    seg = np.linalg.norm(
        np.asarray(res.history_p1) - np.asarray(res.history_p0), axis=-1)
    expect = (seg * np.asarray(res.history_alive)).sum(axis=0)
    np.testing.assert_allclose(np.asarray(res.fold), expect, rtol=1e-12)
    assert expect.max() > 8.0  # multi-bounce paths actually accumulated


def test_fold_is_differentiable_with_remat():
    """Gradient of an in-scan landing loss w.r.t. guide geometry, under remat,
    matches the gradient of the final-slot loss."""
    from tensorflowraytrace_tpu.engine import landing_sum_fold

    rays = guide_rays(200, key=2)
    m = (mats.vacuum, mats.acrylic)

    def build_scene(half_w):
        guide = SegmentSet.make(
            jnp.stack([jnp.stack([-half_w, jnp.asarray(-4.0, F64)]),
                       jnp.stack([jnp.asarray(0.0, F64), jnp.asarray(4.0, F64)]),
                       jnp.stack([half_w, jnp.asarray(-4.0, F64)])]),
            jnp.stack([jnp.stack([jnp.asarray(0.0, F64), jnp.asarray(4.0, F64)]),
                       jnp.stack([half_w, jnp.asarray(-4.0, F64)]),
                       jnp.stack([-half_w, jnp.asarray(-4.0, F64)])]),
            mat_in=1, mat_out=0, dtype=F64)
        exitp = SegmentSet.make([[-0.3, 4.2]], [[0.3, 4.2]], dtype=F64)
        return Scene2D.build(optical_segments=[guide], target_segments=[exitp])

    value_fn = lambda p1: p1[:, 0] ** 2

    def loss_fold(hw):
        init, fn = landing_sum_fold(value_fn, F64)
        res = trace(rays, build_scene(hw), m,
                    TraceConfig(max_bounces=20, remat=True),
                    fold_fn=fn, fold_init=init)
        return res.fold

    def loss_slots(hw):
        res = trace(rays, build_scene(hw), m, TraceConfig(max_bounces=20))
        fin = res.rays.state == FINISHED
        return jnp.sum(jnp.where(fin, value_fn(res.rays.p1), 0.0))

    hw = jnp.asarray(0.1, F64)
    g_fold = jax.grad(loss_fold)(hw)
    g_slot = jax.grad(loss_slots)(hw)
    assert np.isfinite(float(g_fold)) and abs(float(g_fold)) > 0
    np.testing.assert_allclose(float(g_fold), float(g_slot), rtol=1e-9)


def test_facade_history_opt_in():
    """The facade no longer materializes history unless asked
    (VERDICT.md round-1 weak #6)."""
    import pytest

    from tensorflowraytrace_tpu.system import OpticalEngine, OpticalSystem2D

    guide = SegmentSet.make(
        [[-0.1, -4.0], [0.0, 4.0], [0.1, -4.0]],
        [[0.0, 4.0], [0.1, -4.0], [-0.1, -4.0]],
        mat_in=1, mat_out=0, dtype=F64)
    exitp = SegmentSet.make([[-0.3, 4.2]], [[0.3, 4.2]], dtype=F64)
    system = OpticalSystem2D(dtype=F64)
    system.optical_segments = [guide]
    system.target_segments = [exitp]
    system.sources = [guide_rays(100, key=3)]
    system.materials = [{"n": mats.vacuum}, {"n": mats.acrylic}]
    system.update()

    engine = OpticalEngine(2)
    engine.optical_system = system
    res = engine.ray_trace(50)
    assert res.history_p0 is None          # no history by default
    assert engine.finished_rays.n_rays > 0  # final-slot properties still work
    with pytest.raises(RuntimeError, match="keep_history=True"):
        engine.all_rays

    engine_h = OpticalEngine(2, keep_history=True)
    engine_h.optical_system = system
    engine_h.ray_trace(10)
    assert engine_h.all_rays["x_start"].shape[0] > 0


def test_early_exit_matches_full_scan():
    """early_exit (the reference's engine.py:2324-2330 behavior) produces the
    same final rays and fold as the fixed-budget scan."""
    from tensorflowraytrace_tpu.engine import landing_sum_fold

    scene = tir_guide_scene()
    rays = guide_rays(300, key=5)
    m = (mats.vacuum, mats.acrylic)
    value_fn = lambda p1: p1[:, 0] ** 2
    init, fn = landing_sum_fold(value_fn, F64)
    # a 200-bounce budget the guide never exhausts
    r_scan = trace(rays, scene, m, TraceConfig(max_bounces=200),
                   fold_fn=fn, fold_init=init)
    r_exit = trace(rays, scene, m, TraceConfig(max_bounces=200, early_exit=True),
                   fold_fn=fn, fold_init=init)
    np.testing.assert_array_equal(np.asarray(r_scan.rays.state),
                                  np.asarray(r_exit.rays.state))
    np.testing.assert_array_equal(np.asarray(r_scan.rays.p1),
                                  np.asarray(r_exit.rays.p1))
    np.testing.assert_allclose(float(r_scan.fold), float(r_exit.fold))
    assert not bool(jnp.any(r_exit.rays.state == 0))  # all rays terminated


def test_early_exit_reports_true_bounce_count():
    """A trace that terminates at bounce 3 of a 100-bounce budget reports
    n_bounces=3 (the early-exit observability win; scan path reports the
    static budget)."""
    from tensorflowraytrace_tpu.ops.materials import vacuum

    # two pass-through interfaces (vacuum on both sides) then a target:
    # every ray finishes on bounce 3
    s1 = SegmentSet.make([[1.0, -5.0]], [[1.0, 5.0]], mat_in=0, mat_out=0,
                         dtype=F64)
    s2 = SegmentSet.make([[2.0, -5.0]], [[2.0, 5.0]], mat_in=0, mat_out=0,
                         dtype=F64)
    tgt = SegmentSet.make([[3.0, -5.0]], [[3.0, 5.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[s1, s2], target_segments=[tgt])
    starts = np.stack([np.zeros(8), np.linspace(-1, 1, 8)], axis=1)
    rays = make_rays_2d(starts, starts + np.array([1.0, 0.0]))
    r = trace(rays, scene, (vacuum,),
              TraceConfig(max_bounces=100, early_exit=True))
    assert int(r.n_bounces) == 3
    assert bool(jnp.all(r.rays.state == 1))  # FINISHED


def test_early_exit_rejects_history():
    import pytest

    scene = tir_guide_scene()
    rays = guide_rays(10, key=6)
    with pytest.raises(ValueError, match="early_exit"):
        trace(rays, scene, (mats.vacuum, mats.acrylic),
              TraceConfig(max_bounces=5, early_exit=True, keep_history=True))


def test_value_mode_matches_index_mode_segments_and_arcs():
    """'value' mode (per-surface n floats) must trace identically to 'index'
    mode (material-list ids) on a mixed segment+arc scene -- covers both
    branches of the engine's fused annotation column."""
    n_glass = 1.52
    rng = np.random.default_rng(3)
    starts = np.zeros((16, 2))
    dirs = np.stack([np.ones(16), rng.uniform(-0.4, 0.4, 16)], axis=1)
    rays = make_rays_2d(starts, starts + dirs)

    seg_idx = SegmentSet.make([[1.0, -4.0]], [[1.0, 4.0]], mat_in=1,
                              mat_out=0, dtype=F64)
    arc_idx = ArcSet.make([[4.0, 0.0]], -2.0, 2.0, 2.5, mat_in=1, mat_out=0,
                          dtype=F64)
    tgt = SegmentSet.make([[8.0, -8.0]], [[8.0, 8.0]], dtype=F64)
    scene_idx = Scene2D.build(optical_segments=[seg_idx],
                              optical_arcs=[arc_idx], target_segments=[tgt])

    from tensorflowraytrace_tpu.ops.materials import build_constant_material, vacuum
    res_idx = trace(rays, scene_idx, (vacuum, build_constant_material(n_glass)),
                    TraceConfig(max_bounces=3))

    nin = {"n_in": jnp.full(1, n_glass, F64), "n_out": jnp.ones(1, F64)}
    seg_val = SegmentSet.make([[1.0, -4.0]], [[1.0, 4.0]], fields=dict(nin),
                              dtype=F64)
    arc_val = ArcSet.make([[4.0, 0.0]], -2.0, 2.0, 2.5, fields=dict(nin),
                          dtype=F64)
    tgt_val = SegmentSet.make([[8.0, -8.0]], [[8.0, 8.0]],
                              fields={"n_in": jnp.zeros(1, F64),
                                      "n_out": jnp.ones(1, F64)}, dtype=F64)
    scene_val = Scene2D.build(optical_segments=[seg_val],
                              optical_arcs=[arc_val],
                              target_segments=[tgt_val])
    res_val = trace(rays, scene_val, None,
                    TraceConfig(max_bounces=3, refractive_index_type="value"))

    np.testing.assert_array_equal(np.asarray(res_idx.rays.state),
                                  np.asarray(res_val.rays.state))
    np.testing.assert_allclose(np.asarray(res_idx.rays.p1),
                               np.asarray(res_val.rays.p1), atol=1e-12)


def test_traceconfig_recommended_tpu_policy(monkeypatch):
    """The TPU-side policy matrix (mocked platform: tests force CPU):
    grid+resort for large 3D, grid for large 2D (segments OR arcs),
    block culling for small 2D."""
    class _FakeTpu:
        platform = "tpu"

    monkeypatch.setattr(jax, "devices", lambda *a, **k: [_FakeTpu()])

    tri = TriangleSet.make(np.zeros((3000, 3)), np.ones((3000, 3)),
                           np.full((3000, 3), 2.0))
    cfg = TraceConfig.recommended(Scene3D.build(optical=[tri]))
    assert cfg.use_pallas and cfg.cull == "grid" and cfg.resort_rays

    arcs = ArcSet.make(np.zeros((2000, 2)), -1.0, 1.0, 1.0)
    cfg = TraceConfig.recommended(Scene2D.build(optical_arcs=[arcs]))
    assert cfg.cull == "grid" and not cfg.resort_rays

    seg = SegmentSet.make(np.zeros((10, 2)), np.ones((10, 2)))
    cfg = TraceConfig.recommended(Scene2D.build(optical_segments=[seg]))
    assert cfg.cull is True and not cfg.resort_rays
