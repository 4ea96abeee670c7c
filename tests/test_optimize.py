"""End-to-end optimization tests: the rebuild's acceptance gates.

test_optimize_single_arc   replicates /root/reference/dev/optimize_single_arc.py
test_simple_3d_optimize    replicates /root/reference/dev/simple_3d_optimize.py
                           (smaller mesh/ray budget, same structure)
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu import (
    FINISHED, ArcSet, RaySet, Scene2D, Scene3D, SegmentSet, TraceConfig,
    TriangleSet, trace,
)
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.optim import Optimizer
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
F64 = jnp.float64


# ----------------------------------------------------------------------
# constraints unit behavior
# ----------------------------------------------------------------------

def test_thickness_constraint_min():
    c = bd.ThicknessConstraint(0.2, "min")
    p0 = jnp.asarray([0.0, 0.5, -0.3], F64)
    p1 = jnp.asarray([0.1, 0.1, 0.1], F64)
    out = c.apply(1, [p0, p1])
    # after projection: target >= parent + 0.2 everywhere, tight somewhere
    assert float(jnp.min(out - p0)) == pytest.approx(0.2)


def test_clip_constraint():
    c = bd.ClipConstraint(-1.0, 1.0)
    out = c.apply_literal(jnp.asarray([-5.0, 0.3, 2.0], F64))
    np.testing.assert_allclose(np.asarray(out), [-1.0, 0.3, 1.0])


def test_point_constraint():
    c = bd.PointConstraint(0.5, target_vertex=0, parent="prev")
    p0 = jnp.asarray([1.0, 2.0], F64)
    p1 = jnp.asarray([0.0, 9.0], F64)
    out = c.apply(1, [p0, p1])
    assert float(out[0]) == pytest.approx(p0[0] + 0.5)
    assert float(out[1] - p1[1]) == pytest.approx(float(out[0] - p1[0]))


# ----------------------------------------------------------------------
# parametric boundary builders
# ----------------------------------------------------------------------

def yz_hex_mesh(radius, steps):
    """Hexagonal mesh rotated into the y-z plane, normals +x (the analog of
    the reference's rotate_y(90) on its disk STL)."""
    m = mt.hexagonal_mesh(radius, steps)
    pts = m.points.copy()
    m.points = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    return m


def test_parametric_triangle_boundary_builds():
    m = yz_hex_mesh(1.0, 3)
    b = bd.ParametricTriangleBoundary(m, bd.FromVectorVG((1.0, 0.0, 0.0)),
                                      mat_in=1, mat_out=0, dtype=F64)
    p = b.init_params()
    surf = b.build(p + 0.5)
    assert surf.n_surfaces == m.n_faces
    # all vertices moved +0.5 in x
    np.testing.assert_allclose(np.asarray(surf.vp[:, 0]), 0.5, atol=1e-12)
    # normals +x
    np.testing.assert_allclose(np.asarray(surf.norm[:, 0]), 1.0, atol=1e-9)
    flipped = bd.ParametricTriangleBoundary(m, bd.FromVectorVG((1.0, 0.0, 0.0)),
                                            flip_norm=True, dtype=F64)
    surf2 = flipped.build(flipped.init_params())
    np.testing.assert_allclose(np.asarray(surf2.norm[:, 0]), -1.0, atol=1e-9)


def test_vertex_update_map_masks_gradients():
    m = yz_hex_mesh(1.0, 2)
    top = mt.get_closest_point(m, (0, 0, 0))
    vum, _ = mt.mesh_parametrization_tools(m, top)
    b = bd.ParametricTriangleBoundary(m, bd.FromVectorVG((1.0, 0.0, 0.0)),
                                      vertex_update_map=vum, dtype=F64)

    def f(p):
        s = b.build(p)
        return jnp.sum(s.vp[:, 0] + s.v1[:, 0] + s.v2[:, 0])

    g = np.asarray(jax.grad(f)(b.init_params()))
    # each vertex's gradient counts only the faces allowed to move it:
    # strictly less than its total face membership for interior vertices
    counts = np.zeros(m.n_points)
    for face, mask in zip(m.faces, np.asarray(vum)):
        for v, mv in zip(face, mask):
            counts[v] += int(mv)
    np.testing.assert_allclose(g, counts, atol=1e-12)


def test_master_slave_symmetry():
    m = yz_hex_mesh(1.0, 2)

    # enforce mirror symmetry across z: masters have z >= 0
    def filter_masters(verts):
        return [i for i in range(len(verts)) if verts[i, 2] >= -1e-9]

    def attach_slaves(verts, master, available):
        mirrored = verts[master] * np.asarray([1.0, 1.0, -1.0])
        out = set()
        for s in list(available):
            if np.linalg.norm(verts[s] - mirrored) < 1e-6:
                out.add(s)
        return out

    b = bd.MasterSlaveParametricTriangleBoundary(
        filter_masters, attach_slaves, m, bd.FromVectorVG((1.0, 0.0, 0.0)),
        dtype=F64)
    p = b.init_params()
    assert p.shape[0] < m.n_points
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=p.shape))
    verts = np.asarray(b.params_to_vertices(p))
    # symmetric pairs moved identically
    for i in range(m.n_points):
        mirrored = verts[i] * np.asarray([1.0, 1.0, -1.0])
        dists = np.linalg.norm(verts - mirrored, axis=1)
        assert dists.min() < 1e-6


def test_cylindrical_guide_min_radius():
    g = bd.ParametricCylindricalGuide((0, 0, 0), (0, 0, 2.0), 0.5,
                                      theta_res=6, z_res=5,
                                      initial_taper=(1.0, 0.0),
                                      rotationally_symmetric=True, dtype=F64)
    p = g.init_params()
    assert p.shape == (5,)
    surf = g.build(p + 3.0)  # constraint subtracts the min back out
    side = np.asarray(surf.vp)
    r = np.hypot(side[:, 0], side[:, 1])
    interior = r > 1e-9  # skip cap centers
    assert r[interior].min() == pytest.approx(0.5, abs=1e-6)
    assert g.accumulator.shape[0] == g.mesh.n_points


# ----------------------------------------------------------------------
# E2E: optimize_single_arc (2D)
# ----------------------------------------------------------------------

def test_optimize_single_arc():
    """2D beam -> one trainable refractive arc -> target plane; loss is the
    squared landing height (dev/optimize_single_arc.py:31-48,72-151)."""
    beam = dist.StaticUniformBeam(-1.5, 1.5, 10)
    angles = dist.StaticUniformAngularDistribution(0.0, 0.0, 1)
    source = src.AngularSource(2, (-1.0, 0.0), 0.0, angles, beam,
                               [680.0, 620.0, 575.0, 510.0, 450.0, 400.0])
    rays0 = source.sample(dtype=F64)
    target = SegmentSet.make([[10.0, -5.0]], [[10.0, 5.0]], dtype=F64)
    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=2)

    def loss(params, key):
        p = params[0][0]
        arc = ArcSet.make(
            jnp.stack([jnp.stack([p, jnp.asarray(0.0, F64)])]),
            3 * PI / 4, 5 * PI / 4, p, mat_in=1, mat_out=0, dtype=F64)
        scene = Scene2D.build(optical_arcs=[arc], target_segments=[target])
        res = trace(rays0, scene, materials, cfg)
        finished = res.rays.state == FINISHED
        return jnp.sum(jnp.where(finished, res.rays.p1[:, 1] ** 2, 0.0))

    opt = Optimizer(loss, [jnp.asarray([5.0], F64)], learning_rate=1.0,
                    grad_clip=0.1)
    e0 = opt.single_step(None, momentum=0.8)
    for _ in range(29):
        e = opt.single_step(None, momentum=0.8)
    for _ in range(50):
        e = opt.single_step(None, lr_scale=0.1, momentum=0.9)
    assert e < 0.05 * e0, f"did not converge: {e0} -> {e}"


# ----------------------------------------------------------------------
# E2E: simple_3d_optimize (3D lens design)
# ----------------------------------------------------------------------

def test_simple_3d_optimize():
    """Random square source -> parametric two-surface lens (thickness
    constraints, vertex update map, accumulator + smoother) -> imaging loss
    against the source rank (dev/simple_3d_optimize.py)."""
    source_distance = 4.0
    magnification = 2.0
    target_distance = source_distance * magnification
    object_size = 0.2

    bp_count = 7
    ray_count = bp_count ** 2
    base_points = dist.RandomUniformSquare(object_size, bp_count)
    angles = dist.RandomUniformSphere(PI / 16.0, ray_count)
    source = src.AngularSource(3, (-source_distance, 0.0, 0.0), (1.0, 0.0, 0.0),
                               angles, base_points, [575.0] * ray_count,
                               dense=False)

    # lens must cover the beam: source spread at the lens plane is
    # ~ object_size/2 + source_distance * tan(pi/16) ~ 0.9
    zero_mesh = yz_hex_mesh(1.2, 5)
    top = mt.get_closest_point(zero_mesh, (0, 0, 0))
    vum, accumulator = mt.mesh_parametrization_tools(zero_mesh, top)
    smoother = mt.mesh_smoothing_tool(zero_mesh, [300, 50, 20, 10, 5])

    lens = bd.ParametricMultiTriangleBoundary(
        zero_mesh, bd.FromVectorVG((1.0, 0.0, 0.0)),
        [bd.ThicknessConstraint(0.0, "min"), bd.ThicknessConstraint(0.2, "min")],
        [True, False],
        vertex_update_map=vum,
        material_list=[{"mat_in": 1, "mat_out": 0}] * 2,
        dtype=F64,
    )

    half = 50.0
    target = TriangleSet.make(
        jnp.asarray([[target_distance, -half, -half], [target_distance, half, half]], F64),
        jnp.asarray([[target_distance, half, -half], [target_distance, -half, half]], F64),
        jnp.asarray([[target_distance, half, half], [target_distance, -half, -half]], F64),
        dtype=F64)

    materials = (mats.vacuum, mats.acrylic)
    cfg = TraceConfig(max_bounces=3)
    goal_scale = -(magnification * object_size)

    def loss(params, key):
        surfaces = lens.build(params)
        scene = Scene3D.build(optical=surfaces, targets=[target])
        rays = source.sample(key, dtype=F64)
        res = trace(rays, scene, materials, cfg)
        finished = res.rays.state == FINISHED
        out = res.rays.p1[:, 1:]                      # landing (y, z)
        goal = res.rays.fields["rank"] * goal_scale   # imaging goal
        err = jnp.sum((out - goal) ** 2, axis=1)
        return jnp.sum(jnp.where(finished, err, 0.0))

    opt = Optimizer(loss, lens.init_params(), learning_rate=1.0,
                    grad_clip=1e-3, key=jax.random.PRNGKey(3))

    # fixed evaluation set for a fair before/after comparison
    eval_key = jax.random.PRNGKey(99)
    e0 = float(loss(opt.parameters, eval_key))
    errors = opt.training_routine(
        [
            {"steps": 50, "learning_rate": 2e-4, "momentum": 0.8,
             "accumulators": [accumulator, accumulator],
             "smoothers": [smoother, smoother]},
            {"steps": 20, "learning_rate": (1e-4, 5e-5), "momentum": 0.9,
             "accumulators": [accumulator, accumulator],
             "smoothers": [smoother, smoother]},
        ],
        report_frequency=0, show_time=False,
    )
    e1 = float(loss(opt.parameters, eval_key))
    assert e1 < 0.3 * e0, f"lens did not improve: {e0} -> {e1}"
    # the constraint held: the lens is at least 0.2 thick
    p0, p1 = lens.constrain(opt.parameters)
    assert float(jnp.min(p1 - p0)) >= 0.2 - 1e-9
