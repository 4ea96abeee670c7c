"""Stateful facade tests: OpticalSystem2D/3D + OpticalEngine driving the
functional core with the reference's object API."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu import FINISHED, SegmentSet, TriangleSet
from tensorflowraytrace_tpu.models import boundaries as bd
from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.models import sources as src
from tensorflowraytrace_tpu.models.boundaries import manual_arc_boundary
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.system import (
    OpticalEngine, OpticalSystem2D, OpticalSystem3D, amalgamate,
    annotation_helper,
)

PI = math.pi
F64 = jnp.float64


def build_single_arc_system():
    """The optimize_single_arc setup in facade style
    (dev/optimize_single_arc.py:72-118)."""
    arc = manual_arc_boundary(
        x_center=[5.0], y_center=[0.0], angle_start=[3 * PI / 4],
        angle_end=[5 * PI / 4], radius=[5.0], mat_in=1, mat_out=0, dtype=F64)
    target = SegmentSet.make([[10.0, -5.0]], [[10.0, 5.0]], dtype=F64)

    beam = dist.StaticUniformBeam(-1.5, 1.5, 10)
    angles = dist.StaticUniformAngularDistribution(0.0, 0.0, 1)
    source = src.AngularSource(2, (-1.0, 0.0), 0.0, angles, beam,
                               [680.0, 620.0, 575.0, 510.0, 450.0, 400.0])

    system = OpticalSystem2D(dtype=F64)
    system.optical_arcs = [arc]
    system.sources = [source]
    system.target_segments = [target]
    system.materials = [{"n": mats.vacuum}, {"n": mats.acrylic}]
    return system


def test_2d_system_trace_via_engine():
    system = build_single_arc_system()
    engine = OpticalEngine(2, simple_ray_inheritance={"wavelength"})
    engine.optical_system = system
    system.update()
    engine.validate_system()
    engine.ray_trace(2)
    finished = engine.finished_rays
    assert finished.n_rays == 60  # all 10 beams x 6 wavelengths reach x=10
    np.testing.assert_allclose(np.asarray(finished.p1[:, 0]), 10.0, atol=1e-9)


def test_2d_system_intersect_facade():
    """system.intersect(rays) mirrors the reference's per-geometry projection
    dicts (engine.py:523-866): seg + arc results, garbage-under-valid
    contract, and the ray-start epsilon rejecting self-intersections."""
    from tensorflowraytrace_tpu.models.rays import RaySet

    system = build_single_arc_system()
    system.update()

    # horizontal unit rays from x=-1 (the beam) plus one ray starting ON the
    # target segment (ray_u=0 -> rejected by ray_start_epsilion)
    ys = np.linspace(-1.5, 1.5, 7)
    p0 = np.stack([np.full(7, -1.0), ys], axis=1)
    p0 = np.vstack([p0, [[10.0, 0.0]]])
    p1 = p0 + np.asarray([1.0, 0.0])
    rays = RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p1, F64), 575.0,
                       dtype=F64)

    seg, arc = system.intersect(rays)
    assert set(seg) == {"x", "y", "valid", "ray_u", "segment_u",
                        "gather_ray", "gather_segment", "norm"}
    assert set(arc) == {"x", "y", "valid", "ray_u", "arc_u",
                        "gather_ray", "gather_arc", "norm"}

    # beam rays hit the target segment at x=10 (infinite-ray semantics,
    # ray_u >> 1); segment_u parametrizes (10,-5)->(10,5)
    sv = np.asarray(seg["valid"])
    assert sv[:7].all()
    assert not sv[7]  # start-on-surface rejected by ray_start_epsilion
    np.testing.assert_allclose(np.asarray(seg["x"])[:7], 10.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(seg["segment_u"])[:7],
                               (ys + 5.0) / 10.0, atol=1e-9)
    np.testing.assert_allclose(np.asarray(seg["ray_u"])[:7], 11.0, atol=1e-9)
    np.testing.assert_array_equal(np.asarray(seg["gather_ray"]), np.arange(8))
    np.testing.assert_array_equal(np.asarray(seg["gather_segment"])[:7], 0)

    # arc hits: x = 5 - sqrt(25 - y^2); norm is the hit polar angle about the
    # center (reference engine.py:666-670), ~ +-pi on this left-facing arc
    av = np.asarray(arc["valid"])
    assert av[:7].all()
    np.testing.assert_allclose(np.asarray(arc["x"])[:7],
                               5.0 - np.sqrt(25.0 - ys ** 2), atol=1e-9)
    np.testing.assert_allclose(np.abs(np.asarray(arc["norm"])[:7]),
                               np.abs(np.arctan2(
                                   ys, np.asarray(arc["x"])[:7] - 5.0)),
                               atol=1e-9)


def test_3d_system_intersect_facade():
    """3D system.intersect (reference engine.py:1020-1100): hit point,
    barycentric params, gather indices, gathered norm."""
    from tensorflowraytrace_tpu.models.rays import RaySet

    half = 2.0
    wall = TriangleSet.make(
        [[1.0, -half, -half], [1.0, half, half]],
        [[1.0, half, -half], [1.0, -half, half]],
        [[1.0, half, half], [1.0, -half, -half]], mat_in=1, mat_out=0,
        dtype=F64)
    system = OpticalSystem3D(dtype=F64)
    system.optical = [wall]
    system.materials = [{"n": mats.vacuum}, {"n": mats.acrylic}]
    system.update()

    p0 = np.asarray([[0.0, 0.3, -0.2], [0.0, 0.0, 0.0], [0.0, 0.0, 5.0]])
    p1 = p0 + np.asarray([[1.0, 0.0, 0.0]])
    rays = RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p1, F64), 575.0,
                       dtype=F64)
    res = system.intersect(rays)
    v = np.asarray(res["valid"])
    assert v[0] and v[1]
    assert not v[2]  # passes beside the wall
    np.testing.assert_allclose(np.asarray(res["x"])[:2], 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res["y"])[:2], p0[:2, 1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(res["z"])[:2], p0[:2, 2], atol=1e-12)
    np.testing.assert_allclose(np.asarray(res["ray_u"])[:2], 1.0, atol=1e-12)
    tu = np.asarray(res["trig_u"])[:2]
    tv = np.asarray(res["trig_v"])[:2]
    assert ((tu >= 0) & (tv >= 0) & (tu + tv <= 1)).all()
    np.testing.assert_array_equal(np.asarray(res["gather_ray"]),
                                  np.arange(3))
    norm = np.asarray(res["norm"])[:2]
    np.testing.assert_allclose(np.abs(norm[:, 0]), 1.0, atol=1e-12)

    # an empty system returns an empty dict (reference returns {} when no
    # merged surfaces exist)
    empty = OpticalSystem3D(dtype=F64)
    assert empty.intersect(rays) == {}


def test_engine_all_rays_history():
    system = build_single_arc_system()
    engine = OpticalEngine(2, keep_history=True)
    engine.optical_system = system
    system.update()
    engine.ray_trace(2)
    rays = engine.all_rays
    # each of the 60 rays appears twice (source->arc, arc->target)
    assert rays["x_start"].shape == (120,)


def test_annotation_helper_reapplies_on_update():
    arc = manual_arc_boundary(
        x_center=[5.0], y_center=[0.0], angle_start=[3 * PI / 4],
        angle_end=[5 * PI / 4], radius=[5.0], dtype=F64)
    system = build_single_arc_system()
    system.optical_arcs = [arc]
    entry = system.optical_arcs[0]
    annotation_helper(entry, "mat_in", 1, "x_center", dtype=jnp.int32)
    annotation_helper(entry, "mat_out", 0, "x_center", dtype=jnp.int32)
    system.update()
    assert int(system.optical_arcs[0].surface_set.mat_in[0]) == 1
    engine = OpticalEngine(2)
    engine.optical_system = system
    engine.ray_trace(2)
    assert engine.finished_rays.n_rays == 60


def test_validate_system_catches_bad_material_index():
    system = build_single_arc_system()
    system.materials = [{"n": mats.vacuum}]  # mat_in=1 now out of range
    engine = OpticalEngine(2)
    engine.optical_system = system
    system.update()
    with pytest.raises(ValueError, match="material index"):
        engine.validate_system()


def test_engine_dimension_mismatch():
    system = build_single_arc_system()
    engine = OpticalEngine(3)
    with pytest.raises(ValueError):
        engine.optical_system = system


def test_3d_system_with_parametric_lens():
    zero_mesh = mt.hexagonal_mesh(1.2, 3)
    pts = zero_mesh.points.copy()
    zero_mesh.points = np.stack([pts[:, 2], pts[:, 0], pts[:, 1]], axis=1)
    lens = bd.ParametricMultiTriangleBoundary(
        zero_mesh, bd.FromVectorVG((1.0, 0.0, 0.0)),
        [bd.ThicknessConstraint(0.0, "min"), bd.ThicknessConstraint(0.2, "min")],
        [True, False], material_list=[{"mat_in": 1, "mat_out": 0}] * 2,
        dtype=F64)
    half = 50.0
    target = TriangleSet.make(
        [[8.0, -half, -half], [8.0, half, half]],
        [[8.0, half, -half], [8.0, -half, half]],
        [[8.0, half, half], [8.0, -half, -half]], dtype=F64)

    rc = 16
    source = src.AngularSource(
        3, (-4.0, 0.0, 0.0), (1.0, 0.0, 0.0),
        dist.RandomUniformSphere(PI / 16.0, rc),
        dist.RandomUniformSquare(0.2, 4), [575.0] * rc, dense=False)

    system = OpticalSystem3D(dtype=F64)
    system.optical = [lens]
    system.targets = [target]
    system.sources = [source]
    system.materials = [{"n": mats.vacuum}, {"n": mats.acrylic}]
    system.update()

    engine = OpticalEngine(3)
    engine.optical_system = system
    engine.validate_system()
    engine.ray_trace(3)
    assert engine.finished_rays.n_rays == rc

    # mutate the lens parameters; update() rebuilds the scene from them
    lens.parameters = [p + 0.1 for p in lens.parameters]
    system.update()
    engine.ray_trace(3)
    assert engine.finished_rays.n_rays == rc

    # random source resamples on update
    r1 = np.asarray(system.sources.p0)
    system.update()
    r2 = np.asarray(system.sources.p0)
    assert not np.allclose(r1, r2)


def test_amalgamate_field_dicts():
    a = {"x": jnp.asarray([1.0, 2.0]), "y": jnp.asarray([0.0, 0.0])}
    b = {"x": jnp.asarray([3.0]), "y": jnp.asarray([1.0]), "z": jnp.asarray([9.0])}
    out = amalgamate([a, b])
    assert set(out.keys()) == {"x", "y"}
    np.testing.assert_allclose(np.asarray(out["x"]), [1.0, 2.0, 3.0])


def _facade_sgd_problem():
    class TrainableArc:
        """Minimal parametric arc builder: x_center == radius == p[0]."""

        def __init__(self):
            self.parameters = None

        def init_params(self):
            return jnp.asarray([5.0], F64)

        def build(self, p):
            from tensorflowraytrace_tpu.models.surfaces import ArcSet

            r = p[0]
            center = jnp.stack([jnp.stack([r, jnp.asarray(0.0, F64)])])
            return ArcSet.make(center, 3 * PI / 4, 5 * PI / 4, r,
                               mat_in=1, mat_out=0, dtype=F64)

    arc = TrainableArc()
    target = SegmentSet.make([[10.0, -5.0]], [[10.0, 5.0]], dtype=F64)
    beam = dist.StaticUniformBeam(-1.5, 1.5, 10)
    angles = dist.StaticUniformAngularDistribution(0.0, 0.0, 1)
    source = src.AngularSource(2, (-1.0, 0.0), 0.0, angles, beam,
                               [680.0, 575.0, 450.0])

    system = OpticalSystem2D(dtype=F64)
    system.optical_arcs = [arc]
    system.sources = [source]
    system.target_segments = [target]
    system.materials = [{"n": mats.vacuum}, {"n": mats.acrylic}]
    system.update()

    engine = OpticalEngine(2)
    engine.optical_system = system

    def error_function(result):
        fin = result.rays.state == FINISHED
        return jnp.sum(jnp.where(fin, result.rays.p1[:, 1] ** 2, 0.0))

    return engine, error_function, arc


def test_sgd_optimizer_facade_single_arc():
    """The reference's top-level workflow: SGD_Optimizer(engine, erf, depth)
    optimizes the arc through the stateful facade."""
    from tensorflowraytrace_tpu.system import SGD_Optimizer

    engine, error_function, arc = _facade_sgd_problem()
    opt = SGD_Optimizer(engine, error_function=error_function, trace_depth=2,
                        learning_rate=1.0, grad_clip=0.1)
    e0 = opt.single_step(None, momentum=0.8)
    errors = opt.run_phase(60, None, lr_scale=0.5, momentum=0.8)
    assert errors[-1] < 0.1 * e0
    # parameters written back into the engine's boundary
    assert abs(float(arc.parameters[0]) - 5.0) > 0.1
    engine.ray_trace(2)
    fin = engine.finished_rays
    assert float(jnp.max(jnp.abs(fin.p1[:, 1]))) < 0.5


def test_sgd_optimizer_facade_mesh():
    """The same facade workflow data-parallel: SGD_Optimizer(mesh=...) runs
    the full pipeline under shard_map on the 8-device mesh."""
    import jax

    from tensorflowraytrace_tpu.parallel import sharding as par
    from tensorflowraytrace_tpu.system import SGD_Optimizer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    engine, error_function, arc = _facade_sgd_problem()
    opt = SGD_Optimizer(engine, error_function=error_function, trace_depth=2,
                        learning_rate=1.0, grad_clip=0.1,
                        mesh=par.ray_mesh(8))
    e0 = opt.single_step(None, momentum=0.8)

    # device-MEAN semantics: with this problem's static sources every device
    # computes the identical loss, so the mesh error must equal the
    # single-device error at the same parameters -- adding mesh= must not
    # silently rescale the loss/gradients by n_dev
    engine1, error_function1, _ = _facade_sgd_problem()
    opt1 = SGD_Optimizer(engine1, error_function=error_function1,
                         trace_depth=2, learning_rate=1.0, grad_clip=0.1)
    e0_single = opt1.single_step(None, momentum=0.8)
    np.testing.assert_allclose(e0, e0_single, rtol=1e-12)

    errors = opt.run_phase(40, None, lr_scale=0.5, momentum=0.8)
    assert errors[-1] < 0.1 * e0
    assert abs(float(arc.parameters[0]) - 5.0) > 0.1


# ----------------------------------------------------------------------
# full validate_system signature audit (reference engine.py:1416-1522)
# ----------------------------------------------------------------------

def test_validate_system_missing_mat_annotation():
    """An optical boundary built without material annotation must be named,
    with the missing fields spelled out (field-level parity with the
    reference's signature audit)."""
    system = build_single_arc_system()
    bare_arc = manual_arc_boundary(
        x_center=[5.0], y_center=[0.0], angle_start=[3 * PI / 4],
        angle_end=[5 * PI / 4], radius=[5.0], dtype=F64)  # no mat_in/mat_out
    system.optical_arcs = [bare_arc]
    system.update()
    engine = OpticalEngine(2)
    engine.optical_system = system
    with pytest.raises(RuntimeError, match=r"optical arcs\[0\].*mat_in"):
        engine.validate_system()


def test_validate_system_missing_wavelength_index_mode():
    """Index-mode dispersion needs real wavelengths; rays built without them
    carry the all-zero default and must fail the sources audit."""
    from tensorflowraytrace_tpu.models.rays import RaySet

    system = build_single_arc_system()
    rays = RaySet.make([[-1.0, 0.1]], [[0.0, 0.1]], dtype=F64)  # no wavelength
    system.sources = [rays]
    system.update()
    engine = OpticalEngine(2)
    engine.optical_system = system
    with pytest.raises(RuntimeError, match="sources.*wavelength"):
        engine.validate_system()


def test_validate_system_value_mode_missing_n_fields():
    """'value' mode requires n_in/n_out float fields on optical surfaces."""
    system = build_single_arc_system()
    system.materials = []  # no material list -> value mode
    system.update()
    engine = OpticalEngine(2)
    engine.optical_system = system
    with pytest.raises(RuntimeError, match=r"n_in.*n_out|n_out.*n_in"):
        engine.validate_system()


def test_validate_system_material_missing_n_key():
    system = build_single_arc_system()
    system.materials = [{"n": mats.vacuum}, {"refractive": mats.acrylic}]
    system.update()
    engine = OpticalEngine(2)
    engine.optical_system = system
    with pytest.raises(RuntimeError, match="material 1.*'n'"):
        engine.validate_system()


def test_validate_system_mat_override_passes():
    """Annotating mats through the entry (annotation_helper path) satisfies
    the audit even though the underlying set was built bare."""
    system = build_single_arc_system()
    bare_arc = manual_arc_boundary(
        x_center=[5.0], y_center=[0.0], angle_start=[3 * PI / 4],
        angle_end=[5 * PI / 4], radius=[5.0], dtype=F64)
    system.optical_arcs = [bare_arc]
    entry = system.optical_arcs[0]
    annotation_helper(entry, "mat_in", 1, "x_center", dtype=jnp.int32)
    annotation_helper(entry, "mat_out", 0, "x_center", dtype=jnp.int32)
    system.update()
    engine = OpticalEngine(2)
    engine.optical_system = system
    engine.validate_system()  # must not raise


def test_validate_system_fresnel_intensity_signature():
    """FresnelIntensity declares input_signature={'intensity'}: a system
    whose sources don't carry the field fails validate_system with a
    field-level message; seeding it via extra_fields passes and the traced
    intensities are attenuated."""
    from tensorflowraytrace_tpu.operations import FresnelIntensity

    system = build_single_arc_system()
    engine = OpticalEngine(2, operations=[FresnelIntensity()],
                           simple_ray_inheritance={"wavelength"})
    engine.optical_system = system
    system.update()
    with pytest.raises(RuntimeError, match="intensity"):
        engine.validate_system()

    # seed the field on the source and the same system validates + traces
    system2 = build_single_arc_system()
    for entry in system2._source_entries:
        entry._obj.extra_fields = {"intensity": ("whole", 1.0)}
        entry.update()
    engine2 = OpticalEngine(2, operations=[FresnelIntensity()],
                            simple_ray_inheritance={"wavelength"})
    engine2.optical_system = system2
    system2.update()
    engine2.validate_system()
    engine2.ray_trace(2)
    inten = np.asarray(engine2.finished_rays["intensity"])
    assert inten.shape == (60,)
    assert (inten < 1.0).all() and (inten > 0.8).all()  # attenuated, sane


def test_exclusion_clash_raises():
    from tensorflowraytrace_tpu.operations import GhostThrough, RayOperation

    class NoGhosts(RayOperation):
        exclusions = frozenset({GhostThrough})

    with pytest.raises(RuntimeError, match="exclusive operations"):
        OpticalEngine(2, operations=[NoGhosts(), GhostThrough()])


def test_validate_system_custom_op_target_signature():
    """Operations contribute their target_signature to the audit: a target
    set lacking a required extra field is reported by name."""
    from tensorflowraytrace_tpu.operations import RayOperation, StandardReaction

    class NeedsGoal(RayOperation):
        target_signature = frozenset({"goal_weight"})

    system = build_single_arc_system()
    system.update()
    engine = OpticalEngine(
        2, operations=[StandardReaction(), NeedsGoal()])
    engine.optical_system = system
    with pytest.raises(RuntimeError, match=r"target segments\[0\].*goal_weight"):
        engine.validate_system()
    # annotating the field fixes it
    entry = system.target_segments[0]
    annotation_helper(entry, "goal_weight", 1.0, "x_start")
    system.update()
    engine.validate_system()


def test_feed_segments_refeed():
    """ManualSegmentBoundary.feed_segments parity (boundaries.py:513-526):
    re-feed a manual boundary through the facade entry; material overrides
    persist and the next trace uses the new geometry."""
    system = build_single_arc_system()
    # replace the arc with a mirror segment at x=1, annotated via override
    seg = SegmentSet.make([[1.0, -5.0]], [[1.0, 5.0]], dtype=F64)
    system.optical_arcs = []
    system.optical_segments = [seg]
    entry = system.optical_segments[0]
    entry["mat_in"] = 1
    entry["mat_out"] = 0
    system.materials = [{"n": mats.reflective}, {"n": mats.reflective}]
    system.update()
    engine = OpticalEngine(2)
    engine.optical_system = system
    engine.ray_trace(2)
    n_before = engine.finished_rays.n_rays

    # move the mirror to x=2 via feed_segments; annotations re-apply
    entry.feed_segments([[2.0, -5.0, 2.0, 5.0]])
    system.update()
    assert int(entry.surface_set.mat_in[0]) == 1
    engine.ray_trace(2)
    fin = engine.finished_rays
    assert fin.n_rays == n_before
    # rays now reflect off x=2 (mirror), so they traveled further
    np.testing.assert_allclose(np.asarray(entry["x_start"]), 2.0)


def test_trace_config_recommended_and_overrides():
    """The facade starts from TraceConfig.recommended (acceleration on TPU,
    plain XLA on CPU) and trace_overrides wins over everything."""
    system = build_single_arc_system()
    system.update()
    engine = OpticalEngine(2)
    engine.optical_system = system
    cfg = engine.trace_config(6)
    assert cfg.max_bounces == 6
    # CPU test env: no pallas, no cull
    assert not cfg.use_pallas and not cfg.cull

    engine2 = OpticalEngine(2, trace_overrides={"remat": True,
                                                "ray_block": 4096})
    engine2.optical_system = system
    cfg2 = engine2.trace_config(6)
    assert cfg2.remat and cfg2.ray_block == 4096
    engine2.ray_trace(2)
    assert engine2.finished_rays.n_rays == 60


def test_facade_thin_film_class_op():
    """ThinFilmIntensity through the stateful facade: validates with the
    same intensity signature as FresnelIntensity, traces, and an AR-coated
    arc delivers MORE power than the bare-Fresnel run of the same system."""
    from tensorflowraytrace_tpu.operations import (
        FresnelIntensity, ThinFilmIntensity,
    )
    from tensorflowraytrace_tpu.ops import thinfilm

    def run(op):
        system = build_single_arc_system()
        for entry in system._source_entries:
            entry._obj.extra_fields = {"intensity": ("whole", 1.0)}
            entry.update()
        engine = OpticalEngine(2, operations=[op],
                               simple_ray_inheritance={"wavelength"})
        engine.optical_system = system
        system.update()
        engine.validate_system()
        engine.ray_trace(2)
        return np.asarray(engine.finished_rays["intensity"])

    d = float(thinfilm.quarter_wave_thickness(1.38, 550.0))
    coated = run(ThinFilmIntensity([[(1.38, d)]],
                                   {"arcs": np.asarray([0])}))
    bare = run(FresnelIntensity())
    assert coated.shape == bare.shape
    assert (coated > bare).all()  # the AR coat transmits more everywhere
    assert (coated < 1.0).all()


def test_engine_jit_cache_matches_eager_and_reuses_across_updates():
    """OpticalEngine.ray_trace jit-caches the functional trace per
    (materials, config, reaction) so repeated facade steps pay one device
    dispatch (measured 62x tax removed -- docs/notes.md facade-tax row).
    The cache must (a) return exactly the eager facade's results, (b) be
    REUSED when only parameter VALUES change across system.update(), and
    (c) leave the jit=False escape hatch eager."""
    system = build_single_arc_system()
    engine = OpticalEngine(2, simple_ray_inheritance={"wavelength"})
    engine.optical_system = system
    system.update()
    r_jit = engine.ray_trace(2)
    assert len(engine._trace_cache) == 1

    eager = OpticalEngine(2, simple_ray_inheritance={"wavelength"},
                          jit=False)
    eager.optical_system = system
    r_eager = eager.ray_trace(2)
    assert len(eager._trace_cache) == 0
    np.testing.assert_allclose(np.asarray(r_jit.rays.p1),
                               np.asarray(r_eager.rays.p1), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(r_jit.rays.state),
                                  np.asarray(r_eager.rays.state))

    # repeated same-shape trace: the single cache entry is REUSED
    # (value changes across system.update() ride the same entry --
    # test_feed_segments_refeed moves a mirror through this cache and
    # pins the rays land on the MOVED geometry)
    r2 = engine.ray_trace(2)
    assert len(engine._trace_cache) == 1
    assert r2.rays.n_rays == r_jit.rays.n_rays

    # different max_iterations -> different TraceConfig -> second entry
    engine.ray_trace(3)
    assert len(engine._trace_cache) == 2
