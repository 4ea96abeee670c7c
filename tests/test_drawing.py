"""Headless drawing tests (reference style: real mpl artists, no display --
tests/drawing/conftest.py:7-12)."""

import matplotlib

matplotlib.use("Agg")

import math

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np
import pytest

from tensorflowraytrace_tpu import RaySet, Scene2D, SegmentSet, TraceConfig, trace
from tensorflowraytrace_tpu import drawing
from tensorflowraytrace_tpu.models.mesh import hexagonal_mesh
from tensorflowraytrace_tpu.models.surfaces import ArcSet, TriangleSet
from tensorflowraytrace_tpu.ops import materials as mats

F64 = jnp.float64
PI = math.pi


@pytest.fixture
def ax():
    fig, ax = plt.subplots()
    yield ax
    plt.close(fig)


@pytest.fixture
def ax3d():
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    yield ax
    plt.close(fig)


def test_ray_drawer_2d(ax):
    rays = RaySet.make([[0.0, 0.0], [1.0, 1.0]], [[1.0, 0.0], [2.0, 2.0]],
                       [500.0, 600.0], dtype=F64)
    d = drawing.RayDrawer2D(ax, rays)
    d.draw()
    assert len(d._line_collection.get_segments()) == 2


def test_ray_drawer_2d_empty(ax):
    d = drawing.RayDrawer2D(ax, None)
    d.draw()
    assert len(d._line_collection.get_segments()) == 0


def test_ray_drawer_2d_bad_units(ax):
    with pytest.raises(ValueError):
        drawing.RayDrawer2D(ax, None, units="parsec")


def test_segment_drawer_with_norms(ax):
    segs = SegmentSet.make([[0.0, 0.0]], [[1.0, 0.0]], dtype=F64)
    d = drawing.SegmentDrawer(ax, segs, draw_norm_arrows=True)
    d.draw()
    assert len(d._line_collection.get_segments()) == 1
    assert len(d._arrows) == 1


def test_arc_drawer(ax):
    arcs = ArcSet.make([[0.0, 0.0]], -PI / 2, PI / 2, 1.0, dtype=F64)
    d = drawing.ArcDrawer(ax, arcs, draw_norm_arrows=True, norm_arrow_count=3)
    d.draw()
    assert len(d._patches) == 1
    assert len(d._arrows) == 3
    d.draw()  # redraw clears + rebuilds
    assert len(d._patches) == 1


def test_ray_drawer_3d(ax3d):
    rays = RaySet.make([[0.0, 0.0, 0.0]], [[1.0, 1.0, 1.0]], 500.0, dtype=F64)
    d = drawing.RayDrawer3D(ax3d, rays)
    d.draw()
    assert np.asarray(d._collection._segments3d).shape == (1, 2, 3)
    ax3d.figure.canvas.draw()  # renders without error


def test_triangle_drawer_from_mesh_and_set(ax3d):
    mesh = hexagonal_mesh(1.0, 2)
    d = drawing.TriangleDrawer(ax3d, mesh, draw_norm_arrows=True)
    d.draw()
    assert d._poly is not None

    ts = TriangleSet.from_vertices_faces(mesh.points, mesh.faces, dtype=F64)
    d2 = drawing.TriangleDrawer(ax3d, ts)
    d2.draw()
    assert d2._poly is not None


def test_goal_drawer(ax3d):
    d = drawing.GoalDrawer3D(ax3d)
    d.output = np.zeros((5, 3))
    d.goal = np.ones((5, 3))
    d.draw()
    assert d._quiver is not None


def test_history_rays_flatten(ax):
    mirror = SegmentSet.make([[1.0, -5.0]], [[1.0, 5.0]], mat_in=1, dtype=F64)
    target = SegmentSet.make([[-1.0, -5.0]], [[-1.0, 5.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror], target_segments=[target])
    rays = RaySet.make([[0.0, 0.0]], [[1.0, 0.5]], 500.0, dtype=F64)
    res = trace(rays, scene, (mats.vacuum, mats.reflective),
                TraceConfig(max_bounces=3, keep_history=True))
    flat = drawing.history_rays(res)
    # the single ray was alive for 2 bounces -> 2 drawable segments
    assert flat["x_start"].shape == (2,)
    d = drawing.RayDrawer2D(ax, flat)
    d.draw()
    assert len(d._line_collection.get_segments()) == 2


def test_disable_key_commands():
    drawing.disable_figure_key_commands()
    assert plt.rcParams["keymap.save"] == []


def test_triangle_drawer_parameter_arrows():
    """Parameter-vector debug arrows (reference drawing.py:913-929): one
    arrow per vertex along its parameter direction, toggleable."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from tensorflowraytrace_tpu.models import boundaries as bd
    from tensorflowraytrace_tpu.models import mesh as mt

    zm = mt.hexagonal_mesh(1.0, 2)
    boundary = bd.ParametricTriangleBoundary(
        zm, bd.FromVectorVG((0.0, 0.0, 1.0)), dtype=jnp.float64)
    params = boundary.init_params()
    surf = boundary.build(params)

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    d = drawing.TriangleDrawer(
        ax, surf, draw_norm_arrows=True, draw_parameter_arrows=True,
        boundary=boundary, params=params)
    d.draw()
    assert d._param_quiver is not None
    assert d._quiver is not None
    d.toggle_parameter_arrow_visibility()
    assert d._param_quiver is None
    d.toggle_norm_arrow_visibility()
    assert d._quiver is None
    d.toggle_parameter_arrow_visibility()
    assert d._param_quiver is not None
    plt.close(fig)


def test_pv_drawers_guarded_without_pyvista():
    """The pyvista plotter drawers exist behind a guard: without pyvista
    they raise a helpful ImportError pointing at the mpl stand-ins."""
    if drawing.HAS_PYVISTA:
        pytest.skip("pyvista installed; guard path not reachable")
    for cls, args in [(drawing.PvRayDrawer3D, (None,)),
                      (drawing.PvTriangleDrawer, (None,)),
                      (drawing.PvGoalDrawer3D, (None,))]:
        with pytest.raises(ImportError, match="pyvista"):
            cls(*args)


def test_pv_drawers_smoke():
    """Off-screen pyvista smoke test (reference drawing.py:221-344/811-949):
    rays, a triangle boundary with norm+parameter arrows, and goal arrows
    rendered into a live Plotter.  Skips where pyvista is absent."""
    if not drawing.HAS_PYVISTA:
        pytest.skip("pyvista not installed")
    import pyvista as pv

    from tensorflowraytrace_tpu.models import boundaries as bd

    plot = pv.Plotter(off_screen=True)
    rays = {"x_start": np.zeros(4), "y_start": np.zeros(4),
            "z_start": np.arange(4.0), "x_end": np.ones(4),
            "y_end": np.ones(4), "z_end": np.arange(4.0),
            "wavelength": np.full(4, 550.0)}
    rd = drawing.PvRayDrawer3D(plot, rays)
    rd.draw()
    assert rd._actor is not None

    zm = hexagonal_mesh(1.0, 2)
    boundary = bd.ParametricTriangleBoundary(
        zm, bd.FromVectorVG((0.0, 0.0, 1.0)), dtype=jnp.float64)
    params = boundary.init_params()
    td = drawing.PvTriangleDrawer(
        plot, boundary.build(params), draw_norm_arrows=True,
        draw_parameter_arrows=True, boundary=boundary, params=params)
    td.draw()
    assert td._actor is not None and td._norm_actor is not None
    td.toggle_norm_arrow_visibility()
    assert td._norm_actor is None

    gd = drawing.PvGoalDrawer3D(plot)
    gd.output = np.zeros((4, 3))
    gd.goal = np.ones((4, 3))
    gd.draw()
    assert gd._actor is not None
    plot.close()
