"""Mesh-layer tests: generators, graph tools, STL I/O."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu.models import mesh as mt

PI = math.pi


def euler_characteristic(m: mt.TriMesh) -> int:
    return m.n_points - len(m.unique_edges()) + m.n_faces


# ----------------------------------------------------------------------
# generators
# ----------------------------------------------------------------------

def test_circular_mesh_disk_topology():
    m = mt.circular_mesh(1.0, 0.25)
    # disk: V - E + F = 1
    assert euler_characteristic(m) == 1
    r = np.linalg.norm(m.points[:, :2], axis=1)
    assert r.max() == pytest.approx(1.0)
    # all normals +z
    assert (m.face_normals()[:, 2] > 0).all()


def test_circular_mesh_wedge():
    m = mt.circular_mesh(1.0, 0.2, theta_start=0.0, theta_end=PI / 3)
    assert euler_characteristic(m) == 1
    angles = np.arctan2(m.points[:, 1], m.points[:, 0])
    interior = np.linalg.norm(m.points[:, :2], axis=1) > 1e-9
    assert angles[interior].min() >= -1e-9
    assert angles[interior].max() <= PI / 3 + 1e-9
    assert (m.face_normals()[:, 2] > 0).all()


def test_circular_mesh_annulus():
    m = mt.circular_mesh(2.0, 0.3, starting_radius=1.0)
    # annulus: V - E + F = 0
    assert euler_characteristic(m) == 0
    r = np.linalg.norm(m.points[:, :2], axis=1)
    assert r.min() == pytest.approx(1.0)
    assert (m.face_normals()[:, 2] > 0).all()


def test_circular_mesh_edge_uniformity():
    """Triangle edges should be near the target size (quality target of
    mesh_tools.circular_mesh)."""
    m = mt.circular_mesh(1.0, 0.2)
    e = m.unique_edges()
    lengths = np.linalg.norm(m.points[e[:, 0]] - m.points[e[:, 1]], axis=1)
    assert 0.08 < lengths.min() and lengths.max() < 0.35


def test_hexagonal_mesh_equilateral():
    m = mt.hexagonal_mesh(radius=1.0, step_count=4)
    assert euler_characteristic(m) == 1
    assert m.n_points == 1 + 6 * (1 + 2 + 3 + 4)
    assert m.n_faces == 6 * 4 ** 2
    e = m.unique_edges()
    lengths = np.linalg.norm(m.points[e[:, 0]] - m.points[e[:, 1]], axis=1)
    np.testing.assert_allclose(lengths, 0.25, atol=1e-9)
    assert (m.face_normals()[:, 2] > 0).all()


def test_cylindrical_mesh_closed():
    m = mt.cylindrical_mesh((0, 0, 0), (0, 0, 3), radius=0.5, theta_res=8,
                            z_res=5)
    # closed surface (sphere topology): V - E + F = 2
    assert euler_characteristic(m) == 2
    # normals point outward
    centers = m.points[m.faces].mean(axis=1)
    radial = centers - np.array([0.0, 0.0, 1.0]) * np.clip(centers[:, 2:], 0, 3)
    side = np.abs(centers[:, 2] - 1.5) < 1.4
    n = m.face_normals()
    outward = (n[side] * radial[side]).sum(axis=1)
    assert (outward > 0).all()


def test_cylindrical_mesh_open_and_twist():
    m = mt.cylindrical_mesh((0, 0, 0), (0, 0, 1), radius=1.0, theta_res=6,
                            z_res=4, start_cap=False, end_cap=False,
                            use_twist=True)
    # open tube: V - E + F = 0
    assert euler_characteristic(m) == 0
    assert m.n_points == 6 * 4


# ----------------------------------------------------------------------
# graph tools
# ----------------------------------------------------------------------

def test_find_generations_cover_and_order():
    m = mt.hexagonal_mesh(1.0, 3)
    top = mt.get_closest_point(m, (0, 0, 0))
    gens = mt.find_generations(m, top)
    all_v = set()
    for g in gens:
        assert not (g & all_v)
        all_v |= g
    assert all_v == set(range(m.n_points))
    assert gens[0] == {top}
    # hexagonal rings: generation k has 6k vertices
    assert [len(g) for g in gens] == [1, 6, 12, 18]


def test_parametrization_tools_properties():
    m = mt.hexagonal_mesh(1.0, 3)
    top = mt.get_closest_point(m, (0, 0, 0))
    update_map, acc = mt.mesh_parametrization_tools(m, top)
    assert update_map.shape == (m.n_faces, 3)
    assert update_map.dtype == bool
    # every face may move at least one vertex
    assert update_map.any(axis=1).all()
    # accumulator: square, diagonal >= 1, non-negative
    assert acc.shape == (m.n_points, m.n_points)
    assert (np.diag(acc) >= 1).all()
    assert (acc >= 0).all()
    # the top parent is an ancestor of everything: its column is positive
    # for all connected vertices (plus itself)
    assert (acc[:, top] > 0).sum() == m.n_points
    # moving only the top parent's gradient drags every vertex
    g = np.zeros(m.n_points)
    g[top] = 1.0
    assert (acc @ g > 0).all()


def test_parametrization_active_vertices_subset():
    m = mt.hexagonal_mesh(1.0, 2)
    top = mt.get_closest_point(m, (0, 0, 0))
    active = list(range(0, m.n_points, 2))
    _, acc = mt.mesh_parametrization_tools(m, top, active_vertices=active)
    assert acc.shape == (len(active), len(active))


def test_smoothing_tool_rows_normalized():
    m = mt.hexagonal_mesh(1.0, 3)
    w = mt.gaussian_weights(1.0, 3)
    s = mt.mesh_smoothing_tool(m, w)
    np.testing.assert_allclose(s.sum(axis=1), 1.0, atol=1e-12)
    # smoothing a constant field is the identity on it
    np.testing.assert_allclose(s @ np.ones(m.n_points), 1.0, atol=1e-12)
    # smoothing reduces variance of a random field
    rng = np.random.default_rng(0)
    x = rng.normal(size=m.n_points)
    assert np.var(s @ x) < np.var(x)


def test_get_flat_initial():
    m = mt.hexagonal_mesh(1.0, 2)
    m.points[:, 2] = np.arange(m.n_points, dtype=np.float64)
    init = mt.get_flat_initial(m, axis=2)
    np.testing.assert_allclose(m.points[:, 2], 0.0)
    np.testing.assert_allclose(init, np.arange(m.n_points))


# ----------------------------------------------------------------------
# clean / remesh / io
# ----------------------------------------------------------------------

def test_clean_mesh_dedups():
    pts = np.asarray([
        [0, 0, 0], [1, 0, 0], [0, 1, 0],
        [1e-9, 0, 0],          # duplicate of vertex 0
        [1, 1, 0],
    ], dtype=np.float64)
    faces = np.asarray([
        [0, 1, 2],
        [3, 1, 2],   # duplicate face via duplicated vertex
        [1, 1, 4],   # degenerate
        [1, 4, 2],
    ])
    m = mt.clean_mesh(mt.TriMesh(pts, faces))
    assert m.n_points == 4
    assert m.n_faces == 2


def test_planar_remesh_recovers_heights():
    base = mt.hexagonal_mesh(1.0, 5)
    bumpy = mt.hexagonal_mesh(1.0, 7)
    bumpy.points[:, 2] = bumpy.points[:, 0] ** 2 + 0.5 * bumpy.points[:, 1]
    flat, heights = mt.planar_interpolated_remesh(bumpy, base)
    np.testing.assert_allclose(flat.points[:, 2], 0.0)
    expected = base.points[:, 0] ** 2 + 0.5 * base.points[:, 1]
    np.testing.assert_allclose(heights, expected, atol=0.03)


def test_stl_roundtrip(tmp_path):
    m = mt.hexagonal_mesh(1.0, 3)
    m.points[:, 2] = 0.1 * m.points[:, 0]
    path = str(tmp_path / "mesh.stl")
    m.save(path)
    m2 = mt.TriMesh.read(path)
    assert m2.n_faces == m.n_faces
    # vertex sets coincide (order may differ)
    a = np.asarray(sorted(map(tuple, np.round(m.points, 6))))
    b = np.asarray(sorted(map(tuple, np.round(m2.points, 6))))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # face normal sets agree
    na = np.sort(np.round(m.face_normals(), 4), axis=0)
    nb = np.sort(np.round(m2.face_normals(), 4), axis=0)
    np.testing.assert_allclose(na, nb, atol=1e-3)


def test_pack_unpack_faces():
    faces = np.asarray([[0, 1, 2], [2, 3, 0]])
    packed = mt.pack_faces(faces)
    np.testing.assert_array_equal(packed, [3, 0, 1, 2, 3, 2, 3, 0])
    np.testing.assert_array_equal(mt.unpack_faces(packed), faces)


def test_clean_mesh_raw_roundtrip():
    """Array-in/array-out dedup (mesh_tools.py:1073-1140)."""
    from tensorflowraytrace_tpu.models.mesh import clean_mesh_raw

    pts = np.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [1e-9, 0, 0],          # duplicate of vertex 0
                      [2, 0, 0]])
    faces = np.asarray([[0, 1, 2], [3, 1, 2],  # duplicate face via dup vertex
                        [1, 1, 2],             # degenerate
                        [4, 1, 2]])
    p, f = clean_mesh_raw(pts, faces)
    assert p.shape[0] == 4
    assert f.shape[0] == 2


# ----------------------------------------------------------------------
# pyvista interchange + mesh coercion (reference users' on-ramp)
# ----------------------------------------------------------------------

class _FakePolyData:
    """Stands in for pyvista.PolyData: points + flat [3, i, j, k, ...] faces."""

    def __init__(self, points, flat_faces):
        self.points = np.asarray(points)
        self.faces = np.asarray(flat_faces)


def test_from_pyvista_flat_faces():
    pts = np.asarray([[0., 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]])
    flat = np.asarray([3, 0, 1, 2, 3, 1, 3, 2])
    m = mt.TriMesh.from_pyvista(_FakePolyData(pts, flat))
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [1, 3, 2]])
    np.testing.assert_array_equal(m.points, pts)


def test_from_pyvista_rejects_non_triangles():
    import pytest

    pts = np.zeros((4, 3))
    quad = np.asarray([4, 0, 1, 2, 3])
    with pytest.raises(ValueError, match="triangulate"):
        mt.TriMesh.from_pyvista(_FakePolyData(pts, quad))


def test_as_trimesh_coercions():
    pts = np.asarray([[0., 0, 0], [1, 0, 0], [0, 1, 0]])
    faces = np.asarray([[0, 1, 2]])
    m0 = mt.TriMesh(pts, faces)
    assert mt.as_trimesh(m0) is m0
    m1 = mt.as_trimesh(_FakePolyData(pts, np.asarray([3, 0, 1, 2])))
    np.testing.assert_array_equal(m1.faces, faces)
    m2 = mt.as_trimesh((pts, faces))
    np.testing.assert_array_equal(m2.points, pts)
    import pytest

    with pytest.raises(TypeError, match="TriMesh"):
        mt.as_trimesh(42)


def test_to_pyvista_guarded():
    pts = np.asarray([[0., 0, 0], [1, 0, 0], [0, 1, 0]])
    m = mt.TriMesh(pts, [[0, 1, 2]])
    try:
        import pyvista  # noqa: F401
    except ImportError:
        import pytest

        with pytest.raises(ImportError, match="stl"):
            m.to_pyvista()
    else:  # pragma: no cover - env has pyvista
        pd = m.to_pyvista()
        back = mt.TriMesh.from_pyvista(pd)
        np.testing.assert_array_equal(back.faces, m.faces)


def test_polydata_into_boundary_and_distribution():
    """A PolyData-shaped mesh flows into manual_triangle_boundary and
    ManualBasePointDistribution.from_mesh (migration on-ramp)."""
    from tensorflowraytrace_tpu.models import distributions as dist
    from tensorflowraytrace_tpu.models.boundaries import manual_triangle_boundary

    pts = np.asarray([[0., 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]])
    pd = _FakePolyData(pts, np.asarray([3, 0, 1, 2, 3, 1, 3, 2]))
    tri = manual_triangle_boundary(pd, dtype=jnp.float64)
    assert tri.n_surfaces == 2
    d = dist.ManualBasePointDistribution(3, from_mesh=pd)
    points, ranks = d.sample(None, dtype=jnp.float64)
    assert points.shape == (4, 3)
