"""Parametric optical boundaries: the *trainable* objects.

Reference counterpart: /root/reference/tfrt/boundaries.py.  There, a boundary
is a stateful RecursivelyUpdatable holding a ``tf.Variable`` of parameters;
constraints are update handles that mutate the variable in place
(boundaries.py:145-158,208-215), and the optimizer regenerates surface
tensors inside the GradientTape (optimizer.py:216-218).

TPU-native redesign: a boundary is a *builder* -- static setup data (zero
points, parameter vectors, faces, update map, materials) plus a pure,
differentiable method::

    boundary.build(params) -> SegmentSet / TriangleSet

Constraints become functional parameter projections applied inside ``build``
(and therefore inside ``jax.grad`` -- SURVEY.md section 7 item 2):
ClipConstraint -> jnp.clip, ThicknessConstraint -> shift by reduce,
cylinder min-radius -> subtract min (boundaries.py:1613-1617).

Parity map:
  Constraint/NoConstraint/PointConstraint/ThicknessConstraint/ClipConstraint
      <- boundaries.py:17-235
  VectorGenerators (SecondSurface/FromPoint/FromVector/FromAxis)
      <- boundaries.py:239-383
  ManualSegment/Arc/TriangleBoundary    <- boundaries.py:458-524, 942-963
  ParametricSegmentBoundary             <- boundaries.py:528-627
  ParametricMultiSegmentBoundary        <- boundaries.py:631-826
  ParametricTriangleBoundary            <- boundaries.py:967-1112
  MasterSlaveParametricTriangleBoundary <- boundaries.py:1116-1229
  ParametricMultiTriangleBoundary       <- boundaries.py:1233-1412
  ParametricCylindricalGuide            <- boundaries.py:1416-1717
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu.config import OPTICAL, resolve_dtype
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.models.surfaces import SegmentSet, TriangleSet

PI = math.pi


# ======================================================================
# constraints (functional parameter projections)
# ======================================================================

class Constraint:
    """Base projection.  ``parent`` selects what the constraint is relative
    to (boundaries.py:42-63): 'prev' (previous surface in a multi-boundary,
    or zero for the first), 'zero', 'literal' (explicit parent params), or an
    int index into the multi-boundary's surfaces."""

    def __init__(self, parent="prev"):
        if isinstance(parent, int):
            if parent < 0:
                raise ValueError("Constraint: integer parent must be >= 0")
        elif parent not in ("prev", "zero", "literal"):
            raise ValueError("Constraint: parent must be 'prev', 'zero', "
                             "'literal', or an int")
        self.parent = parent

    def _parent_params(self, index, params_list, target_params):
        if self.parent == "zero":
            return jnp.zeros_like(target_params)
        if self.parent == "prev":
            if index == 0:
                return jnp.zeros_like(target_params)
            return params_list[index - 1]
        if self.parent == "literal":
            raise ValueError("'literal' constraints must be applied via "
                             "apply_literal(target, parent)")
        return params_list[self.parent]

    def project(self, target_params, parent_params):
        raise NotImplementedError

    def apply(self, index, params_list):
        """Project surface ``index``'s params within a multi-boundary."""
        target = params_list[index]
        return self.project(target, self._parent_params(index, params_list, target))

    def apply_literal(self, target_params, parent_params=None):
        if parent_params is None:
            parent_params = jnp.zeros_like(target_params)
        return self.project(target_params, parent_params)


class NoConstraint(Constraint):
    def project(self, target, parent):
        return target


class PointConstraint(Constraint):
    """Fix the parameter-space distance between one vertex on the target and
    one on the parent (boundaries.py:124-158)."""

    def __init__(self, distance, target_vertex, parent_vertex=None, **kw):
        super().__init__(**kw)
        self.distance = distance
        self.target_vertex = target_vertex
        self.parent_vertex = (target_vertex if parent_vertex is None
                              else parent_vertex)

    def project(self, target, parent):
        diff = parent[self.parent_vertex] - target[self.target_vertex] + self.distance
        return target + diff


class ThicknessConstraint(Constraint):
    """Fix the min ('min' mode) or max distance between the surfaces
    (boundaries.py:162-215).  'min' keeps the target from clipping through
    its parent."""

    def __init__(self, distance, mode, **kw):
        super().__init__(**kw)
        if mode not in ("min", "max"):
            raise ValueError("ThicknessConstraint: mode must be 'min' or 'max'")
        self.distance = distance
        self.mode = mode

    def project(self, target, parent):
        reduce_fn = jnp.max if self.mode == "min" else jnp.min
        diff = reduce_fn(parent - target) + self.distance
        return target + diff


class ClipConstraint(Constraint):
    """Clip parameters to absolute bounds (boundaries.py:219-235)."""

    def __init__(self, lower, upper):
        super().__init__(parent="zero")
        self.lower = lower
        self.upper = upper

    def project(self, target, parent):
        return jnp.clip(target, self.lower, self.upper)


# ======================================================================
# vector generators
# ======================================================================

def _normalize_rows(v, eps=1e-12):
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.where(n > eps, v / jnp.maximum(n, eps), jnp.zeros_like(v))


class VectorGeneratorBase:
    """Generates the per-vertex direction field along which parameters move
    vertices (boundaries.py:239-257).  ``generate(zero) -> (V, 3)`` unit
    vectors (zero-length where undefined, e.g. on an axis)."""

    def generate(self, zero):
        raise NotImplementedError


class SecondSurfaceVG(VectorGeneratorBase):
    """Vectors pointing from each zero point to the matching vertex of a
    second surface (boundaries.py:260-305)."""

    def __init__(self, surface):
        if isinstance(surface, str):
            surface = mt.TriMesh.read(surface)
        self.points = jnp.asarray(
            surface.points if isinstance(surface, mt.TriMesh) else surface
        )

    def generate(self, zero):
        return _normalize_rows(self.points.astype(zero.dtype) - zero)


class FromPointVG(VectorGeneratorBase):
    """Vectors radiating from a single 3D point (boundaries.py:309-325)."""

    def __init__(self, point):
        self.point = jnp.asarray(point)

    def generate(self, zero):
        return _normalize_rows(zero - self.point.astype(zero.dtype))


class FromVectorVG(VectorGeneratorBase):
    """A constant (or per-vertex) vector field (boundaries.py:329-349)."""

    def __init__(self, vector):
        self.vector = jnp.asarray(vector)

    def generate(self, zero):
        v = jnp.broadcast_to(self.vector.astype(zero.dtype), zero.shape)
        return _normalize_rows(v)


class FromAxisVG(VectorGeneratorBase):
    """Vectors radiating perpendicular from an axis line
    (boundaries.py:353-383); zero for points on the axis."""

    def __init__(self, first, point=None, direction=None):
        self.axis_point = jnp.asarray(first, dtype=float)
        if point is not None:
            axis = jnp.asarray(point, dtype=float) - self.axis_point
        elif direction is not None:
            axis = jnp.asarray(direction, dtype=float)
        else:
            raise ValueError("FromAxisVG: provide 'point' or 'direction'")
        self.axis = axis / jnp.linalg.norm(axis)

    def generate(self, zero):
        ap = self.axis_point.astype(zero.dtype)
        ax = self.axis.astype(zero.dtype)
        d = jnp.sum((zero - ap) * ax, axis=1, keepdims=True)
        closest = ap + ax * d
        return _normalize_rows(zero - closest)


# ======================================================================
# manual boundaries (static geometry)
# ======================================================================

def manual_segment_boundary(segments=None, x_start=None, y_start=None,
                            x_end=None, y_end=None, dtype=None, **kw) -> SegmentSet:
    """Static 2D segments from raw data (ManualSegmentBoundary,
    boundaries.py:493-524).  ``segments``: (N, 4) rows of
    (x_start, y_start, x_end, y_end)."""
    dtype = resolve_dtype(dtype)
    if segments is not None:
        segments = jnp.asarray(segments, dtype=dtype)
        p0 = segments[:, 0:2]
        p1 = segments[:, 2:4]
    else:
        p0 = jnp.stack([jnp.asarray(x_start, dtype), jnp.asarray(y_start, dtype)], axis=1)
        p1 = jnp.stack([jnp.asarray(x_end, dtype), jnp.asarray(y_end, dtype)], axis=1)
    return SegmentSet.make(p0, p1, dtype=dtype, **kw)


def manual_arc_boundary(x_center, y_center, angle_start, angle_end, radius,
                        dtype=None, **kw):
    """Static 2D arcs from raw data (ManualArcBoundary, boundaries.py:458-473)."""
    from tensorflowraytrace_tpu.models.surfaces import ArcSet

    dtype = resolve_dtype(dtype)
    center = jnp.stack([jnp.atleast_1d(jnp.asarray(x_center, dtype)),
                        jnp.atleast_1d(jnp.asarray(y_center, dtype))], axis=1)
    return ArcSet.make(center, angle_start, angle_end, radius, dtype=dtype, **kw)


def manual_triangle_boundary(mesh=None, file_name=None, flip_norm=False,
                             dtype=None, **kw) -> TriangleSet:
    """Static triangle boundary from a TriMesh, pyvista.PolyData, or STL
    file (ManualTriangleBoundary, boundaries.py:942-963)."""
    if file_name is not None:
        mesh = mt.TriMesh.read(file_name)
    else:
        mesh = mt.as_trimesh(mesh)
    if flip_norm:
        mesh = mesh.flip_faces()
    return TriangleSet.from_vertices_faces(
        jnp.asarray(mesh.points, dtype=resolve_dtype(dtype)), mesh.faces, **kw
    )


# ======================================================================
# parametric boundaries
# ======================================================================

class ParametricSegmentBoundary:
    """A 2D curve: vertices slide between zero and one point sets; params=0
    puts the curve through the zero points (boundaries.py:528-627).

    ``build(params)`` is differentiable; norm flips by reversing the segment
    direction, as in the reference (:613-619).
    """

    def __init__(self, zero_distribution, one_distribution, flip_norm=False,
                 initial_parameters=0.0, constraint: Optional[Constraint] = None,
                 mat_in=None, mat_out=None, category=OPTICAL, dtype=None):
        dtype = resolve_dtype(dtype)
        self.dtype = dtype
        zero, _ = (zero_distribution.sample(dtype=dtype)
                   if hasattr(zero_distribution, "sample")
                   else (jnp.asarray(zero_distribution, dtype), None))
        one, _ = (one_distribution.sample(dtype=dtype)
                  if hasattr(one_distribution, "sample")
                  else (jnp.asarray(one_distribution, dtype), None))
        if zero.shape != one.shape:
            raise ValueError("zero and one distributions must match in size")
        self.zero = zero
        self.one = one
        self.flip_norm = flip_norm
        self.initial_parameters = initial_parameters
        self.constraint = constraint
        self.mat_in = mat_in
        self.mat_out = mat_out
        self.category = category

    @property
    def n_params(self) -> int:
        return self.zero.shape[0]

    def init_params(self):
        return jnp.broadcast_to(
            jnp.asarray(self.initial_parameters, self.dtype), (self.n_params,)
        ).copy()

    def build(self, params) -> SegmentSet:
        if self.constraint is not None:
            params = self.constraint.apply_literal(params)
        points = self.zero + params[:, None] * (self.one - self.zero)
        if self.flip_norm:
            p0, p1 = points[1:], points[:-1]
        else:
            p0, p1 = points[:-1], points[1:]
        return SegmentSet.make(p0, p1, category=self.category,
                               mat_in=self.mat_in, mat_out=self.mat_out,
                               dtype=self.dtype)


class ParametricMultiSegmentBoundary:
    """Several segment curves sharing base points, with inter-surface
    constraints (boundaries.py:631-826).  ``build(params_list)`` returns a
    list of SegmentSets; constraints are applied in order, each seeing the
    already-projected parameters of earlier surfaces."""

    def __init__(self, zero_distribution, one_distribution, constraints,
                 flip_norm, initial_parameters=0.0, material_list=None,
                 category=OPTICAL, dtype=None):
        n = len(constraints)
        if len(flip_norm) != n:
            raise ValueError("constraints and flip_norm must have equal length")
        if not isinstance(initial_parameters, (list, tuple)):
            initial_parameters = [initial_parameters] * n
        material_list = material_list or [{}] * n
        self.constraints = list(constraints)
        self.surfaces = [
            ParametricSegmentBoundary(
                zero_distribution, one_distribution, flip_norm=fn,
                initial_parameters=ip, category=category, dtype=dtype,
                **mat,
            )
            for fn, ip, mat in zip(flip_norm, initial_parameters, material_list)
        ]

    @property
    def surface_count(self):
        return len(self.surfaces)

    def init_params(self):
        return [s.init_params() for s in self.surfaces]

    def constrain(self, params_list):
        out = list(params_list)
        for i, c in enumerate(self.constraints):
            out[i] = c.apply(i, out)
        return out

    def build(self, params_list) -> List[SegmentSet]:
        out = self.constrain(params_list)
        return [s.build(p) for s, p in zip(self.surfaces, out)]


def _masked_gather(vertices, faces, update_map):
    """Gather face-corner points with per-corner stop-gradient masking
    (the reference's vertex_update_map trick, boundaries.py:900-913):
    corners a face may not move contribute value but no gradient."""
    corners = []
    for k in range(3):
        pts = vertices[faces[:, k]]
        if update_map is not None:
            m = update_map[:, k][:, None]
            pts = jnp.where(m, pts, jax.lax.stop_gradient(pts))
        corners.append(pts)
    return corners


class ParametricTriangleBoundary:
    """A triangle-mesh surface: vertex v = zero_v + param_v * vector_v
    (boundaries.py:967-1112).  ``build(params)`` is differentiable w.r.t.
    params; the optional vertex_update_map limits which faces' gradients
    reach which vertices."""

    def __init__(self, zero_points, vector_generator, flip_norm=False,
                 initial_parameters=0.0, vertex_update_map=None,
                 constraint: Optional[Constraint] = None,
                 mat_in=None, mat_out=None, category=OPTICAL, dtype=None):
        dtype = resolve_dtype(dtype)
        self.dtype = dtype
        if isinstance(zero_points, str):
            zero_points = mt.TriMesh.read(zero_points)
        mesh = mt.as_trimesh(zero_points).copy()
        if flip_norm:
            mesh = mesh.flip_faces()
            if vertex_update_map is not None:
                vertex_update_map = np.take(np.asarray(vertex_update_map),
                                            [2, 1, 0], axis=1)
        self.mesh = mesh
        self.zero = jnp.asarray(mesh.points, dtype=dtype)
        self.faces = jnp.asarray(mesh.faces, dtype=jnp.int32)
        self.vectors = jnp.asarray(
            vector_generator.generate(self.zero), dtype=dtype
        )
        self.vertex_update_map = (None if vertex_update_map is None
                                  else jnp.asarray(vertex_update_map, bool))
        self.initial_parameters = initial_parameters
        self.constraint = constraint
        self.mat_in = mat_in
        self.mat_out = mat_out
        self.category = category

    @property
    def n_params(self) -> int:
        return self.zero.shape[0]

    def init_params(self):
        return jnp.broadcast_to(
            jnp.asarray(self.initial_parameters, self.dtype), (self.n_params,)
        ).copy()

    def params_to_vertices(self, params):
        return self.zero + params[:, None] * self.vectors

    def build(self, params) -> TriangleSet:
        if self.constraint is not None:
            params = self.constraint.apply_literal(params)
        vertices = self.params_to_vertices(params)
        vp, v1, v2 = _masked_gather(vertices, self.faces, self.vertex_update_map)
        return TriangleSet.make(vp, v1, v2, category=self.category,
                                mat_in=self.mat_in, mat_out=self.mat_out,
                                dtype=self.dtype)

    def updated_mesh(self, params) -> mt.TriMesh:
        """Host-side mesh with current vertex positions (for drawing / STL
        export, replacing update_mesh_from_vertices)."""
        return mt.TriMesh(np.asarray(self.params_to_vertices(params)),
                          np.asarray(self.faces))


class MasterSlaveParametricTriangleBoundary(ParametricTriangleBoundary):
    """Parameter sharing for symmetry: a small master parameter vector
    controls all vertices via a gather (boundaries.py:1116-1229)."""

    def __init__(self, filter_masters, attach_slaves, zero_points,
                 vector_generator, **kw):
        super().__init__(zero_points, vector_generator, **kw)
        vertices = np.asarray(self.zero)
        if callable(filter_masters):
            masters = list(filter_masters(vertices))
        else:
            masters = list(filter_masters)
        master_index = {m: i for i, m in enumerate(masters)}
        unclaimed = set(range(vertices.shape[0])) - set(masters)
        slave_masters = {}
        for m in masters:
            slaves = attach_slaves(vertices, m, unclaimed)
            unclaimed -= set(slaves)
            for s in slaves:
                slave_masters[s] = master_index[m]
        if unclaimed:
            raise ValueError(
                f"MasterSlave: {len(unclaimed)} vertices were never attached "
                "to a master"
            )
        self.masters = np.asarray(masters, dtype=np.int64)
        self.gather = jnp.asarray(
            [master_index[i] if i in master_index else slave_masters[i]
             for i in range(vertices.shape[0])],
            dtype=jnp.int32,
        )

    @property
    def n_params(self) -> int:
        return len(self.masters)

    def init_params(self):
        full = jnp.broadcast_to(
            jnp.asarray(self.initial_parameters, self.dtype),
            (self.zero.shape[0],),
        )
        return full[self.masters]

    def params_to_vertices(self, params):
        expanded = params[self.gather]
        return self.zero + expanded[:, None] * self.vectors


class ParametricMultiTriangleBoundary:
    """Several triangle surfaces sharing zero points + vector field, with
    inter-surface constraints (boundaries.py:1233-1412) -- the standard way
    to build a lens (front + back surface with thickness constraints,
    dev/simple_3d_optimize.py:70-81)."""

    def __init__(self, zero_points, vector_generator, constraints, flip_norm,
                 initial_parameters=0.0, vertex_update_map=None,
                 material_list=None, category=OPTICAL, dtype=None):
        n = len(constraints)
        if len(flip_norm) != n:
            raise ValueError("constraints and flip_norm must have equal length")
        if not isinstance(initial_parameters, (list, tuple)):
            initial_parameters = [initial_parameters] * n
        material_list = material_list or [{}] * n
        self.constraints = list(constraints)
        self.surfaces = [
            ParametricTriangleBoundary(
                zero_points, vector_generator, flip_norm=fn,
                initial_parameters=ip, vertex_update_map=vertex_update_map,
                category=category, dtype=dtype, **mat,
            )
            for fn, ip, mat in zip(flip_norm, initial_parameters, material_list)
        ]

    @property
    def surface_count(self):
        return len(self.surfaces)

    def init_params(self):
        return [s.init_params() for s in self.surfaces]

    def constrain(self, params_list):
        out = list(params_list)
        for i, c in enumerate(self.constraints):
            out[i] = c.apply(i, out)
        return out

    def build(self, params_list) -> List[TriangleSet]:
        out = self.constrain(params_list)
        return [s.build(p) for s, p in zip(self.surfaces, out)]


class ParametricCylindricalGuide:
    """A closed cylinder-like light guide whose radius profile is trainable
    (boundaries.py:1416-1717).  Parameters encode radius above
    ``minimum_radius``; the built-in constraint subtracts min(params) so the
    narrowest point always sits at the minimum radius (:1613-1617).

    Builds its own mesh, accumulator, and vertex update map
    (mesh_parametrization_tools, seeded at the start point).
    """

    def __init__(self, start, end, minimum_radius, theta_res=6, z_res=8,
                 start_cap=True, end_cap=True, rotationally_symmetric=False,
                 initial_parameters=0.0, initial_taper=None, use_twist=False,
                 use_vertex_update_map=True, mat_in=None, mat_out=None,
                 category=OPTICAL, dtype=None):
        dtype = resolve_dtype(dtype)
        self.dtype = dtype
        self.mesh = mt.cylindrical_mesh(
            start, end, radius=minimum_radius, theta_res=theta_res,
            z_res=z_res, start_cap=start_cap, end_cap=end_cap,
            use_twist=use_twist,
        )
        self.theta_res = theta_res
        self.z_res = z_res
        self.start_cap = start_cap
        self.end_cap = end_cap
        self.rotationally_symmetric = rotationally_symmetric
        self.zero = jnp.asarray(self.mesh.points, dtype=dtype)
        self.faces = jnp.asarray(self.mesh.faces, dtype=jnp.int32)
        self.vectors = jnp.asarray(
            FromAxisVG(start, point=end).generate(self.zero), dtype=dtype
        )
        vum, self.accumulator = mt.mesh_parametrization_tools(
            self.mesh, mt.get_closest_point(self.mesh, start)
        )
        self.vertex_update_map = (jnp.asarray(vum, bool)
                                  if use_vertex_update_map else None)
        self.mat_in = mat_in
        self.mat_out = mat_out
        self.category = category

        if initial_taper is not None:
            try:
                t0, t1 = initial_taper
            except (TypeError, ValueError) as e:
                raise ValueError("initial_taper must be a 2-tuple") from e
            init_z = jnp.linspace(t0, t1, z_res, dtype=dtype)
            self._initial = (init_z if rotationally_symmetric
                             else jnp.repeat(init_z, theta_res))
        else:
            size = z_res if rotationally_symmetric else z_res * theta_res
            self._initial = jnp.broadcast_to(
                jnp.asarray(initial_parameters, dtype), (size,)
            )

    @property
    def n_params(self) -> int:
        return self._initial.shape[0]

    def init_params(self):
        return self._initial.copy()

    def _expand_params(self, params):
        """min-radius projection + symmetry expansion + zero rows for caps."""
        params = params - jnp.min(params)  # built-in min-radius constraint
        if self.rotationally_symmetric:
            params = jnp.repeat(params, self.theta_res)
        pads = (1 if self.start_cap else 0, 1 if self.end_cap else 0)
        return jnp.pad(params, pads)

    def params_to_vertices(self, params):
        full = self._expand_params(params)
        return self.zero + full[:, None] * self.vectors

    def build(self, params) -> TriangleSet:
        vertices = self.params_to_vertices(params)
        vp, v1, v2 = _masked_gather(vertices, self.faces, self.vertex_update_map)
        return TriangleSet.make(vp, v1, v2, category=self.category,
                                mat_in=self.mat_in, mat_out=self.mat_out,
                                dtype=self.dtype)

    def updated_mesh(self, params) -> mt.TriMesh:
        return mt.TriMesh(np.asarray(self.params_to_vertices(params)),
                          np.asarray(self.faces))


# ======================================================================
# even-asphere surfaces (beyond reference)
# ======================================================================

def _asphere_sag(r2, params, n_aspheric, dtype):
    """Even-asphere sag as a function of squared radial coordinate, with
    ``params = [c, k, a4, a6, ...]`` (curvature, conic constant, then
    ``n_aspheric`` even polynomial coefficients starting at r^4; the r^2
    term is absorbed into the curvature).  Differentiable in every
    parameter.  Delegates to the canonical shared model in
    :mod:`ops.asphere` -- the same implementation the analytic sequential
    tracer (``sequential.py``) intersects exactly, so the tessellated and
    analytic engines can never drift on the sag."""
    from tensorflowraytrace_tpu.ops import asphere

    return asphere.sag(jnp.asarray(r2, dtype), params[0], params[1],
                       params[2:2 + n_aspheric])


def _perp_frame(axis):
    """Right-handed orthonormal (e1, e2, axis) frame from a unit axis."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    helper = np.zeros(3)
    helper[int(np.argmin(np.abs(a)))] = 1.0
    e1 = np.cross(helper, a)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(a, e1)
    return e1, e2, a


class ParametricAsphereBoundary:
    """A 3D rotationally-symmetric **even-asphere** surface -- the industry
    standard lens-surface parametrization -- with a FEW global trainable
    parameters instead of one parameter per vertex:

        params = [c, k, a4, a6, ... ]   (2 + n_aspheric entries)

    sag(r) = c r^2 / (1 + sqrt(1 - (1+k) c^2 r^2)) + a4 r^4 + a6 r^6 + ...

    applied along ``axis`` over a circular mesh of ``aperture_radius``
    centered at ``vertex``.  Special cases: c = 1/R, k = 0 is a sphere of
    radius R; k = -e^2 selects the conic family (paraboloid k = -1,
    hyperboloid k < -1).  No reference counterpart (the reference's only
    trainable 3D surfaces are per-vertex freeform meshes,
    /root/reference/tfrt/boundaries.py:967-1112); this composes with them --
    few-parameter global shape here, per-vertex figure correction there.

    The low parameter count changes the optimization landscape: no mesh
    accumulator/smoother conditioning is needed, and classical designs
    (e.g. the perfect collimator hyperbola, examples/wavefront_lens.py)
    are exactly representable.
    """

    def __init__(self, vertex, axis, aperture_radius, target_edge_size,
                 n_aspheric=0, initial_curvature=0.0, initial_conic=0.0,
                 flip_norm=False, mat_in=None, mat_out=None,
                 category=OPTICAL, dtype=None):
        dtype = resolve_dtype(dtype)
        self.dtype = dtype
        self.n_aspheric = int(n_aspheric)
        base = mt.circular_mesh(aperture_radius, target_edge_size)
        if flip_norm:
            base = base.flip_faces()
        self.mesh = base
        e1, e2, a = _perp_frame(axis)
        xy = base.points[:, :2]
        self._r2 = jnp.asarray((xy ** 2).sum(1), dtype)
        self._base = jnp.asarray(
            np.asarray(vertex, np.float64)[None, :]
            + xy[:, :1] * e1[None, :] + xy[:, 1:2] * e2[None, :], dtype)
        self._axis = jnp.asarray(a, dtype)
        self.faces = jnp.asarray(base.faces, dtype=jnp.int32)
        self.initial_curvature = initial_curvature
        self.initial_conic = initial_conic
        self.mat_in = mat_in
        self.mat_out = mat_out
        self.category = category

    @property
    def n_params(self) -> int:
        return 2 + self.n_aspheric

    def init_params(self):
        p = np.zeros(self.n_params)
        p[0] = self.initial_curvature
        p[1] = self.initial_conic
        return jnp.asarray(p, self.dtype)

    def sag(self, r2, params):
        return _asphere_sag(r2, params, self.n_aspheric, self.dtype)

    def params_to_vertices(self, params):
        s = self.sag(self._r2, params)
        return self._base + s[:, None] * self._axis[None, :]

    def build(self, params) -> TriangleSet:
        vertices = self.params_to_vertices(params)
        vp, v1, v2 = _masked_gather(vertices, self.faces, None)
        return TriangleSet.make(vp, v1, v2, category=self.category,
                                mat_in=self.mat_in, mat_out=self.mat_out,
                                dtype=self.dtype)

    def updated_mesh(self, params) -> mt.TriMesh:
        return mt.TriMesh(np.asarray(self.params_to_vertices(params)),
                          np.asarray(self.faces))


class ParametricAsphereSegment:
    """The 2D profile of an even asphere: a polyline of ``resolution``
    segments spanning ``y in [-half_aperture, half_aperture]`` at
    ``x = vertex_x + sag(|y|)`` (sag along +x).  Same parameter vector as
    :class:`ParametricAsphereBoundary`.  Segment norms follow the p0->p1
    left-hand convention (reference engine.py:580-586); ``flip_norm``
    reverses each segment."""

    def __init__(self, vertex_x, half_aperture, resolution=64, n_aspheric=0,
                 initial_curvature=0.0, initial_conic=0.0, flip_norm=False,
                 mat_in=None, mat_out=None, category=OPTICAL, dtype=None):
        dtype = resolve_dtype(dtype)
        self.dtype = dtype
        self.n_aspheric = int(n_aspheric)
        y = np.linspace(-half_aperture, half_aperture, resolution + 1)
        self._y = jnp.asarray(y, dtype)
        self._r2 = jnp.asarray(y * y, dtype)
        self._vertex_x = jnp.asarray(vertex_x, dtype)
        self.flip_norm = flip_norm
        self.initial_curvature = initial_curvature
        self.initial_conic = initial_conic
        self.mat_in = mat_in
        self.mat_out = mat_out
        self.category = category

    @property
    def n_params(self) -> int:
        return 2 + self.n_aspheric

    def init_params(self):
        p = np.zeros(self.n_params)
        p[0] = self.initial_curvature
        p[1] = self.initial_conic
        return jnp.asarray(p, self.dtype)

    def sag(self, r2, params):
        return _asphere_sag(r2, params, self.n_aspheric, self.dtype)

    def build(self, params) -> SegmentSet:
        x = self._vertex_x + self.sag(self._r2, params)
        pts = jnp.stack([x, self._y], axis=1)
        p0, p1 = pts[:-1], pts[1:]
        if self.flip_norm:
            p0, p1 = p1, p0
        return SegmentSet.make(p0, p1, category=self.category,
                               mat_in=self.mat_in, mat_out=self.mat_out,
                               dtype=self.dtype)
