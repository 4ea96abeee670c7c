"""Surface sets: typed pytrees for segments, arcs, and triangles.

The reference represents boundaries as dicts of 1-D tensors keyed by geometric
signatures (SEGMENT_GEO_SIG / ARC_GEO_SIG / TRIANGLE_GEO_SIG,
/root/reference/tfrt/engine.py:18-21), merged with an int ``catagory`` label
(OPTICAL=0 / STOP=1 / TARGET=2, engine.py:425-521).  Here each geometry kind
is a dataclass pytree whose arrays can be produced *differentiably* from
parameters inside ``jax.grad`` (replacing the reference's stateful update
graph, see SURVEY.md item 2).

Material references live in ``mat_in`` / ``mat_out`` (int32 indices into the
engine's material list -- reference operation.py:260-272 "index" mode) or in
``fields['n_in']/['n_out']`` (float, "value" mode).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tensorflowraytrace_tpu.config import OPTICAL, resolve_dtype


def _as_cat(category, n):
    return jnp.broadcast_to(jnp.asarray(category, dtype=jnp.int32), (n,))


def _as_mat(mat, n):
    if mat is None:
        return jnp.zeros((n,), dtype=jnp.int32)
    arr = jnp.broadcast_to(jnp.asarray(mat, dtype=jnp.int32), (n,))
    # The engine's fused surface-table gather packs category<<20|mat_in<<10|
    # mat_out into one f32 column (engine.py project_3d) -- exact only for
    # mat ids in [0, 1024).  Enforce at build time when ids are concrete
    # (they are ints/arrays in every real scene; tracers pass through).
    if not isinstance(arr, jax.core.Tracer):
        lo, hi = int(jnp.min(arr)), int(jnp.max(arr))
        if lo < 0 or hi >= 1024:
            raise ValueError(
                f"material index out of range [0, 1024): got [{lo}, {hi}]; "
                "ids >= 1024 would silently corrupt the engine's packed "
                "f32 surface table")
    return arr


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["p0", "p1", "category", "mat_in", "mat_out", "fields"],
    meta_fields=["mats_specified"],
)
@dataclass
class SegmentSet:
    """2D line-segment surfaces.  p0/p1: (M, 2) endpoints.

    The norm convention matches the reference: normal angle =
    atan2(y_end - y_start, x_end - x_start) + pi/2 (engine.py:580-586).
    """

    p0: jax.Array
    p1: jax.Array
    category: jax.Array
    mat_in: jax.Array
    mat_out: jax.Array
    fields: Dict[str, jax.Array] = field(default_factory=dict)
    # static: whether mat_in/mat_out were explicitly annotated (material ids
    # default to 0, so presence can't be inferred from the arrays; the
    # validate_system signature audit keys off this)
    mats_specified: bool = True

    @staticmethod
    def make(p0, p1, category=OPTICAL, mat_in=None, mat_out=None, fields=None, dtype=None):
        dtype = resolve_dtype(dtype)
        p0 = jnp.asarray(p0, dtype=dtype)
        p1 = jnp.asarray(p1, dtype=dtype)
        m = p0.shape[0]
        return SegmentSet(
            p0=p0, p1=p1, category=_as_cat(category, m),
            mat_in=_as_mat(mat_in, m), mat_out=_as_mat(mat_out, m),
            fields={k: jnp.asarray(v) for k, v in (fields or {}).items()},
            mats_specified=mat_in is not None or mat_out is not None,
        )

    @property
    def n_surfaces(self) -> int:
        return self.p0.shape[0]

    @property
    def norm_angle(self):
        d = self.p1 - self.p0
        return jnp.arctan2(d[:, 1], d[:, 0]) + jnp.pi / 2

    def __getitem__(self, key):
        coord = {"x_start": (self.p0, 0), "y_start": (self.p0, 1),
                 "x_end": (self.p1, 0), "y_end": (self.p1, 1)}.get(key)
        if coord is not None:
            return coord[0][:, coord[1]]
        if key == "catagory" or key == "category":
            return self.category
        return self.fields[key]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["center", "angle_start", "angle_end", "radius",
                 "category", "mat_in", "mat_out", "fields"],
    meta_fields=["mats_specified"],
)
@dataclass
class ArcSet:
    """2D circular-arc surfaces (ARC_GEO_SIG: x_center, y_center, angle_start,
    angle_end, radius).  Negative radius flips the norm (engine.py:666-670)."""

    center: jax.Array       # (M, 2)
    angle_start: jax.Array  # (M,)
    angle_end: jax.Array    # (M,)
    radius: jax.Array       # (M,)
    category: jax.Array
    mat_in: jax.Array
    mat_out: jax.Array
    fields: Dict[str, jax.Array] = field(default_factory=dict)
    mats_specified: bool = True

    @staticmethod
    def make(center, angle_start, angle_end, radius, category=OPTICAL,
             mat_in=None, mat_out=None, fields=None, dtype=None):
        dtype = resolve_dtype(dtype)
        center = jnp.asarray(center, dtype=dtype)
        m = center.shape[0]
        b = lambda a: jnp.broadcast_to(jnp.asarray(a, dtype=dtype), (m,))
        return ArcSet(
            center=center, angle_start=b(angle_start), angle_end=b(angle_end),
            radius=b(radius), category=_as_cat(category, m),
            mat_in=_as_mat(mat_in, m), mat_out=_as_mat(mat_out, m),
            fields={k: jnp.asarray(v) for k, v in (fields or {}).items()},
            mats_specified=mat_in is not None or mat_out is not None,
        )

    @property
    def n_surfaces(self) -> int:
        return self.center.shape[0]

    def __getitem__(self, key):
        simple = {
            "x_center": self.center[:, 0], "y_center": self.center[:, 1],
            "angle_start": self.angle_start, "angle_end": self.angle_end,
            "radius": self.radius, "catagory": self.category,
            "category": self.category,
        }
        if key in simple:
            return simple[key]
        return self.fields[key]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vp", "v1", "v2", "norm", "category", "mat_in", "mat_out", "fields"],
    meta_fields=["norm_derived", "mats_specified"],
)
@dataclass
class TriangleSet:
    """3D triangle surfaces (TRIANGLE_GEO_SIG: xp..z2 + norm).

    vp/v1/v2: (M, 3) vertices; norm: (M, 3) unit face normals
    (cross(v1 - vp, v2 - v1), normalized -- reference boundaries.py:918-923).
    ``norm_derived`` (static) records that norm equals that cross-product
    formula, letting the engine recompute normals from gathered vertices
    instead of gathering them (dynamic gathers are the per-bounce cost).
    """

    vp: jax.Array
    v1: jax.Array
    v2: jax.Array
    norm: jax.Array
    category: jax.Array
    mat_in: jax.Array
    mat_out: jax.Array
    fields: Dict[str, jax.Array] = field(default_factory=dict)
    norm_derived: bool = False
    mats_specified: bool = True

    @staticmethod
    def make(vp, v1, v2, norm=None, category=OPTICAL, mat_in=None, mat_out=None,
             fields=None, dtype=None):
        dtype = resolve_dtype(dtype)
        vp = jnp.asarray(vp, dtype=dtype)
        v1 = jnp.asarray(v1, dtype=dtype)
        v2 = jnp.asarray(v2, dtype=dtype)
        m = vp.shape[0]
        derived = norm is None
        if norm is None:
            norm = compute_face_normals(vp, v1, v2)
        else:
            norm = jnp.asarray(norm, dtype=dtype)
        return TriangleSet(
            vp=vp, v1=v1, v2=v2, norm=norm, category=_as_cat(category, m),
            mat_in=_as_mat(mat_in, m), mat_out=_as_mat(mat_out, m),
            fields={k: jnp.asarray(v) for k, v in (fields or {}).items()},
            norm_derived=derived,
            mats_specified=mat_in is not None or mat_out is not None,
        )

    @staticmethod
    def from_vertices_faces(vertices, faces, **kwargs):
        """Gather (V, 3) vertices through (F, 3) int faces -- differentiable
        w.r.t. ``vertices`` (the path gradients take into mesh parameters)."""
        vertices = jnp.asarray(vertices)
        faces = jnp.asarray(faces, dtype=jnp.int32)
        vp = vertices[faces[:, 0]]
        v1 = vertices[faces[:, 1]]
        v2 = vertices[faces[:, 2]]
        return TriangleSet.make(vp, v1, v2, **kwargs)

    @property
    def n_surfaces(self) -> int:
        return self.vp.shape[0]

    def __getitem__(self, key):
        mapping = {
            "xp": self.vp[:, 0], "yp": self.vp[:, 1], "zp": self.vp[:, 2],
            "x1": self.v1[:, 0], "y1": self.v1[:, 1], "z1": self.v1[:, 2],
            "x2": self.v2[:, 0], "y2": self.v2[:, 1], "z2": self.v2[:, 2],
            "norm": self.norm, "catagory": self.category, "category": self.category,
        }
        if key in mapping:
            return mapping[key]
        return self.fields[key]


def compute_face_normals(vp, v1, v2):
    """Unit face normals with the reference's orientation convention
    (boundaries.py:918-923): normalize(cross(v1 - vp, v2 - v1))."""
    n = jnp.cross(v1 - vp, v2 - v1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def _concat_fields(sets):
    common = set(sets[0].fields)
    for s in sets[1:]:
        common &= set(s.fields)
    return {k: jnp.concatenate([s.fields[k] for s in sets], axis=0) for k in common}


def concat_segments(sets):
    sets = [s for s in sets if s is not None and s.n_surfaces > 0]
    if not sets:
        return None
    return SegmentSet(
        p0=jnp.concatenate([s.p0 for s in sets]),
        p1=jnp.concatenate([s.p1 for s in sets]),
        category=jnp.concatenate([s.category for s in sets]),
        mat_in=jnp.concatenate([s.mat_in for s in sets]),
        mat_out=jnp.concatenate([s.mat_out for s in sets]),
        fields=_concat_fields(sets),
        mats_specified=any(s.mats_specified for s in sets),
    )


def concat_arcs(sets):
    sets = [s for s in sets if s is not None and s.n_surfaces > 0]
    if not sets:
        return None
    return ArcSet(
        center=jnp.concatenate([s.center for s in sets]),
        angle_start=jnp.concatenate([s.angle_start for s in sets]),
        angle_end=jnp.concatenate([s.angle_end for s in sets]),
        radius=jnp.concatenate([s.radius for s in sets]),
        category=jnp.concatenate([s.category for s in sets]),
        mat_in=jnp.concatenate([s.mat_in for s in sets]),
        mat_out=jnp.concatenate([s.mat_out for s in sets]),
        fields=_concat_fields(sets),
        mats_specified=any(s.mats_specified for s in sets),
    )


def concat_triangles(sets):
    sets = [s for s in sets if s is not None and s.n_surfaces > 0]
    if not sets:
        return None
    return TriangleSet(
        vp=jnp.concatenate([s.vp for s in sets]),
        v1=jnp.concatenate([s.v1 for s in sets]),
        v2=jnp.concatenate([s.v2 for s in sets]),
        norm=jnp.concatenate([s.norm for s in sets]),
        category=jnp.concatenate([s.category for s in sets]),
        mat_in=jnp.concatenate([s.mat_in for s in sets]),
        mat_out=jnp.concatenate([s.mat_out for s in sets]),
        fields=_concat_fields(sets),
        norm_derived=all(s.norm_derived for s in sets),
        mats_specified=any(s.mats_specified for s in sets),
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["segments", "arcs"],
    meta_fields=[],
)
@dataclass
class Scene2D:
    """Merged 2D scene: all segments and arcs, category-labeled
    (the functional equivalent of OpticalSystem2D._merged_segments/_merged_arcs,
    engine.py:425-521)."""

    segments: Optional[SegmentSet]
    arcs: Optional[ArcSet]

    @staticmethod
    def build(optical_segments=(), stop_segments=(), target_segments=(),
              optical_arcs=(), stop_arcs=(), target_arcs=()):
        from tensorflowraytrace_tpu.config import STOP, TARGET

        def label(sets, cat):
            return [dataclasses.replace(s, category=_as_cat(cat, s.n_surfaces))
                    for s in sets]

        segs = (label(optical_segments, OPTICAL) + label(stop_segments, STOP)
                + label(target_segments, TARGET))
        arcs = (label(optical_arcs, OPTICAL) + label(stop_arcs, STOP)
                + label(target_arcs, TARGET))
        return Scene2D(segments=concat_segments(segs), arcs=concat_arcs(arcs))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["triangles"],
    meta_fields=[],
)
@dataclass
class Scene3D:
    """Merged 3D scene (the equivalent of OpticalSystem3D._merged,
    engine.py:871-1018): optical surfaces FIRST, then stops, then targets."""

    triangles: TriangleSet

    @staticmethod
    def build(optical=(), stops=(), targets=()):
        from tensorflowraytrace_tpu.config import STOP, TARGET

        def label(sets, cat):
            return [dataclasses.replace(s, category=_as_cat(cat, s.n_surfaces))
                    for s in sets]

        merged = concat_triangles(
            label(optical, OPTICAL) + label(stops, STOP) + label(targets, TARGET)
        )
        if merged is None:
            raise ValueError("Scene3D.build: no surfaces")
        return Scene3D(triangles=merged)
