"""Sources: factories that turn distributions into RaySets.

Reference counterpart: /root/reference/tfrt/sources.py.  Sources cross one or
more *domains* -- angle, base_point (or start/end point), wavelength -- into
a flat ray batch.  A *dense* source takes every combination of its domains
(the reference's meshgrid-built gather machinery, sources.py:186-280); an
un-dense source matches equally-sized domains 1:1.

Rebuild differences:

* ``sample(key) -> RaySet`` is a pure function of the PRNG key; random
  distributions re-sample per call (replacing update()-driven statefulness).
* Ranks are implemented for real: each source attaches a ``rank`` field taken
  from the chosen domain's distribution, expanded across the dense product.
  (The reference documents ``rank_type``/``external_rank_source`` but never
  implemented them -- sources.py:40-50 vs update.py:42; real scripts plumb
  ranks through ``extra_fields``, dev/hexalens.py:59-62.)
* ``extra_fields``: dict ``{name: (domain, value_or_callable)}``, matching
  the reference's plumbing (sources.py:282-309).

Domain order in the dense product is fixed and documented: angle/start_point,
base_point/end_point, wavelength.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from tensorflowraytrace_tpu.config import resolve_dtype
from tensorflowraytrace_tpu.models.rays import RaySet
from tensorflowraytrace_tpu.utils import quaternion as quat

PI = math.pi
_X_AXIS = (1.0, 0.0, 0.0)


def dense_gathers(sizes):
    """Gather indices expanding per-domain arrays to their dense product.

    ``sizes``: ordered dict domain -> length.  Returns dict domain ->
    (total,) int32 index array (the reference's _domain_gathers,
    sources.py:239-254).
    """
    order = list(sizes)
    ranges = [jnp.arange(sizes[d]) for d in order]
    grids = jnp.meshgrid(*ranges, indexing="ij")
    return {d: g.reshape(-1).astype(jnp.int32) for d, g in zip(order, grids)}


def _expand(value, domain, gathers, total):
    """Expand a per-domain array (or scalar) to the full ray count."""
    value = jnp.asarray(value)
    if value.ndim == 0:
        return jnp.broadcast_to(value, (total,))
    if gathers is None:  # un-dense: sizes must already match (or length-1)
        if value.shape[0] == 1:
            reps = (total,) + value.shape[1:]
            return jnp.broadcast_to(value, reps)
        return value
    return jnp.take(value, gathers[domain], axis=0)


class SourceBase:
    """Shared dense-product + extra-fields machinery."""

    def __init__(self, dimension, wavelengths=None, dense=True, extra_fields=None):
        if dimension not in (2, 3):
            raise ValueError("Source: dimension must be 2 or 3")
        self.dimension = dimension
        self.wavelengths = wavelengths
        self.dense = dense
        self.extra_fields = dict(extra_fields or {})
        for name, spec in self.extra_fields.items():
            if not (isinstance(spec, tuple) and len(spec) in (2, 3)):
                raise ValueError(
                    "extra_fields entries must be (domain, value) or "
                    "(domain, object, attribute)"
                )

    # subclasses override: return ordered {domain: (array, ranks_or_None)}
    def _domain_vars(self, key, dtype):
        raise NotImplementedError

    # subclasses override: build p0/p1 from expanded vars
    def _build_rays(self, expanded, dtype):
        raise NotImplementedError

    # which domain supplies the rank field (None -> no rank)
    rank_domain: Optional[str] = None

    def _resolve_extra(self, spec):
        if len(spec) == 2:
            domain, raw = spec
        else:
            domain, obj, attr = spec
            try:
                raw = obj[attr]
            except (TypeError, KeyError):
                raw = getattr(obj, attr)
        if callable(raw):
            raw = raw()
        return domain, jnp.asarray(raw)

    def sample(self, key=None, dtype=None) -> RaySet:
        dtype = resolve_dtype(dtype)
        if key is None:
            key = jax.random.PRNGKey(0)
        domain_vars = self._domain_vars(key, dtype)

        sizes = {}
        for d, (arr, _r) in domain_vars.items():
            sizes[d] = int(jnp.shape(arr)[0])
        if self.wavelengths is not None:
            wl = jnp.asarray(self.wavelengths, dtype=dtype).reshape(-1)
            sizes["wavelength"] = wl.shape[0]
        else:
            wl = None

        extra_resolved = {}
        for name, spec in self.extra_fields.items():
            domain, value = self._resolve_extra(spec)
            extra_resolved[name] = (domain, value.astype(dtype)
                                    if jnp.issubdtype(value.dtype, jnp.floating)
                                    else value)
            if domain not in sizes and domain != "whole":
                sizes[domain] = int(value.shape[0])

        if self.dense:
            gathers = dense_gathers(sizes)
            total = 1
            for s in sizes.values():
                total *= s
        else:
            gathers = None
            real = [s for s in sizes.values() if s != 1]
            if real and len(set(real)) > 1:
                raise ValueError(
                    f"un-dense source needs equal domain sizes, got {sizes}"
                )
            total = real[0] if real else 1

        expanded = {
            d: _expand(arr, d, gathers, total) for d, (arr, _r) in domain_vars.items()
        }
        p0, p1 = self._build_rays(expanded, dtype)

        fields = {}
        # first-class ranks
        if self.rank_domain is not None:
            _arr, ranks = domain_vars[self.rank_domain]
            if ranks is not None:
                fields["rank"] = _expand(ranks, self.rank_domain, gathers, total)
        # extra fields
        for name, (domain, value) in extra_resolved.items():
            if domain == "whole":
                fields[name] = (jnp.broadcast_to(value, (total,))
                                if value.ndim == 0 else value)
            else:
                fields[name] = _expand(value, domain, gathers, total)

        wavelength = (_expand(wl, "wavelength", gathers, total)
                      if wl is not None else None)
        return RaySet.make(p0, p1, wavelength, fields=fields, dtype=dtype)

    # reference-style convenience
    def snapshot(self, key=None, dtype=None):
        rays = self.sample(key, dtype)
        return {k: rays[k] for k in rays.keys()}


class _Aimable(SourceBase):
    """center + central_angle aiming shared by Point/Angular sources
    (RotationBase, sources.py:386-460).

    In 3D, ``central_angle`` is a direction vector (``angle_type='vector'``,
    rotated from the +x axis) or a quaternion (``angle_type='quaternion'``).
    """

    def __init__(self, dimension, center, central_angle, angle_type="vector", **kw):
        super().__init__(dimension, **kw)
        self.center = center
        if angle_type not in ("vector", "quaternion"):
            raise ValueError("angle_type must be 'vector' or 'quaternion'")
        self.angle_type = angle_type
        self.central_angle = central_angle

    def _rotation(self, dtype):
        if self.dimension == 2:
            return jnp.asarray(self.central_angle, dtype=dtype)
        ca = jnp.asarray(self.central_angle, dtype=dtype)
        if self.angle_type == "vector":
            if ca.shape != (3,):
                raise ValueError("central_angle vector must have shape (3,)")
            return quat.quat_from_u_to_v(jnp.asarray(_X_AXIS, dtype=dtype), ca)
        if ca.shape != (4,):
            raise ValueError("central_angle quaternion must have shape (4,)")
        return ca

    def _rotate_dirs(self, dirs, dtype):
        if self.dimension == 2:
            return dirs + self._rotation(dtype)  # dirs are scalar angles
        return quat.rotate_vector(self._rotation(dtype), dirs)

    def _rotate_points(self, points, dtype):
        if self.dimension == 2:
            return quat.rotate_2d(points, self._rotation(dtype))
        if points.shape[-1] == 2:  # 2D base points in 3D: lift to y-z plane
            zeros = jnp.zeros((points.shape[0], 1), dtype=points.dtype)
            points = jnp.concatenate([zeros, points], axis=1)
        return quat.rotate_vector(self._rotation(dtype), points)


class PointSource(_Aimable):
    """Rays emanating from (or converging to) a single point
    (sources.py:464-674).  In 2D the angular distribution yields scalar
    angles; in 3D it yields unit direction vectors (e.g. a sphere
    distribution)."""

    rank_domain = "angle"

    def __init__(self, dimension, center, central_angle, angular_distribution,
                 wavelengths, start_on_center=True, ray_length=1.0,
                 angle_type="vector", **kw):
        super().__init__(dimension, center, central_angle, angle_type,
                         wavelengths=wavelengths, **kw)
        self.angular_distribution = angular_distribution
        self.start_on_center = start_on_center
        self.ray_length = ray_length

    def _domain_vars(self, key, dtype):
        angles, ranks = self.angular_distribution.sample(key, dtype)
        return {"angle": (angles, ranks)}

    def _build_rays(self, expanded, dtype):
        angles = self._rotate_dirs(expanded["angle"], dtype)
        center = jnp.asarray(self.center, dtype=dtype)
        n = angles.shape[0]
        if self.dimension == 2:
            start = jnp.broadcast_to(center, (n, 2))
            direction = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=1)
        else:
            start = jnp.broadcast_to(center, (n, 3))
            direction = angles
        end = start + self.ray_length * direction
        return (start, end) if self.start_on_center else (end, start)


class AngularSource(_Aimable):
    """Rays from multiple base points x multiple directions
    (sources.py:678-914)."""

    rank_domain = "base_point"

    def __init__(self, dimension, center, central_angle, angular_distribution,
                 base_point_distribution, wavelengths, start_on_base=True,
                 ray_length=1.0, angle_type="vector", rank_domain="base_point",
                 **kw):
        super().__init__(dimension, center, central_angle, angle_type,
                         wavelengths=wavelengths, **kw)
        self.angular_distribution = angular_distribution
        self.base_point_distribution = base_point_distribution
        self.start_on_base = start_on_base
        self.ray_length = ray_length
        self.rank_domain = rank_domain

    def _domain_vars(self, key, dtype):
        ka, kb = jax.random.split(key)
        angles, a_ranks = self.angular_distribution.sample(ka, dtype)
        points, p_ranks = self.base_point_distribution.sample(kb, dtype)
        return {"angle": (angles, a_ranks), "base_point": (points, p_ranks)}

    def _build_rays(self, expanded, dtype):
        angles = self._rotate_dirs(expanded["angle"], dtype)
        base = self._rotate_points(expanded["base_point"], dtype)
        center = jnp.asarray(self.center, dtype=dtype)
        start = center + base
        if self.dimension == 2:
            direction = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=1)
        else:
            direction = angles
        end = start + self.ray_length * direction
        return (start, end) if self.start_on_base else (end, start)


class AperatureSource(SourceBase):
    """Rays spanning two absolute point distributions (sources.py:918-1095);
    no center/rotation.  2D distributions are lifted into the y-z plane for
    3D sources.  (Reference spelling kept.)"""

    def __init__(self, dimension, start_point_distribution, end_point_distribution,
                 wavelengths, rank_domain="start_point", **kw):
        super().__init__(dimension, wavelengths=wavelengths, **kw)
        self.start_point_distribution = start_point_distribution
        self.end_point_distribution = end_point_distribution
        self.rank_domain = rank_domain

    def _lift(self, points):
        if self.dimension == 3 and points.shape[-1] == 2:
            zeros = jnp.zeros((points.shape[0], 1), dtype=points.dtype)
            return jnp.concatenate([zeros, points], axis=1)
        return points

    def _domain_vars(self, key, dtype):
        ks, ke = jax.random.split(key)
        s_points, s_ranks = self.start_point_distribution.sample(ks, dtype)
        e_points, e_ranks = self.end_point_distribution.sample(ke, dtype)
        return {
            "start_point": (self._lift(s_points), s_ranks),
            "end_point": (self._lift(e_points), e_ranks),
        }

    def _build_rays(self, expanded, dtype):
        return expanded["start_point"], expanded["end_point"]


class PrecompiledSource(SourceBase):
    """A fully-annotated ray cache with per-step random downsampling and
    endpoint perturbation (sources.py:1099-1358).

    Build it from a traced/sampled RaySet (``from_rays``), another source, or
    a pickle file; each ``sample(key)`` draws ``sample_count`` rays with
    replacement and optionally jitters the start/end points with Gaussian
    noise -- the reference's scale-by-sampling workflow (SURVEY.md 3.4).
    """

    def __init__(self, dimension, arg=None, sample_count=100,
                 do_downsample=True, start_perturbation=None,
                 end_perturbation=None):
        super().__init__(dimension, dense=False)
        import pickle as _pickle

        self.sample_count = sample_count
        self.do_downsample = do_downsample
        self.start_perturbation = start_perturbation
        self.end_perturbation = end_perturbation
        self._data = None
        if isinstance(arg, str):
            with open(arg, "rb") as f:
                self._data = _pickle.load(f)
        elif isinstance(arg, RaySet):
            self.from_rays(arg)
        elif arg is not None and hasattr(arg, "sample"):
            self.from_rays(arg.sample(jax.random.PRNGKey(0)))

    def from_rays(self, rays: RaySet):
        """Ingest a ray set (e.g. re-ingest trace output, the reference's
        ``from_samples``, sources.py:1174-1181)."""
        import numpy as np

        self._data = {
            "p0": np.asarray(rays.p0),
            "p1": np.asarray(rays.p1),
            "wavelength": np.asarray(rays.wavelength),
            "fields": {k: np.asarray(v) for k, v in rays.fields.items()},
        }
        return self

    def save(self, filename):
        import pickle as _pickle

        with open(filename, "wb") as f:
            _pickle.dump(self._data, f, _pickle.HIGHEST_PROTOCOL)

    def sample(self, key=None, dtype=None) -> RaySet:
        dtype = resolve_dtype(dtype)
        if self._data is None:
            raise ValueError("PrecompiledSource: no ray data loaded")
        if key is None:
            key = jax.random.PRNGKey(0)
        p0 = jnp.asarray(self._data["p0"], dtype=dtype)
        p1 = jnp.asarray(self._data["p1"], dtype=dtype)
        wl = jnp.asarray(self._data["wavelength"], dtype=dtype)
        fields = {k: jnp.asarray(v) for k, v in self._data["fields"].items()}

        k_idx, k_s, k_e = jax.random.split(key, 3)
        if self.do_downsample:
            idx = jax.random.randint(k_idx, (self.sample_count,), 0, p0.shape[0])
            p0 = jnp.take(p0, idx, axis=0)
            p1 = jnp.take(p1, idx, axis=0)
            wl = jnp.take(wl, idx, axis=0)
            fields = {k: jnp.take(v, idx, axis=0) for k, v in fields.items()}
        if self.start_perturbation is not None:
            dev = jnp.broadcast_to(
                jnp.asarray(self.start_perturbation, dtype=dtype),
                (p0.shape[1],))
            p0 = p0 + jax.random.normal(k_s, p0.shape, dtype=dtype) * dev
        if self.end_perturbation is not None:
            dev = jnp.broadcast_to(
                jnp.asarray(self.end_perturbation, dtype=dtype),
                (p1.shape[1],))
            p1 = p1 + jax.random.normal(k_e, p1.shape, dtype=dtype) * dev
        return RaySet.make(p0, p1, wl, fields=fields, dtype=dtype)


class ManualSource(SourceBase):
    """A do-nothing source filled with explicit ray data
    (sources.py:363-382)."""

    def __init__(self, dimension, p0, p1, wavelengths=None, fields=None):
        super().__init__(dimension, wavelengths=wavelengths, dense=False)
        self._p0 = p0
        self._p1 = p1
        self._fields = dict(fields or {})

    def sample(self, key=None, dtype=None) -> RaySet:
        dtype = resolve_dtype(dtype)
        wl = self.wavelengths
        return RaySet.make(jnp.asarray(self._p0, dtype),
                           jnp.asarray(self._p1, dtype),
                           None if wl is None else jnp.asarray(wl, dtype),
                           fields=self._fields, dtype=dtype)
