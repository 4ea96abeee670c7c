"""Angle and base-point samplers for building sources.

Reference counterpart: /root/reference/tfrt/distributions.py (3195 LoC of
stateful RecursivelyUpdatable classes that re-sample on ``update()``).
Rebuilt as lightweight objects with a single pure method::

    sample(key, dtype) -> (values, ranks)

Static distributions ignore the key; Random ones consume it (the reference's
"re-sample every update", distributions.py:381-391, becomes "pass a fresh
PRNG key each step" -- explicit and reproducible).  Ranks are first-class
(fixing the reference's documented-but-dead ``rank_type`` kwarg,
SURVEY.md inventory note).

Class-by-class parity (citations into the reference):
  ManualAngularDistribution        distributions.py:166
  StaticUniformAngularDistribution distributions.py:240  (linspace; rank = angle / max|limit|)
  RandomUniformAngularDistribution distributions.py:317
  StaticLambertianAngularDist.     distributions.py:394  (rank = sin(angle), uniform in rank)
  RandomLambertianAngularDist.     distributions.py:473
  ManualBasePointDistribution      distributions.py:629
  StaticUniformBeam / RandomUniformBeam          distributions.py:888 / 951
  StaticUniformAperaturePoints / Random...       distributions.py:1125 / 1178
  StaticUniformSquare / RandomUniformSquare      distributions.py:1361 / 1375
  StaticUniformCircle / RandomUniformCircle      distributions.py:1570 / 1586 (golden spiral)
  StaticUniformSphere / RandomUniformSphere      distributions.py:1726 / 1751
  StaticLambertianSphere / RandomLambertianSphere distributions.py:1778 / 1814
  BasePointTransformation          distributions.py:2014 (scale -> rotate -> translate)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tensorflowraytrace_tpu.config import resolve_dtype
from tensorflowraytrace_tpu.utils import quaternion as quat

PI = math.pi
GOLDEN_ANGLE = PI * (1 + 5 ** 0.5)


def _key(key):
    if key is None:
        raise ValueError(
            "Random distribution sampled without a PRNG key. Pass key= to "
            "sample()/source.sample()."
        )
    return key


class Distribution:
    """Base: exposes sample(); `.angles`/`.points`/`.ranks` caches give drop-in
    compatibility with reference code that reads attributes after update()."""

    is_random = False

    def sample(self, key=None, dtype=None):
        raise NotImplementedError

    def update(self, key=None, dtype=None):
        """Eagerly sample and cache (reference-style stateful access)."""
        vals, ranks = self.sample(key, dtype)
        self._cached = (vals, ranks)
        return vals, ranks

    @property
    def ranks(self):
        if not hasattr(self, "_cached"):
            self.update()
        return self._cached[1]


class AngularDistribution(Distribution):
    @property
    def angles(self):
        if not hasattr(self, "_cached"):
            self.update()
        return self._cached[0]


class BasePointDistribution(Distribution):
    @property
    def points(self):
        if not hasattr(self, "_cached"):
            self.update()
        return self._cached[0]


# ======================================================================
# angular distributions (2D scalars)
# ======================================================================

class ManualAngularDistribution(AngularDistribution):
    def __init__(self, angles, ranks=None):
        self._angles = angles
        self._ranks = ranks

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        angles = jnp.asarray(self._angles, dtype=dtype)
        ranks = None if self._ranks is None else jnp.asarray(self._ranks, dtype=dtype)
        return angles, ranks


def _uniform_angle_ranks(angles, min_angle, max_angle):
    # rank normalized by the most extreme limit (distributions.py:134-147)
    scale = max(abs(min_angle), abs(max_angle))
    return angles / scale if scale > 0 else angles


class StaticUniformAngularDistribution(AngularDistribution):
    def __init__(self, min_angle, max_angle, sample_count):
        if not (-PI <= min_angle <= max_angle <= PI):
            raise ValueError("angles must satisfy -PI <= min <= max <= PI")
        if sample_count <= 0:
            raise ValueError("sample_count must be > 0")
        self.min_angle = min_angle
        self.max_angle = max_angle
        self.sample_count = sample_count

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        angles = jnp.linspace(self.min_angle, self.max_angle, self.sample_count,
                              dtype=dtype)
        return angles, _uniform_angle_ranks(angles, self.min_angle, self.max_angle)


class RandomUniformAngularDistribution(AngularDistribution):
    is_random = True

    def __init__(self, min_angle, max_angle, sample_count):
        if not (-PI <= min_angle <= max_angle <= PI):
            raise ValueError("angles must satisfy -PI <= min <= max <= PI")
        if sample_count <= 0:
            raise ValueError("sample_count must be > 0")
        self.min_angle = min_angle
        self.max_angle = max_angle
        self.sample_count = sample_count

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        angles = jax.random.uniform(
            _key(key), (self.sample_count,), dtype=dtype,
            minval=self.min_angle, maxval=self.max_angle,
        )
        return angles, _uniform_angle_ranks(angles, self.min_angle, self.max_angle)


class StaticLambertianAngularDistribution(AngularDistribution):
    """Cosine-weighted angles; rank = sin(angle), uniform in rank
    (distributions.py:456-464)."""

    def __init__(self, min_angle, max_angle, sample_count):
        if not (-PI / 2 <= min_angle <= max_angle <= PI / 2):
            raise ValueError("Lambertian angles must lie within [-PI/2, PI/2]")
        self.min_angle = min_angle
        self.max_angle = max_angle
        self.sample_count = sample_count

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        ranks = jnp.linspace(math.sin(self.min_angle), math.sin(self.max_angle),
                             self.sample_count, dtype=dtype)
        return jnp.arcsin(ranks), ranks


class RandomLambertianAngularDistribution(AngularDistribution):
    is_random = True

    def __init__(self, min_angle, max_angle, sample_count):
        if not (-PI / 2 <= min_angle <= max_angle <= PI / 2):
            raise ValueError("Lambertian angles must lie within [-PI/2, PI/2]")
        self.min_angle = min_angle
        self.max_angle = max_angle
        self.sample_count = sample_count

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        ranks = jax.random.uniform(
            _key(key), (self.sample_count,), dtype=dtype,
            minval=math.sin(self.min_angle), maxval=math.sin(self.max_angle),
        )
        return jnp.arcsin(ranks), ranks


# ======================================================================
# base point distributions
# ======================================================================

class ManualBasePointDistribution(BasePointDistribution):
    """Custom points (distributions.py:629-743).  ``from_mesh`` pulls the
    vertex positions of a TriMesh on every sample (the reference's pyvista
    PolyData hook, :652-659, re-reading points each update)."""

    def __init__(self, dimension, points=None, ranks=None, from_mesh=None):
        if dimension not in (2, 3):
            raise ValueError("dimension must be 2 or 3")
        self.dimension = dimension
        self._points = points
        self._ranks = ranks
        self.from_mesh = from_mesh

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        if self.from_mesh is not None:
            from tensorflowraytrace_tpu.models import mesh as _mt

            points = jnp.asarray(_mt.as_trimesh(self.from_mesh).points,
                                 dtype=dtype)
        elif self._points is None:
            points = jnp.zeros((0, self.dimension), dtype=dtype)
        else:
            points = jnp.asarray(self._points, dtype=dtype)
        ranks = None if self._ranks is None else jnp.asarray(self._ranks, dtype=dtype)
        return points, ranks


class _BeamBase(BasePointDistribution):
    """2D beam: points on a line perpendicular to central_angle, spanning
    [beam_start, beam_end]; rank 0 at the origin, |rank|=1 at the far edge
    (distributions.py:746-886)."""

    def __init__(self, beam_start, beam_end, sample_count, central_angle=0.0):
        if beam_start > beam_end:
            raise ValueError("beam_start must be <= beam_end")
        if sample_count <= 0:
            raise ValueError("sample_count must be > 0")
        self.beam_start = beam_start
        self.beam_end = beam_end
        self.sample_count = sample_count
        self.central_angle = central_angle

    def _ranks(self, key, dtype):
        raise NotImplementedError

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        rank_scale = max(abs(self.beam_start), abs(self.beam_end))
        ranks = self._ranks(key, dtype)
        # endpoint at rank -1/+1 along the perpendicular (central - PI/2)
        ex = rank_scale * math.cos(self.central_angle - PI / 2)
        ey = rank_scale * math.sin(self.central_angle - PI / 2)
        # the reference's endpoint = beam_start/|start_rank| * (cos, sin):
        # beam_start / |beam_start / rank_scale| = sign(beam_start)*rank_scale;
        # combined with rank parametrization this spans the same segment.
        sign = -1.0 if self.beam_start < 0 else 1.0
        points = jnp.stack([ranks * sign * ex, ranks * sign * ey], axis=1)
        return points.astype(dtype), ranks


class StaticUniformBeam(_BeamBase):
    def _ranks(self, key, dtype):
        scale = max(abs(self.beam_start), abs(self.beam_end))
        return jnp.linspace(self.beam_start / scale, self.beam_end / scale,
                            self.sample_count, dtype=dtype)


class RandomUniformBeam(_BeamBase):
    is_random = True

    def _ranks(self, key, dtype):
        scale = max(abs(self.beam_start), abs(self.beam_end))
        return jax.random.uniform(
            _key(key), (self.sample_count,), dtype=dtype,
            minval=self.beam_start / scale, maxval=self.beam_end / scale,
        )


class _AperaturePointBase(BasePointDistribution):
    """Points spanning two absolute 2D endpoints; rank 0 at start, 1 at end
    (distributions.py:1019-1123).  (Reference spelling kept.)"""

    def __init__(self, start_point, end_point, sample_count):
        if sample_count <= 0:
            raise ValueError("sample_count must be > 0")
        self.start_point = start_point
        self.end_point = end_point
        self.sample_count = sample_count

    def _ranks(self, key, dtype):
        raise NotImplementedError

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        ranks = self._ranks(key, dtype)
        s = jnp.asarray(self.start_point, dtype=dtype).reshape(1, 2)
        e = jnp.asarray(self.end_point, dtype=dtype).reshape(1, 2)
        points = s + ranks[:, None] * (e - s)
        return points, ranks


class StaticUniformAperaturePoints(_AperaturePointBase):
    def _ranks(self, key, dtype):
        return jnp.linspace(0.0, 1.0, self.sample_count, dtype=dtype)


class RandomUniformAperaturePoints(_AperaturePointBase):
    is_random = True

    def _ranks(self, key, dtype):
        return jax.random.uniform(_key(key), (self.sample_count,), dtype=dtype)


class _SquareBase(BasePointDistribution):
    """Grid / random points in a centered rectangle; 2D rank = points
    normalized by the longest half-side (distributions.py:1238-1354)."""

    def __init__(self, x_size, x_res, y_size=None, y_res=None):
        if x_size <= 0:
            raise ValueError("x_size must be > 0")
        self.x_size = x_size
        self.x_res = x_res
        self.y_size = y_size or x_size
        self.y_res = y_res or x_res

    def _points(self, key, dtype):
        raise NotImplementedError

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        points = self._points(key, dtype)
        ranks = points / max(self.x_size, self.y_size)
        return points, ranks


class StaticUniformSquare(_SquareBase):
    def _points(self, key, dtype):
        x = jnp.linspace(-self.x_size, self.x_size, self.x_res, dtype=dtype)
        y = jnp.linspace(-self.y_size, self.y_size, self.y_res, dtype=dtype)
        xg, yg = jnp.meshgrid(x, y)
        return jnp.stack([xg.reshape(-1), yg.reshape(-1)], axis=1)


class RandomUniformSquare(_SquareBase):
    is_random = True

    def _points(self, key, dtype):
        n = self.x_res * self.y_res
        kx, ky = jax.random.split(_key(key))
        x = jax.random.uniform(kx, (n,), dtype=dtype, minval=-self.x_size,
                               maxval=self.x_size)
        y = jax.random.uniform(ky, (n,), dtype=dtype, minval=-self.y_size,
                               maxval=self.y_size)
        return jnp.stack([x, y], axis=1)


def _theta_mod(theta, theta_start, theta_end):
    """Confine golden-spiral angles to a theta window (ThetaMod,
    distributions.py:1396-1446)."""
    if theta_start == 0 and theta_end == 2 * PI:
        return theta
    return theta % (theta_end - theta_start) + theta_start


class _CircleBase(BasePointDistribution):
    """Evenly-spread points inside a circle via golden spiral
    (distributions.py:1450-1567).  ``ranks`` are the normalized cartesian
    points; ``polar_ranks`` (r in [0,1], theta in [0,2PI]) also provided."""

    def __init__(self, sample_count, radius=1.0, theta_start=0.0, theta_end=2 * PI):
        if sample_count <= 0:
            raise ValueError("sample_count must be > 0")
        if radius <= 0:
            raise ValueError("radius must be > 0")
        self.sample_count = sample_count
        self.radius = radius
        self.theta_start = theta_start
        self.theta_end = theta_end

    def _polar(self, key, dtype):
        raise NotImplementedError

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        r, theta = self._polar(key, dtype)
        # random subclasses draw theta uniformly WITHIN the window (the
        # mod-wrap would double the density of the first wrapped span --
        # same bias class as the reference's golden-angle azimuth bug);
        # static spirals rely on the wrap (ThetaMod, distributions.py:1396)
        if not self.is_random:
            theta = _theta_mod(theta, self.theta_start, self.theta_end)
        self._r, self._theta = r, theta
        points = self.radius * jnp.stack(
            [r * jnp.cos(theta), r * jnp.sin(theta)], axis=1
        )
        ranks = jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=1)
        return points, ranks

    @property
    def polar_ranks(self):
        if not hasattr(self, "_r"):
            self.update()
        return jnp.stack([self._r, jnp.mod(self._theta, 2 * PI)], axis=1)

    @property
    def polar_points(self):
        if not hasattr(self, "_r"):
            self.update()
        return jnp.stack(
            [self.radius * self._r, jnp.mod(self._theta, 2 * PI)], axis=1
        )


class StaticUniformCircle(_CircleBase):
    def _polar(self, key, dtype):
        indices = jnp.arange(self.sample_count, dtype=dtype) + 0.5
        r = jnp.sqrt(indices / self.sample_count)
        theta = GOLDEN_ANGLE * indices
        return r, theta


class RandomUniformCircle(_CircleBase):
    is_random = True

    def _polar(self, key, dtype):
        kr, kt = jax.random.split(_key(key))
        r = jnp.sqrt(jax.random.uniform(kr, (self.sample_count,), dtype=dtype))
        theta = self.theta_start + (self.theta_end - self.theta_start) \
            * jax.random.uniform(kt, (self.sample_count,), dtype=dtype)
        return r, theta


class _SphereBase(BasePointDistribution):
    """Points on a sphere cap opening toward +x (the source-aiming pole,
    distributions.py:1601-1723).  ranks = (phi, theta mod 2PI)."""

    def __init__(self, angular_size, sample_count, radius=1.0,
                 theta_start=0.0, theta_end=2 * PI):
        if not 0 < angular_size <= PI / 2:
            raise ValueError("angular_size must be in (0, PI/2]")
        if sample_count <= 0:
            raise ValueError("sample_count must be > 0")
        self.angular_size = angular_size
        self.sample_count = sample_count
        self.radius = radius
        self.theta_start = theta_start
        self.theta_end = theta_end

    def _angles(self, key, dtype):
        raise NotImplementedError

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        phi, theta = self._angles(key, dtype)
        # see _CircleBase.sample: random subclasses draw theta within the
        # window directly; only static spirals use the mod wrap
        if not self.is_random:
            theta = _theta_mod(theta, self.theta_start, self.theta_end)
        points = self.radius * jnp.stack(
            [jnp.cos(phi), jnp.sin(phi) * jnp.cos(theta),
             jnp.sin(phi) * jnp.sin(theta)],
            axis=1,
        )
        ranks = jnp.stack([phi, jnp.mod(theta, 2 * PI)], axis=1)
        return points, ranks


class StaticUniformSphere(_SphereBase):
    def _angles(self, key, dtype):
        indices = jnp.arange(self.sample_count, dtype=dtype) + 0.5
        cos_phi = jnp.linspace(1.0, math.cos(self.angular_size),
                               self.sample_count, dtype=dtype)
        return jnp.arccos(cos_phi), GOLDEN_ANGLE * indices


class RandomUniformSphere(_SphereBase):
    is_random = True

    def _angles(self, key, dtype):
        # azimuth is uniform over the theta WINDOW, not GOLDEN_ANGLE*uniform:
        # the reference draws theta = golden_angle * uniform (~[0, 10.17)
        # rad, distributions.py:1763-1766), which after mod 2*pi makes
        # azimuths in [0, 3.88) twice as likely as the rest -- and the same
        # wrap bias would hit any restricted [theta_start, theta_end) window.
        # The golden angle is only meaningful for *static* spirals.
        kp, kt = jax.random.split(_key(key))
        cos_phi = jax.random.uniform(
            kp, (self.sample_count,), dtype=dtype,
            minval=math.cos(self.angular_size), maxval=1.0,
        )
        theta = self.theta_start + (self.theta_end - self.theta_start) \
            * jax.random.uniform(kt, (self.sample_count,), dtype=dtype)
        return jnp.arccos(cos_phi), theta


class StaticLambertianSphere(_SphereBase):
    """cos-weighted cap: inverse CDF of cos(phi)sin(phi) dphi
    (distributions.py:1778-1810)."""

    def _angles(self, key, dtype):
        indices = jnp.arange(self.sample_count, dtype=dtype) + 0.5
        u = jnp.linspace(1.0, math.cos(self.angular_size) ** 2,
                         self.sample_count, dtype=dtype)
        return jnp.arccos(jnp.sqrt(u)), GOLDEN_ANGLE * indices


class RandomLambertianSphere(_SphereBase):
    is_random = True

    def _angles(self, key, dtype):
        kp, kt = jax.random.split(_key(key))
        u = jax.random.uniform(
            kp, (self.sample_count,), dtype=dtype,
            minval=math.cos(self.angular_size) ** 2, maxval=1.0,
        )
        # uniform azimuth; see RandomUniformSphere for the reference-bug note
        theta = self.theta_start + (self.theta_end - self.theta_start) \
            * jax.random.uniform(kt, (self.sample_count,), dtype=dtype)
        return jnp.arccos(jnp.sqrt(u)), theta


# ======================================================================
# transformations
# ======================================================================

def __getattr__(name):
    """Re-export the goal-building distributions (ArbitraryDistribution,
    ArbitraryBasePoints, ImageBasePoints, PrecompiledBasePoints,
    SquareRankLambertianSphere, CumulativeDensityFunction,
    flatten_distribution, transform_map) from models.goals, matching the
    reference's single distributions module layout."""
    from tensorflowraytrace_tpu.models import goals

    if hasattr(goals, name):
        return getattr(goals, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


class BasePointTransformation(BasePointDistribution):
    """Wrap a base-point distribution with scale -> rotate -> translate,
    applied in that order (distributions.py:2014-2119).  2D inputs can be
    lifted into 3D (placed in the y-z plane) via ``lift_to_3d``."""

    def __init__(self, distribution, scale=None, rotation=None, translation=None,
                 lift_to_3d=False):
        self.distribution = distribution
        self.scale = scale
        self.rotation = rotation  # quaternion (w,x,y,z) for 3D, angle for 2D
        self.translation = translation
        self.lift_to_3d = lift_to_3d
        self.is_random = distribution.is_random

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        points, ranks = self.distribution.sample(key, dtype)
        if self.lift_to_3d and points.shape[-1] == 2:
            zeros = jnp.zeros((points.shape[0], 1), dtype=points.dtype)
            points = jnp.concatenate([zeros, points], axis=1)
        if self.scale is not None:
            points = points * jnp.asarray(self.scale, dtype=points.dtype)
        if self.rotation is not None:
            if points.shape[-1] == 3:
                points = quat.rotate_vector(jnp.asarray(self.rotation, points.dtype),
                                            points)
            else:
                points = quat.rotate_2d(points, jnp.asarray(self.rotation,
                                                            points.dtype))
        if self.translation is not None:
            points = points + jnp.asarray(self.translation, dtype=points.dtype)
        return points, ranks
