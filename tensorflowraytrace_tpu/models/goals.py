"""Goal-building machinery: arbitrary-density sampling, CDF warps,
distribution matching, image-driven points, and precompiled point caches.

Reference counterpart: the back half of /root/reference/tfrt/distributions.py
(the "expensive-goal workflow" of SURVEY.md section 3.4: build goal points
offline, match them to source points, cache to disk, downsample per step).
All of this is host-side NumPy/SciPy by design, exactly as in the reference
(distributions.py:2656-2658: "written in numpy, not TF ... you will not be
able to get a gradient through them, but why would you ever even need
that?") -- it runs once at problem-setup time.

Parity map:
  ArbitraryDistribution       <- distributions.py:2123  (inverse-CDF warp of
                                 uniform points to an arbitrary 2D density)
  flatten_distribution        <- distributions.py:2283  (the inverse: warp an
                                 arbitrary point cloud to uniform)
  CumulativeDensityFunction   <- distributions.py:2372  (accumulate/compute/
                                 cdf/icdf)
  ArbitraryBasePoints         <- distributions.py:2635  (daisy-chained source
                                 + goal densities sharing one uniform seed,
                                 with etendue rescaling)
  transform_map               <- distributions.py:2860  (Hungarian assignment)
  transform_map_greedy        <- distributions.py:2804  (legacy greedy)
  ImageBasePoints             <- distributions.py:2906  (thresholded image ->
                                 point density)
  PrecompiledBasePoints       <- distributions.py:3006  (pickle cache +
                                 per-step random downsample + perturbation)

Array convention: densities are (Y, X) with y on axis 0 (image orientation);
the reference is internally inconsistent about this (see the comment block at
distributions.py:2311-2322) -- this rebuild picks one convention and keeps it.
"""

from __future__ import annotations

import math
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu.config import resolve_dtype
from tensorflowraytrace_tpu.models.distributions import BasePointDistribution

PI = math.pi


def _np_rng(key):
    """Derive a NumPy RNG from a jax PRNG key (host-side samplers)."""
    if key is None:
        return np.random.default_rng(0)
    data = np.asarray(jax.random.key_data(key)).reshape(-1)
    return np.random.default_rng([int(x) for x in data])


def _load_density(density_function, evaluation_limits):
    """Resolve the density argument: (Y, X) array, callable(x, y), or an
    image filename (distributions.py:2147-2211)."""
    if isinstance(density_function, str):
        import imageio.v2 as imageio

        x_min, x_max = evaluation_limits[0][:2]
        y_min, y_max = evaluation_limits[1][:2]
        density = np.asarray(imageio.imread(density_function, as_gray=True),
                             dtype=np.float64)
    elif callable(density_function):
        x_min, x_max, x_count = evaluation_limits[0]
        y_min, y_max, y_count = evaluation_limits[1]
        gx = np.linspace(x_min, x_max, x_count)
        gy = np.linspace(y_min, y_max, y_count)
        gxx, gyy = np.meshgrid(gx, gy)
        density = np.asarray(density_function(gxx, gyy), dtype=np.float64)
    else:
        density = np.asarray(density_function, dtype=np.float64)
        if density.ndim != 2:
            raise ValueError("density function must be 2D")
        x_min, x_max = evaluation_limits[0][:2]
        y_min, y_max = evaluation_limits[1][:2]
    if np.any(density < 0):
        raise ValueError("density function must be non-negative")
    return density, (x_min, x_max), (y_min, y_max)


class ArbitraryDistribution:
    """Warp uniformly-sampled points so they follow an arbitrary 2D density.

    Calling convention matches the reference (distributions.py:2123-2279):
    ``dist(x, y)`` takes uniform samples over the evaluation domain and
    returns samples of the density, same shapes.  The warp factorizes as
    marginal-in-x then conditional-y-given-x, each applied by inverse CDF.
    """

    def __init__(self, density_function, evaluation_limits):
        density, (self.x_min, self.x_max), (self.y_min, self.y_max) = \
            _load_density(density_function, evaluation_limits)
        self.density_function = density
        y_count, x_count = density.shape
        self.x_count = x_count
        self.y_count = y_count

        col_mass = density.sum(axis=0)  # (X,) marginal in x
        if np.any(density.sum(axis=0) <= 0):
            raise ValueError(
                "Discovered a slice where the density is zero; the quantile "
                "function would need infinite slope.  Restrict the domain or "
                "add a small constant to the density."
            )
        # cumulative marginal, 0..1, on the x bin edges
        self._cum_x = np.concatenate([[0.0], np.cumsum(col_mass)])
        self._cum_x /= self._cum_x[-1]
        self._x_edges = np.linspace(self.x_min, self.x_max, x_count + 1)

        # per-column cumulative in y, 0..1, on the y bin edges
        cum_y = np.concatenate(
            [np.zeros((1, x_count)), np.cumsum(density, axis=0)], axis=0)
        cum_y /= cum_y[-1:]
        self._cum_y = cum_y  # (Y+1, X)
        self._y_edges = np.linspace(self.y_min, self.y_max, y_count + 1)

    def __call__(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        u = (x - self.x_min) / (self.x_max - self.x_min)
        v = (y - self.y_min) / (self.y_max - self.y_min)
        u = np.clip(u, 0.0, 1.0)
        v = np.clip(v, 0.0, 1.0)

        # inverse marginal CDF: u -> x
        x_out = np.interp(u, self._cum_x, self._x_edges)

        # column selection, then inverse conditional CDF: v -> y
        col = np.clip(
            np.floor((x_out - self.x_min) / (self.x_max - self.x_min)
                     * self.x_count).astype(int),
            0, self.x_count - 1)
        y_out = np.empty_like(y)
        for j in np.unique(col):
            mask = col == j
            y_out[mask] = np.interp(v[mask], self._cum_y[:, j], self._y_edges)
        return x_out, y_out


def flatten_distribution(x, y, evaluation_limits):
    """Warp an arbitrarily-distributed point cloud to uniform: histogram the
    cloud, build its CDF, apply it (distributions.py:2283-2368).  Outputs lie
    in [0, 1] x [0, 1]."""
    x_min, x_max, x_res = evaluation_limits[0]
    y_min, y_max, y_res = evaluation_limits[1]
    x = np.clip(np.asarray(x, dtype=np.float64), x_min, x_max)
    y = np.clip(np.asarray(y, dtype=np.float64), y_min, y_max)

    density, _, _ = np.histogram2d(
        x, y, bins=(x_res, y_res), range=((x_min, x_max), (y_min, y_max)))
    density = density.T + 1e-12  # (Y, X); epsilon keeps columns non-degenerate

    cum_x = np.concatenate([[0.0], np.cumsum(density.sum(axis=0))])
    cum_x /= cum_x[-1]
    x_edges = np.linspace(x_min, x_max, x_res + 1)
    cum_y = np.concatenate([np.zeros((1, x_res)), np.cumsum(density, axis=0)],
                           axis=0)
    cum_y /= cum_y[-1:]
    y_edges = np.linspace(y_min, y_max, y_res + 1)

    x_out = np.interp(x, x_edges, cum_x)
    col = np.clip(np.floor((x - x_min) / (x_max - x_min) * x_res).astype(int),
                  0, x_res - 1)
    y_out = np.empty_like(y)
    for j in np.unique(col):
        mask = col == j
        y_out[mask] = np.interp(y[mask], y_edges, cum_y[:, j])
    return x_out, y_out


class CumulativeDensityFunction:
    """Accumulating 2D CDF with forward (uniform -> density) and inverse
    (density -> uniform) evaluation (distributions.py:2372-2631).

    Density batches are accumulated with ``accumulate_density`` (e.g. from
    histograms of traced rays), ``compute`` builds the interpolants, and
    ``cdf``/``icdf`` map (n, 2) point sets.  Factorization: marginal in y
    first, then x conditional on y (the reference's order).
    """

    def __init__(self, eval_limits, density=None, direction="both"):
        self.x_min, self.x_max = eval_limits[0]
        self.y_min, self.y_max = eval_limits[1]
        self.x_res = 10
        self.y_res = 10
        self._density = None
        self._ready_fwd = False
        self._ready_inv = False
        if density is not None:
            self.compute(density, direction)

    def accumulate_density(self, density):
        density = np.asarray(density, dtype=np.float64)
        if self._density is None:
            self._density = density.copy()
            self.y_res, self.x_res = density.shape
        else:
            self._density += density

    def clear_density(self):
        self._density = None

    def compute(self, density=None, direction="both", epsilon=1e-10):
        if density is not None:
            self.clear_density()
            self.accumulate_density(density)
        if self._density is None:
            raise RuntimeError("compute called before accumulating density")
        if direction not in ("forward", "inverse", "both"):
            raise ValueError("direction must be 'forward', 'inverse' or 'both'")

        d = self._density + epsilon  # (Y, X)
        # marginal in y
        cum_y = np.concatenate([[0.0], np.cumsum(d.sum(axis=1))])
        cum_y /= cum_y[-1]
        # conditional x per y row
        cum_x = np.concatenate([np.zeros((self.y_res, 1)),
                                np.cumsum(d, axis=1)], axis=1)  # (Y, X+1)
        cum_x /= cum_x[:, -1:]

        self._cum_y = cum_y
        self._cum_x = cum_x
        self._x_edges = np.linspace(self.x_min, self.x_max, self.x_res + 1)
        self._y_edges = np.linspace(self.y_min, self.y_max, self.y_res + 1)
        self._ready_fwd = direction in ("forward", "both")
        self._ready_inv = direction in ("inverse", "both")

    def _rows_for(self, y_out):
        return np.clip(
            np.floor((y_out - self.y_min) / (self.y_max - self.y_min)
                     * self.y_res).astype(int),
            0, self.y_res - 1)

    def cdf(self, points):
        """Map uniform (0,1)^2 points onto the density's domain."""
        if not self._ready_fwd:
            raise RuntimeError("compute(direction='forward'|'both') first")
        points = np.asarray(points, dtype=np.float64)
        u = np.clip(points[:, 0], 0.0, 1.0)
        v = np.clip(points[:, 1], 0.0, 1.0)
        y_out = np.interp(v, self._cum_y, self._y_edges)
        rows = self._rows_for(y_out)
        x_out = np.empty_like(u)
        for i in np.unique(rows):
            mask = rows == i
            x_out[mask] = np.interp(u[mask], self._cum_x[i], self._x_edges)
        return np.column_stack([x_out, y_out])

    def icdf(self, points):
        """Map points on the density's domain onto uniform (0,1)^2."""
        if not self._ready_inv:
            raise RuntimeError("compute(direction='inverse'|'both') first")
        points = np.asarray(points, dtype=np.float64)
        x = np.clip(points[:, 0], self.x_min, self.x_max)
        y = np.clip(points[:, 1], self.y_min, self.y_max)
        v_out = np.interp(y, self._y_edges, self._cum_y)
        rows = self._rows_for(y)
        u_out = np.empty_like(x)
        for i in np.unique(rows):
            mask = rows == i
            u_out[mask] = np.interp(x[mask], self._x_edges, self._cum_x[i])
        return np.column_stack([u_out, v_out])

    def __call__(self, points):
        return self.cdf(points)


class ArbitraryBasePoints(BasePointDistribution):
    """Base points from an arbitrary density, with an optional daisy-chained
    *goal* density sharing the same uniform seed -> ranks ARE the goal
    landing points (distributions.py:2635-2798).  ``enforce_etendue``
    rescales the ranks so the goal's mean radius matches the source's."""

    is_random = True

    def __init__(self, base_point_distribution: ArbitraryDistribution,
                 sample_count, rank_distribution=None, conserve_etendue=True,
                 etendue_origin=(0.0, 0.0)):
        if sample_count <= 0:
            raise ValueError("sample_count must be > 0")
        self.base_point_distribution = base_point_distribution
        self.rank_distribution = rank_distribution
        self.sample_count = sample_count
        self.rank_scale_factor = 1.0
        if conserve_etendue and rank_distribution is not None:
            self.enforce_etendue(etendue_origin)

    def _raw_sample(self, rng):
        b = self.base_point_distribution
        x = rng.uniform(b.x_min, b.x_max, self.sample_count)
        y = rng.uniform(b.y_min, b.y_max, self.sample_count)
        points = np.stack(b(x, y), axis=1)
        ranks = None
        if self.rank_distribution is not None:
            ranks = np.stack(self.rank_distribution(x, y), axis=1)
        return points, ranks

    def enforce_etendue(self, origin=(0.0, 0.0)):
        rng = np.random.default_rng(0)
        points, ranks = self._raw_sample(rng)
        origin = np.asarray(origin, dtype=np.float64)
        base_e = np.mean(np.linalg.norm(points - origin, axis=1))
        rank_e = np.mean(np.linalg.norm(ranks - origin, axis=1))
        self.rank_scale_factor = float(base_e / rank_e)

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        points, ranks = self._raw_sample(_np_rng(key))
        points = jnp.asarray(points, dtype=dtype)
        if ranks is not None:
            ranks = jnp.asarray(ranks * self.rank_scale_factor, dtype=dtype)
        return points, ranks


def transform_map(fixed, mutable):
    """Optimal assignment of goal points to source points: reorder
    ``mutable`` to minimize total distance to ``fixed`` (Hungarian method,
    distributions.py:2860-2902).  O(n^3), offline."""
    from scipy.optimize import linear_sum_assignment

    fixed = np.asarray(fixed)
    mutable = np.asarray(mutable)
    if fixed.shape != mutable.shape:
        raise ValueError("transform_map: inputs must have the same shape")
    distance = np.linalg.norm(fixed[:, None, :] - mutable[None, :, :], axis=2)
    fixed_idx, mutable_idx = linear_sum_assignment(distance)
    out = np.empty_like(mutable)
    out[fixed_idx] = mutable[mutable_idx]
    return out


def transform_map_greedy(fixed, mutable, origin=None, furthest_first=True):
    """Legacy greedy matcher (distributions.py:2804-2858): assign each fixed
    point (farthest from origin first) its nearest unused mutable point."""
    fixed = np.asarray(fixed)
    mutable = np.asarray(mutable)
    if fixed.shape != mutable.shape:
        raise ValueError("transform_map: inputs must have the same shape")
    if origin is None:
        origin = np.zeros(fixed.shape[1])
    order = np.argsort(np.linalg.norm(fixed - origin, axis=1))
    if furthest_first:
        order = order[::-1]
    out = np.zeros_like(mutable)
    used = np.zeros(mutable.shape[0], dtype=bool)
    for i in order:
        d = np.linalg.norm(fixed[i] - mutable, axis=1)
        d[used] = np.inf
        j = int(np.argmin(d))
        used[j] = True
        out[i] = mutable[j]
    return out


class ImageBasePoints(BasePointDistribution):
    """Random points whose density follows a thresholded greyscale image
    (distributions.py:2906-3002): each pixel spawns points proportional to
    its grey level."""

    is_random = True

    def __init__(self, filename, x_size, y_size=None):
        import imageio.v2 as imageio

        if x_size <= 0:
            raise ValueError("x_size must be > 0")
        self.x_size = float(x_size)
        self.y_size = float(y_size or x_size)
        raw = np.asarray(imageio.imread(filename, as_gray=True))
        self._init_from_array(raw)

    @classmethod
    def from_array(cls, image, x_size, y_size=None):
        self = cls.__new__(cls)
        self.x_size = float(x_size)
        self.y_size = float(y_size or x_size)
        self._init_from_array(np.asarray(image))
        return self

    def _init_from_array(self, raw):
        self.x_res, self.y_res = raw.shape
        unique, inverse = np.unique(raw, return_inverse=True)
        self.grey_levels = len(unique)
        self._image = np.arange(self.grey_levels)[inverse].reshape(raw.shape)

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        rng = _np_rng(key)
        x_edges = np.linspace(-self.x_size / 2, self.x_size / 2, self.x_res + 1)
        y_edges = np.linspace(-self.y_size / 2, self.y_size / 2, self.y_res + 1)
        counts = self._image
        # vectorized: each pixel (i, j) spawns counts[i, j] uniform points
        ii, jj = np.nonzero(counts)
        reps = counts[ii, jj]
        xi = np.repeat(ii, reps)
        yi = np.repeat(jj, reps)
        u = rng.uniform(size=xi.shape[0])
        v = rng.uniform(size=xi.shape[0])
        x = x_edges[xi] + u * (x_edges[xi + 1] - x_edges[xi])
        y = y_edges[yi] + v * (y_edges[yi + 1] - y_edges[yi])
        points = jnp.asarray(np.stack([x, y], axis=1), dtype=dtype)
        return points, None


class PrecompiledBasePoints(BasePointDistribution):
    """A cached point set with per-sample random downsampling (with
    replacement) and optional Gaussian perturbation
    (distributions.py:3006-3177).  ``sample(key)`` is jit-traceable."""

    is_random = True

    def __init__(self, arg=None, sample_count=100, do_downsample=True,
                 perturbation=None):
        if isinstance(arg, str):
            with open(arg, "rb") as f:
                data = pickle.load(f)
            self.full_points = (None if data["points"] is None
                                else np.asarray(data["points"]))
            self.full_ranks = (None if data["ranks"] is None
                               else np.asarray(data["ranks"]))
        elif arg is None:
            self.full_points = None
            self.full_ranks = None
        else:
            pts, ranks = (arg.sample(jax.random.PRNGKey(0))
                          if hasattr(arg, "sample") else (arg.points, arg.ranks))
            self.full_points = np.asarray(pts)
            self.full_ranks = None if ranks is None else np.asarray(ranks)
        self.sample_count = sample_count
        self.do_downsample = do_downsample
        self.perturbation = perturbation

    def save(self, filename):
        with open(filename, "wb") as f:
            pickle.dump({"points": self.full_points, "ranks": self.full_ranks},
                        f, pickle.HIGHEST_PROTOCOL)

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        if self.full_points is None:
            raise ValueError("PrecompiledBasePoints: no points loaded")
        points = jnp.asarray(self.full_points, dtype=dtype)
        ranks = (None if self.full_ranks is None
                 else jnp.asarray(self.full_ranks, dtype=dtype))
        if key is None:
            key = jax.random.PRNGKey(0)
        k_idx, k_pert = jax.random.split(key)
        if self.do_downsample:
            idx = jax.random.randint(k_idx, (self.sample_count,), 0,
                                     points.shape[0])
            points = jnp.take(points, idx, axis=0)
            if ranks is not None:
                ranks = jnp.take(ranks, idx, axis=0)
        if self.perturbation is not None:
            dev = jnp.broadcast_to(jnp.asarray(self.perturbation, dtype=dtype),
                                   (points.shape[1],))
            noise = jax.random.normal(k_pert, points.shape, dtype=dtype) * dev
            points = points + noise
        return points, ranks


class SquareRankLambertianSphere(BasePointDistribution):
    """Lambertian-sphere directions with a *square* rank: uniform square seed
    -> circle (via ArbitraryDistribution CDF) -> spherical projection =
    Lambertian automatically (distributions.py:1853-2010).  For LED modeling
    with square goals."""

    is_random = True

    def __init__(self, sample_count, angular_cutoff=PI / 2.0,
                 sampling_resolution=256):
        if sample_count <= 0:
            raise ValueError("sample_count must be > 0")
        if not 0 <= angular_cutoff <= PI / 2:
            raise ValueError("angular_cutoff must be in [0, PI/2]")
        self.sample_count = int(sample_count)
        self.angular_cutoff = angular_cutoff
        cutoff = math.sin(angular_cutoff)

        def density(x, y):
            return (np.sqrt(x * x + y * y) < cutoff).astype(np.float64) + 1e-10

        self._circle_maker = ArbitraryDistribution(
            density,
            ((-1.0, 1.0, sampling_resolution), (-1.0, 1.0, sampling_resolution)),
        )

    def sample(self, key=None, dtype=None):
        dtype = resolve_dtype(dtype)
        rng = _np_rng(key)
        ranks = rng.uniform(-1.0, 1.0, (self.sample_count, 2))
        cx, cy = self._circle_maker(ranks[:, 0], ranks[:, 1])
        theta = np.arctan2(cy, cx)
        rad2 = cx * cx + cy * cy
        z = np.sqrt(np.clip(1.0 - rad2, 0.0, 1.0))
        phi = np.arctan2(np.sqrt(rad2), z)
        # source aiming convention: the pole points along +x
        points = np.stack(
            [np.cos(phi), np.sin(phi) * np.cos(theta),
             np.sin(phi) * np.sin(theta)], axis=1)
        return (jnp.asarray(points, dtype=dtype),
                jnp.asarray(ranks, dtype=dtype))
