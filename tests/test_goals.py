"""Goal machinery tests: CDF warps, matching, image points, precompiled caches."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu.models import goals
from tensorflowraytrace_tpu.models.rays import RaySet
from tensorflowraytrace_tpu.models.sources import PrecompiledSource

PI = math.pi
KEY = jax.random.PRNGKey(11)


def test_arbitrary_distribution_uniform_is_identityish():
    """A constant density must leave uniform samples (approximately) alone."""
    d = goals.ArbitraryDistribution(np.ones((64, 64)), ((0.0, 1.0), (0.0, 1.0)))
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, 5000)
    y = rng.uniform(0, 1, 5000)
    xo, yo = d(x, y)
    np.testing.assert_allclose(xo, x, atol=1e-6)
    np.testing.assert_allclose(yo, y, atol=1e-6)


def test_arbitrary_distribution_concentrates_mass():
    """A density concentrated on the right half puts ~all samples there."""
    density = np.zeros((32, 32))
    density[:, 16:] = 1.0
    density += 1e-9
    d = goals.ArbitraryDistribution(density, ((-1.0, 1.0), (-1.0, 1.0)))
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 4000)
    y = rng.uniform(-1, 1, 4000)
    xo, yo = d(x, y)
    assert (xo > -0.01).mean() > 0.999
    assert abs(yo.mean()) < 0.05


def test_arbitrary_distribution_gaussian_shape():
    """Warped uniform samples follow a Gaussian density's histogram."""
    f = lambda x, y: np.exp(-(x ** 2 + y ** 2) / 0.08)
    d = goals.ArbitraryDistribution(f, ((-1.0, 1.0, 128), (-1.0, 1.0, 128)))
    rng = np.random.default_rng(0)
    n = 40000
    xo, yo = d(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n))
    # standard deviation of the warped cloud ~ 0.2 (sigma of the gaussian)
    assert abs(np.std(xo) - 0.2) < 0.02
    assert abs(np.std(yo) - 0.2) < 0.02


def test_flatten_distribution_inverts_warp():
    """flatten(warp(uniform)) ~ uniform (the inverse pair of operations)."""
    f = lambda x, y: np.exp(-(x ** 2 + 0.5 * y ** 2) / 0.2)
    d = goals.ArbitraryDistribution(f, ((-1.0, 1.0, 64), (-1.0, 1.0, 64)))
    rng = np.random.default_rng(1)
    n = 30000
    xo, yo = d(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n))
    xf, yf = goals.flatten_distribution(xo, yo, ((-1, 1, 48), (-1, 1, 48)))
    # flattened output is in [0, 1]; its histogram should be uniform
    h, _ = np.histogram(xf, bins=10, range=(0, 1))
    assert h.std() / h.mean() < 0.1


def test_cdf_roundtrip():
    rng = np.random.default_rng(2)
    density = rng.uniform(0.5, 2.0, (16, 16))
    cdf = goals.CumulativeDensityFunction(((-2.0, 2.0), (-1.0, 1.0)), density)
    pts = rng.uniform(0.05, 0.95, (500, 2))
    mapped = cdf.cdf(pts)
    assert mapped[:, 0].min() >= -2.0 and mapped[:, 0].max() <= 2.0
    assert mapped[:, 1].min() >= -1.0 and mapped[:, 1].max() <= 1.0
    back = cdf.icdf(mapped)
    np.testing.assert_allclose(back, pts, atol=0.02)


def test_transform_map_hungarian_optimal():
    fixed = np.asarray([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]])
    mutable = np.asarray([[2.1, 0.0], [0.1, 0.0], [1.1, 0.0]])
    out = goals.transform_map(fixed, mutable)
    np.testing.assert_allclose(out, [[0.1, 0.0], [1.1, 0.0], [2.1, 0.0]])


def test_transform_map_greedy_runs():
    rng = np.random.default_rng(3)
    fixed = rng.normal(size=(20, 2))
    mutable = rng.normal(size=(20, 2))
    out = goals.transform_map_greedy(fixed, mutable)
    # a permutation of mutable
    a = np.asarray(sorted(map(tuple, out)))
    b = np.asarray(sorted(map(tuple, mutable)))
    np.testing.assert_allclose(a, b)


def test_arbitrary_base_points_with_goal():
    src_density = lambda x, y: np.exp(-(x ** 2 + y ** 2) / 0.1)
    goal_density = lambda x, y: ((np.abs(x) < 0.5) & (np.abs(y) < 0.5)).astype(
        float) + 1e-9
    bp = goals.ArbitraryBasePoints(
        goals.ArbitraryDistribution(src_density, ((-1, 1, 64), (-1, 1, 64))),
        2000,
        rank_distribution=goals.ArbitraryDistribution(
            goal_density, ((-1, 1, 64), (-1, 1, 64))),
    )
    points, ranks = bp.sample(KEY, dtype=jnp.float64)
    assert points.shape == (2000, 2)
    assert ranks.shape == (2000, 2)
    # etendue: mean radii match after rescaling
    pr = np.linalg.norm(np.asarray(points), axis=1).mean()
    rr = np.linalg.norm(np.asarray(ranks), axis=1).mean()
    np.testing.assert_allclose(pr, rr, rtol=0.1)


def test_image_base_points_density():
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:, 8:] = 200  # right half bright
    bp = goals.ImageBasePoints.from_array(img, x_size=2.0)
    points, _ = bp.sample(KEY, dtype=jnp.float64)
    p = np.asarray(points)
    assert p.shape[1] == 2
    # bright rows are the second image axis -> mapped to y in this sampler
    assert (p[:, 1] > 0).mean() > 0.95


def test_precompiled_base_points_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(500, 2))
    ranks = rng.normal(size=(500, 2))
    bp = goals.PrecompiledBasePoints()
    bp.full_points = pts
    bp.full_ranks = ranks
    path = str(tmp_path / "points.pkl")
    bp.save(path)

    loaded = goals.PrecompiledBasePoints(path, sample_count=64,
                                         perturbation=(0.01, 0.0))
    sample, sranks = loaded.sample(KEY, dtype=jnp.float64)
    assert sample.shape == (64, 2)
    assert sranks.shape == (64, 2)
    # y coordinates are unperturbed -> every sampled y exists in the cache
    assert np.isin(np.round(np.asarray(sample)[:, 1], 12),
                   np.round(pts[:, 1], 12)).all()


def test_square_rank_lambertian_sphere():
    d = goals.SquareRankLambertianSphere(5000, angular_cutoff=PI / 2)
    points, ranks = d.sample(KEY, dtype=jnp.float64)
    p = np.asarray(points)
    np.testing.assert_allclose(np.linalg.norm(p, axis=1), 1.0, atol=1e-9)
    assert ranks.shape == (5000, 2)
    # lambertian: projection along the pole is a uniform disk
    r = np.linalg.norm(p[:, 1:], axis=1)
    np.testing.assert_allclose(r.mean(), 2 / 3, rtol=0.05)


def test_precompiled_source_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    rays = RaySet.make(rng.normal(size=(200, 3)), rng.normal(size=(200, 3)),
                       wavelength=rng.uniform(400, 700, 200),
                       fields={"rank": jnp.asarray(rng.normal(size=(200, 2)))},
                       dtype=jnp.float64)
    src = PrecompiledSource(3, rays, sample_count=32,
                            start_perturbation=0.01)
    path = str(tmp_path / "source.pkl")
    src.save(path)
    loaded = PrecompiledSource(3, path, sample_count=32)
    out = loaded.sample(KEY, dtype=jnp.float64)
    assert out.n_rays == 32
    assert "rank" in out.fields
    # downsampled wavelengths all come from the cache
    assert np.isin(np.round(np.asarray(out.wavelength), 10),
                   np.round(np.asarray(rays.wavelength), 10)).all()
