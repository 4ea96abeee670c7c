"""Analysis module tests: histograms, imaging test, distribution differential."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import analysis

F64 = jnp.float64


def test_histogram2d_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, 5000)
    y = rng.uniform(-2, 2, 5000)
    h = analysis.histogram2d(jnp.asarray(x), jnp.asarray(y),
                             ((-1, 1), (-2, 2)), x_bins=16, y_bins=8)
    h_np, _, _ = np.histogram2d(y, x, bins=(8, 16), range=((-2, 2), (-1, 1)))
    np.testing.assert_allclose(np.asarray(h), h_np)


def test_histogram2d_clamps_out_of_range():
    h = analysis.histogram2d(jnp.asarray([-5.0, 5.0]), jnp.asarray([0.0, 0.0]),
                             ((-1, 1), (-1, 1)), x_bins=4, y_bins=4)
    assert float(h[2, 0]) == 1.0  # clamped into left edge bin
    assert float(h[2, 3]) == 1.0  # clamped into right edge bin


def test_soft_histogram_conserves_mass_and_differentiates():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, 300), F64)
    y = jnp.asarray(rng.uniform(-0.9, 0.9, 300), F64)
    h = analysis.soft_histogram2d(x, y, ((-1, 1), (-1, 1)), x_bins=8)
    np.testing.assert_allclose(float(jnp.sum(h)), 300.0, rtol=1e-12)

    def f(x):
        h = analysis.soft_histogram2d(x, y, ((-1, 1), (-1, 1)), x_bins=8)
        return jnp.sum(h[:, :4])  # mass in the left half

    g = jax.grad(f)(x)
    assert np.any(np.asarray(g) != 0)
    assert np.all(np.isfinite(np.asarray(g)))


def test_inner_product_normalized():
    a = np.ones((4, 4))
    assert analysis.inner_product(a, a) == 1.0
    b = np.zeros((4, 4))
    b[0, 0] = 1.0
    assert 0 < analysis.inner_product(a, b) < 1.0


def test_imaging_test_batches():
    rng = np.random.default_rng(2)

    def get_samples():
        return rng.normal(0, 0.3, (100, 2))

    h, xe, ye, img = analysis.imaging_test(
        get_samples, ((-1, 1), (-1, 1)), batch_count=5, bins=16,
        verbose=False, display=False)
    assert h.shape == (16, 16)
    assert h.sum() > 400  # most of the 500 points are in range
    assert img is None


def test_distribution_differential_prefers_matching_cloud():
    goal = lambda x, y: np.exp(-(x ** 2 + y ** 2) / 0.1)
    dd = analysis.DistributionDifferential(goal, ((-1.0, 1.0), (-1.0, 1.0)),
                                           x_bins=16)
    rng = np.random.default_rng(3)
    matching = rng.normal(0, 0.22, (4000, 2)).clip(-0.99, 0.99)
    uniform = rng.uniform(-1, 1, (4000, 2))
    q_match = float(dd(jnp.asarray(matching[:, 0]), jnp.asarray(matching[:, 1])))
    q_unif = float(dd(jnp.asarray(uniform[:, 0]), jnp.asarray(uniform[:, 1])))
    assert q_match < q_unif


def test_distribution_differential_oob_penalty():
    goal = np.ones((8, 8))
    pen = lambda d: 10.0 * d * d
    dd = analysis.DistributionDifferential(goal, ((-1.0, 1.0), (-1.0, 1.0)),
                                           oob_penalty=pen)
    inside = jnp.asarray(np.random.default_rng(4).uniform(-0.9, 0.9, (100,)))
    q_in = float(dd(inside, inside))
    outside = jnp.concatenate([inside, jnp.asarray([5.0, -5.0])])
    q_out = float(dd(outside, outside))
    assert q_out > q_in


def test_distribution_differential_soft_gradient():
    goal = lambda x, y: np.exp(-(x ** 2 + y ** 2) / 0.1)
    dd = analysis.DistributionDifferential(goal, ((-1.0, 1.0), (-1.0, 1.0)),
                                           x_bins=8, soft=True)

    def f(shift):
        rng_pts = jnp.asarray(
            np.random.default_rng(5).normal(0, 0.3, (500, 2)), F64)
        pts = rng_pts + shift
        return dd(pts[:, 0], pts[:, 1])

    g = float(jax.grad(f)(jnp.asarray(0.3, F64)))
    assert np.isfinite(g) and g != 0.0


def test_imaging_test_weighted_samples():
    """weighted=True uses the third column as per-ray weights (radiometric
    image, e.g. Fresnel intensity); without the flag extra columns are
    ignored rather than silently reinterpreted."""
    import pytest

    from tensorflowraytrace_tpu.analysis import imaging_test

    pts = np.asarray([[0.5, 0.5, 2.0], [0.5, 0.5, 1.0], [-0.5, -0.5, 0.25]])
    h, xe, ye, _ = imaging_test(lambda: pts, ((-1, 1), (-1, 1)),
                                batch_count=1, bins=2, verbose=False,
                                weighted=True)
    np.testing.assert_allclose(h[1, 1], 3.0)   # two rays, weights 2 + 1
    np.testing.assert_allclose(h[0, 0], 0.25)

    # unweighted: column 2 (an x/y/z landing point, say) is just ignored
    h, *_ = imaging_test(lambda: pts, ((-1, 1), (-1, 1)),
                         batch_count=1, bins=2, verbose=False)
    np.testing.assert_allclose(h[1, 1], 2.0)
    np.testing.assert_allclose(h[0, 0], 1.0)

    # weighted=True on too-narrow samples fails loudly
    with pytest.raises(ValueError):
        imaging_test(lambda: pts[:, :2], ((-1, 1), (-1, 1)),
                     batch_count=1, bins=2, verbose=False, weighted=True)


# ----------------------------------------------------------------------
# Zernike wavefront decomposition
# ----------------------------------------------------------------------

def test_noll_index_table():
    """The first 15 Noll indices match the published table (Noll 1976)."""
    from tensorflowraytrace_tpu.analysis import _noll_indices

    table = {1: (0, 0), 2: (1, 1), 3: (1, -1), 4: (2, 0), 5: (2, -2),
             6: (2, 2), 7: (3, -1), 8: (3, 1), 9: (3, -3), 10: (3, 3),
             11: (4, 0), 12: (4, 2), 13: (4, -2), 14: (4, 4), 15: (4, -4)}
    for j, nm in table.items():
        assert _noll_indices(j) == nm, j


def test_zernike_orthonormal_on_disk():
    """Noll-normalized Zernikes are orthonormal over the unit disk
    (mid-radius polar quadrature to ~1e-4)."""
    from tensorflowraytrace_tpu.analysis import zernike_basis

    nr, nt = 400, 512
    r_edges = np.linspace(0, 1, nr + 1)
    r = np.sqrt((r_edges[:-1] ** 2 + r_edges[1:] ** 2) / 2)
    t = np.linspace(0, 2 * np.pi, nt, endpoint=False)
    R, T = np.meshgrid(r, t)
    w = (R / nr * (2 * np.pi / nt) / np.pi).ravel()
    B = np.asarray(zernike_basis(jnp.asarray(R.ravel()),
                                 jnp.asarray(T.ravel()), 15))
    gram = (B * w[:, None]).T @ B
    np.testing.assert_allclose(gram, np.eye(15), atol=2e-4)


def test_zernike_fit_recovers_synthetic_aberrations():
    """An exact 0.3 Z4 + 0.1 Z11 wavefront is recovered to machine
    precision with zero residual; pure rho^2 defocus decomposes into the
    analytic piston + Z4 split (c4 = a / (2 sqrt 3), c1 = a / 2)."""
    from tensorflowraytrace_tpu.analysis import zernike_basis, zernike_fit

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (4000, 2))
    pts = pts[np.hypot(pts[:, 0], pts[:, 1]) <= 1.0]
    rho = np.hypot(pts[:, 0], pts[:, 1])
    th = np.arctan2(pts[:, 1], pts[:, 0])
    B = np.asarray(zernike_basis(jnp.asarray(rho), jnp.asarray(th), 15))

    opd = 0.3 * B[:, 3] + 0.1 * B[:, 10]
    c, res = zernike_fit(jnp.asarray(pts), jnp.asarray(opd), 15,
                         pupil_radius=1.0, center=(0.0, 0.0))
    np.testing.assert_allclose(float(c[3]), 0.3, rtol=1e-12)
    np.testing.assert_allclose(float(c[10]), 0.1, rtol=1e-12)
    assert float(res) < 1e-12

    a = 0.7
    c, res = zernike_fit(jnp.asarray(pts), jnp.asarray(a * rho ** 2), 15,
                         pupil_radius=1.0, center=(0.0, 0.0))
    np.testing.assert_allclose(float(c[0]), a / 2, rtol=1e-10)
    np.testing.assert_allclose(float(c[3]), a / (2 * np.sqrt(3)),
                               rtol=1e-10)
    assert float(res) < 1e-12


def test_zernike_fit_differentiable():
    """d(coma coefficient)/d(wavefront knob) is finite: Zernike terms can
    be optimization penalties ('null the coma')."""
    from tensorflowraytrace_tpu.analysis import zernike_basis, zernike_fit

    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (500, 2))
    pts = pts[np.hypot(pts[:, 0], pts[:, 1]) <= 1.0]
    rho = jnp.asarray(np.hypot(pts[:, 0], pts[:, 1]))
    th = jnp.asarray(np.arctan2(pts[:, 1], pts[:, 0]))
    B = zernike_basis(rho, th, 15)

    def coma(knob):
        opd = knob * B[:, 7]  # Z8: primary coma (cos)
        c, _ = zernike_fit(jnp.asarray(pts), opd, 15, pupil_radius=1.0,
                           center=(0.0, 0.0))
        return c[7]

    g = float(jax.grad(coma)(jnp.asarray(0.2, jnp.float64)))
    np.testing.assert_allclose(g, 1.0, rtol=1e-10)
