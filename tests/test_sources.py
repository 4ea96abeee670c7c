"""Source & distribution tests (reference test style: tests/sources/* but
against the rebuilt functional API, plus statistical checks the reference
lacked)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu.models import distributions as dist
from tensorflowraytrace_tpu.models import sources as src

PI = math.pi
F64 = jnp.float64
KEY = jax.random.PRNGKey(7)


# ----------------------------------------------------------------------
# distributions
# ----------------------------------------------------------------------

def test_static_uniform_angles_and_ranks():
    d = dist.StaticUniformAngularDistribution(-PI / 4, PI / 2, 5)
    angles, ranks = d.sample(dtype=F64)
    np.testing.assert_allclose(np.asarray(angles),
                               np.linspace(-PI / 4, PI / 2, 5), atol=1e-12)
    # ranks normalized by the most extreme limit (PI/2)
    np.testing.assert_allclose(np.asarray(ranks),
                               np.asarray(angles) / (PI / 2), atol=1e-12)


def test_random_uniform_angles_bounds():
    d = dist.RandomUniformAngularDistribution(-0.5, 0.5, 1000)
    angles, _ = d.sample(KEY, dtype=F64)
    a = np.asarray(angles)
    assert a.min() >= -0.5 and a.max() <= 0.5
    assert abs(a.mean()) < 0.05


def test_lambertian_angles_cosine_weighted():
    """Static Lambertian: ranks (= sin angle) must be uniform."""
    d = dist.StaticLambertianAngularDistribution(-PI / 3, PI / 3, 101)
    angles, ranks = d.sample(dtype=F64)
    np.testing.assert_allclose(np.asarray(ranks), np.sin(np.asarray(angles)),
                               atol=1e-12)
    diffs = np.diff(np.asarray(ranks))
    np.testing.assert_allclose(diffs, diffs[0], atol=1e-12)


@pytest.mark.parametrize("bad", [(-4.0, 1.0, 5), (0.5, -0.5, 5), (0.0, 1.0, 0)])
def test_angular_validation(bad):
    with pytest.raises(ValueError):
        dist.StaticUniformAngularDistribution(*bad)


def test_beam_points_span_width():
    d = dist.StaticUniformBeam(-1.0, 2.0, 7, central_angle=0.0)
    points, ranks = d.sample(dtype=F64)
    p = np.asarray(points)
    # beam perpendicular to central angle 0 -> points along y
    np.testing.assert_allclose(p[:, 0], 0.0, atol=1e-12)
    assert p[:, 1].min() == pytest.approx(-1.0)
    assert p[:, 1].max() == pytest.approx(2.0)
    # rank 0 at origin, |rank| 1 at far edge
    assert np.abs(np.asarray(ranks)).max() == pytest.approx(1.0)


def test_aperature_points_interpolate():
    d = dist.StaticUniformAperaturePoints((0.0, 0.0), (2.0, 4.0), 5)
    points, ranks = d.sample(dtype=F64)
    np.testing.assert_allclose(np.asarray(points)[-1], [2.0, 4.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(ranks), np.linspace(0, 1, 5), atol=1e-12)


def test_square_grid():
    d = dist.StaticUniformSquare(1.0, 3, y_size=2.0, y_res=5)
    points, ranks = d.sample(dtype=F64)
    assert points.shape == (15, 2)
    assert float(jnp.max(jnp.abs(points[:, 0]))) == pytest.approx(1.0)
    assert float(jnp.max(jnp.abs(points[:, 1]))) == pytest.approx(2.0)
    # rank normalized by the longest half-side
    np.testing.assert_allclose(np.asarray(ranks),
                               np.asarray(points) / 2.0, atol=1e-12)


def test_circle_golden_spiral_uniformity():
    d = dist.StaticUniformCircle(4000, radius=2.0)
    points, _ = d.sample(dtype=F64)
    r = np.linalg.norm(np.asarray(points), axis=1)
    assert r.max() <= 2.0 + 1e-9
    # uniform disk: mean r = 2/3 * R
    np.testing.assert_allclose(r.mean(), 2.0 * 2 / 3, rtol=0.01)


def test_sphere_cap_extent():
    d = dist.StaticUniformSphere(PI / 4, 500, radius=1.0)
    points, ranks = d.sample(dtype=F64)
    p = np.asarray(points)
    np.testing.assert_allclose(np.linalg.norm(p, axis=1), 1.0, atol=1e-9)
    # cap opens toward +x with angular size PI/4
    assert p[:, 0].min() >= math.cos(PI / 4) - 1e-9
    phi = np.asarray(ranks)[:, 0]
    assert phi.max() <= PI / 4 + 1e-9


def test_lambertian_sphere_projection_is_uniform_disk():
    """The Lambertian sphere projected along x is a uniform disk
    (distributions.py:1785-1791)."""
    d = dist.RandomLambertianSphere(PI / 2, 20000)
    points, _ = d.sample(KEY, dtype=F64)
    yz = np.asarray(points)[:, 1:]
    r = np.linalg.norm(yz, axis=1)
    np.testing.assert_allclose(r.mean(), 2 / 3, rtol=0.02)


@pytest.mark.parametrize("cls", [dist.RandomUniformSphere,
                                 dist.RandomLambertianSphere])
def test_random_sphere_azimuth_uniform(cls):
    """Chi-square uniformity of the azimuth over 8 octants.

    Catches the reference's golden-angle azimuth bug
    (/root/reference/tfrt/distributions.py:1763-1766): theta drawn as
    GOLDEN_ANGLE*uniform spans ~[0, 10.17) rad, so after mod 2*pi azimuths
    in [0, 3.88) are twice as likely -- chi2 over octants blows up to
    O(n/8) instead of staying at the ~7-dof level."""
    n = 16000
    d = cls(PI / 2, n)
    _, ranks = d.sample(KEY, dtype=F64)
    theta = np.asarray(ranks)[:, 1]  # theta mod 2*pi
    counts, _ = np.histogram(theta, bins=8, range=(0.0, 2 * PI))
    expected = n / 8
    chi2 = float(np.sum((counts - expected) ** 2) / expected)
    # 99.9% quantile of chi2(7 dof) is 24.3; the golden-angle bug gives ~2000
    assert chi2 < 26.0, f"azimuth octant counts {counts} (chi2={chi2:.1f})"


@pytest.mark.parametrize("cls", [dist.RandomUniformCircle,
                                 dist.RandomUniformSphere])
def test_random_theta_window_uniform(cls):
    """Restricted theta windows must also be uniform: the old mod-wrap
    (theta % span + start) doubled the density of the first wrapped span
    for random draws."""
    n = 16000
    start, end = 0.0, 3 * PI / 2  # span chosen so 2*pi wraps 1.33x into it
    if cls is dist.RandomUniformCircle:
        d = cls(n, theta_start=start, theta_end=end)
        d.sample(KEY, dtype=F64)
        theta = np.asarray(d.polar_ranks)[:, 1]
    else:
        d = cls(PI / 2, n, theta_start=start, theta_end=end)
        _, ranks = d.sample(KEY, dtype=F64)
        theta = np.asarray(ranks)[:, 1]
    assert theta.min() >= start - 1e-9 and theta.max() <= end + 1e-9
    counts, _ = np.histogram(theta, bins=8, range=(start, end))
    expected = n / 8
    chi2 = float(np.sum((counts - expected) ** 2) / expected)
    assert chi2 < 26.0, f"window octant counts {counts} (chi2={chi2:.1f})"


def test_base_point_transformation():
    base = dist.ManualBasePointDistribution(2, points=[[1.0, 0.0], [0.0, 1.0]])
    t = dist.BasePointTransformation(base, scale=2.0, rotation=PI / 2,
                                     translation=(1.0, 0.0))
    points, _ = t.sample(dtype=F64)
    np.testing.assert_allclose(np.asarray(points), [[1.0, 2.0], [-1.0, 0.0]],
                               atol=1e-12)


# ----------------------------------------------------------------------
# sources
# ----------------------------------------------------------------------

def test_point_source_2d_dense_product():
    ang = dist.StaticUniformAngularDistribution(-0.1, 0.1, 3)
    s = src.PointSource(2, (1.0, 2.0), 0.0, ang, [450.0, 650.0])
    rays = s.sample(KEY, dtype=F64)
    assert rays.n_rays == 6  # 3 angles x 2 wavelengths
    np.testing.assert_allclose(np.asarray(rays.p0),
                               np.tile([[1.0, 2.0]], (6, 1)), atol=1e-12)
    assert set(np.asarray(rays.wavelength).tolist()) == {450.0, 650.0}
    # ranks attached from the angle domain
    assert "rank" in rays.fields
    assert rays.fields["rank"].shape == (6,)


def test_point_source_2d_rotation():
    ang = dist.ManualAngularDistribution([0.0])
    s = src.PointSource(2, (0.0, 0.0), PI / 2, ang, None)
    rays = s.sample(dtype=F64)
    np.testing.assert_allclose(np.asarray(rays.p1[0]), [0.0, 1.0], atol=1e-12)


def test_point_source_converging():
    ang = dist.ManualAngularDistribution([0.0])
    s = src.PointSource(2, (0.0, 0.0), 0.0, ang, None, start_on_center=False)
    rays = s.sample(dtype=F64)
    np.testing.assert_allclose(np.asarray(rays.p0[0]), [1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(rays.p1[0]), [0.0, 0.0], atol=1e-12)


def test_point_source_3d_vector_aiming():
    sphere = dist.StaticUniformSphere(PI / 8, 50)
    s = src.PointSource(3, (0.0, 0.0, 0.0), (0.0, 0.0, 1.0), sphere, [500.0])
    rays = s.sample(KEY, dtype=F64)
    d = np.array(rays.p1 - rays.p0)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # all directions within PI/8 of +z
    assert d[:, 2].min() >= math.cos(PI / 8) - 1e-9


def test_angular_source_dense_and_undense():
    ang = dist.StaticUniformAngularDistribution(-0.2, 0.2, 4)
    base = dist.StaticUniformBeam(-1.0, 1.0, 5)
    dense = src.AngularSource(2, (0.0, 0.0), 0.0, ang, base, [500.0])
    rays = dense.sample(KEY, dtype=F64)
    assert rays.n_rays == 20

    base4 = dist.StaticUniformBeam(-1.0, 1.0, 4)
    undense = src.AngularSource(2, (0.0, 0.0), 0.0, ang, base4, [500.0],
                                dense=False)
    rays_u = undense.sample(KEY, dtype=F64)
    assert rays_u.n_rays == 4


def test_angular_source_start_on_base_false():
    ang = dist.ManualAngularDistribution([0.0])
    base = dist.ManualBasePointDistribution(2, points=[[0.0, 1.0]])
    s = src.AngularSource(2, (0.0, 0.0), 0.0, ang, base, None,
                          start_on_base=False)
    rays = s.sample(dtype=F64)
    np.testing.assert_allclose(np.asarray(rays.p1[0]), [0.0, 1.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(rays.p0[0]), [1.0, 1.0], atol=1e-12)


def test_aperature_source_2d():
    start = dist.StaticUniformAperaturePoints((0.0, -1.0), (0.0, 1.0), 3)
    end = dist.StaticUniformAperaturePoints((1.0, -1.0), (1.0, 1.0), 3)
    s = src.AperatureSource(2, start, end, [500.0], dense=False)
    rays = s.sample(KEY, dtype=F64)
    assert rays.n_rays == 3
    np.testing.assert_allclose(np.asarray(rays.p1 - rays.p0)[:, 0], 1.0,
                               atol=1e-12)
    assert "rank" in rays.fields


def test_aperature_source_dense_crosses_points():
    start = dist.StaticUniformAperaturePoints((0.0, -1.0), (0.0, 1.0), 3)
    end = dist.StaticUniformAperaturePoints((1.0, -1.0), (1.0, 1.0), 5)
    s = src.AperatureSource(2, start, end, [500.0, 600.0])
    rays = s.sample(KEY, dtype=F64)
    assert rays.n_rays == 30


def test_extra_fields_plumbing():
    ang = dist.StaticUniformAngularDistribution(-0.1, 0.1, 3)
    obj = {"ranks": np.asarray([9.0, 8.0, 7.0])}
    s = src.PointSource(
        2, (0.0, 0.0), 0.0, ang, [500.0],
        extra_fields={
            "intensity": ("wavelength", [2.5]),
            "ext_rank": ("angle", obj, "ranks"),
            "tag": ("whole", 3.0),
        },
    )
    rays = s.sample(KEY, dtype=F64)
    np.testing.assert_allclose(np.asarray(rays.fields["intensity"]), 2.5)
    assert set(np.asarray(rays.fields["ext_rank"]).tolist()) == {9.0, 8.0, 7.0}
    np.testing.assert_allclose(np.asarray(rays.fields["tag"]), 3.0)


def test_random_source_resamples_with_key():
    ang = dist.RandomUniformAngularDistribution(-0.5, 0.5, 10)
    s = src.PointSource(2, (0.0, 0.0), 0.0, ang, [500.0])
    r1 = s.sample(jax.random.PRNGKey(1), dtype=F64)
    r2 = s.sample(jax.random.PRNGKey(2), dtype=F64)
    assert not np.allclose(np.asarray(r1.p1), np.asarray(r2.p1))
    r1b = s.sample(jax.random.PRNGKey(1), dtype=F64)
    np.testing.assert_array_equal(np.asarray(r1.p1), np.asarray(r1b.p1))


def test_manual_base_points_from_mesh():
    """from_mesh pulls live vertex positions (distributions.py:652-659)."""
    from tensorflowraytrace_tpu.models.mesh import hexagonal_mesh

    m = hexagonal_mesh(1.0, 2)
    d = dist.ManualBasePointDistribution(3, from_mesh=m)
    pts, _ = d.sample(dtype=F64)
    assert pts.shape == (m.n_points, 3)
    m.points[:, 2] = 7.0  # mutate the mesh; next sample sees it
    pts2, _ = d.sample(dtype=F64)
    np.testing.assert_allclose(np.asarray(pts2[:, 2]), 7.0)
