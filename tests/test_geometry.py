"""Geometry kernel tests.

Style follows the reference suite (randomized geometric invariants with
tolerance assertions, /root/reference/tests/geometry/test_line_intersect_1to1.py:9-46,
test_angle_in_interval.py:27-50) plus what the reference lacked: gradient
checks against finite differences through the safe-divide discipline.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu.ops import geometry

PI = math.pi
F64 = jnp.float64


# ----------------------------------------------------------------------
# line x line
# ----------------------------------------------------------------------

def test_line_intersect_recovers_common_point(rng):
    """Lines constructed to share a known point must intersect there."""
    n = 64
    px = rng.uniform(-5, 5, n)
    py = rng.uniform(-5, 5, n)
    # line 1 through (px,py) at angle a1; line 2 through same point at angle a2
    a1 = rng.uniform(0, PI, n)
    a2 = a1 + rng.uniform(0.2, PI - 0.2, n)  # guaranteed non-parallel

    def mkline(a):
        t0 = rng.uniform(0.5, 2.0, n)
        t1 = rng.uniform(0.5, 2.0, n)
        return px - t0 * np.cos(a), py - t0 * np.sin(a), \
               px + t1 * np.cos(a), py + t1 * np.sin(a)

    x1s, y1s, x1e, y1e = mkline(a1)
    x2s, y2s, x2e, y2e = mkline(a2)
    x, y, valid, u, v = geometry.raw_line_intersect(
        jnp.asarray(x1s, F64), jnp.asarray(y1s, F64), jnp.asarray(x1e, F64),
        jnp.asarray(y1e, F64), jnp.asarray(x2s, F64), jnp.asarray(y2s, F64),
        jnp.asarray(x2e, F64), jnp.asarray(y2e, F64), 1e-10,
    )
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(x), px, atol=1e-8)
    np.testing.assert_allclose(np.asarray(y), py, atol=1e-8)


def test_line_intersect_parallel_invalid_and_grad_safe():
    """Parallel lines -> valid=False, outputs finite, gradients finite."""
    args = [jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
            jnp.asarray([1.0], F64), jnp.asarray([0.0], F64),
            jnp.asarray([0.0], F64), jnp.asarray([1.0], F64),
            jnp.asarray([1.0], F64), jnp.asarray([1.0], F64)]
    x, y, valid, u, v = geometry.raw_line_intersect(*args, 1e-10)
    assert not bool(valid[0])
    assert np.isfinite(float(x[0])) and np.isfinite(float(u[0]))

    def f(y2s):
        x, y, valid, u, v = geometry.raw_line_intersect(
            args[0], args[1], args[2], args[3],
            args[4], y2s, args[6], args[7], 1e-10,
        )
        return jnp.sum(jnp.where(valid, x, 0.0))

    g = jax.grad(f)(jnp.asarray([1.0], F64))
    assert np.all(np.isfinite(np.asarray(g)))


def test_line_intersect_nxm_shape():
    x, y, valid, u, v = geometry.line_intersect(
        jnp.zeros(5, F64), jnp.zeros(5, F64), jnp.ones(5, F64), jnp.ones(5, F64),
        jnp.zeros(3, F64), jnp.ones(3, F64), jnp.ones(3, F64), jnp.zeros(3, F64),
        1e-10,
    )
    # reference convention: (M, N) with the second set on axis 0
    assert x.shape == (3, 5)


def test_line_intersect_gradcheck(rng):
    """d(intersection)/d(line endpoints) vs central finite differences."""
    base = jnp.asarray(
        [0.0, 0.0, 1.0, 1.0, 0.0, 2.0, 1.0, 0.5], F64
    )

    def f(p):
        x, y, valid, u, v = geometry.raw_line_intersect(*[p[i] for i in range(8)], 1e-10)
        return x * 1.7 + y * 0.3

    g = jax.grad(f)(base)
    eps = 1e-6
    for i in range(8):
        dp = jnp.zeros(8, F64).at[i].set(eps)
        fd = (f(base + dp) - f(base - dp)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-4, atol=1e-7)


# ----------------------------------------------------------------------
# line x circle
# ----------------------------------------------------------------------

def test_line_circle_two_hits():
    """Horizontal line through origin vs unit circle: hits at (+-1, 0)."""
    plus, minus = geometry.raw_line_circle_intersect(
        jnp.asarray([-2.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([2.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([1.0], F64), 1e-10,
    )
    assert bool(plus["valid"][0]) and bool(minus["valid"][0])
    xs = sorted([float(plus["x"][0]), float(minus["x"][0])])
    np.testing.assert_allclose(xs, [-1.0, 1.0], atol=1e-9)
    # v is the polar angle of the hit
    angles = sorted([abs(float(plus["v"][0])), abs(float(minus["v"][0]))])
    np.testing.assert_allclose(angles, [0.0, PI], atol=1e-9)


def test_line_circle_miss_invalid_and_finite():
    plus, minus = geometry.raw_line_circle_intersect(
        jnp.asarray([-2.0], F64), jnp.asarray([5.0], F64),
        jnp.asarray([2.0], F64), jnp.asarray([5.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([1.0], F64), 1e-10,
    )
    assert not bool(plus["valid"][0]) and not bool(minus["valid"][0])
    assert np.isfinite(float(plus["x"][0]))


def test_line_circle_tangent_both_branches_agree():
    """Tangent line: both branches valid and identical (geometry.py:487-496)."""
    plus, minus = geometry.raw_line_circle_intersect(
        jnp.asarray([-2.0], F64), jnp.asarray([1.0], F64),
        jnp.asarray([2.0], F64), jnp.asarray([1.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([1.0], F64), 1e-9,
    )
    assert bool(plus["valid"][0]) and bool(minus["valid"][0])
    np.testing.assert_allclose(float(plus["x"][0]), float(minus["x"][0]), atol=1e-6)
    np.testing.assert_allclose(float(plus["x"][0]), 0.0, atol=1e-4)


def test_line_circle_random_hits_on_circle(rng):
    """Random chords: both hit points must lie on the circle."""
    n = 128
    xc = rng.uniform(-3, 3, n)
    yc = rng.uniform(-3, 3, n)
    r = rng.uniform(0.5, 2.0, n)
    # chord through two random points ON the circle -> always intersects
    t1 = rng.uniform(0, 2 * PI, n)
    t2 = t1 + rng.uniform(0.3, PI, n)
    xs = xc + r * np.cos(t1)
    ys = yc + r * np.sin(t1)
    xe = xc + r * np.cos(t2)
    ye = yc + r * np.sin(t2)
    plus, minus = geometry.raw_line_circle_intersect(
        jnp.asarray(xs, F64), jnp.asarray(ys, F64), jnp.asarray(xe, F64),
        jnp.asarray(ye, F64), jnp.asarray(xc, F64), jnp.asarray(yc, F64),
        jnp.asarray(r, F64), 1e-10,
    )
    for branch in (plus, minus):
        assert bool(jnp.all(branch["valid"]))
        d = np.hypot(np.asarray(branch["x"]) - xc, np.asarray(branch["y"]) - yc)
        np.testing.assert_allclose(d, r, rtol=1e-8)


# ----------------------------------------------------------------------
# line x triangle
# ----------------------------------------------------------------------

def _random_triangles(rng, n):
    vp = rng.uniform(-2, 2, (n, 3))
    v1 = vp + rng.uniform(0.5, 1.5, (n, 3)) * rng.choice([-1, 1], (n, 3))
    v2 = vp + rng.uniform(0.5, 1.5, (n, 3)) * rng.choice([-1, 1], (n, 3))
    return vp, v1, v2


def test_line_triangle_hits_interior_point(rng):
    """Rays aimed at a random interior point of each triangle must hit it."""
    n = 128
    vp, v1, v2 = _random_triangles(rng, n)
    a = rng.uniform(0.05, 0.9, n)
    b = rng.uniform(0.05, 0.9, n) * (1 - a)
    target = vp + a[:, None] * (v1 - vp) + b[:, None] * (v2 - vp)
    origin = target + rng.uniform(1.0, 3.0, (n, 3)) * rng.choice([-1, 1], (n, 3))
    direction = target - origin
    p1 = origin + 0.25 * direction  # short rays; treated as infinite lines

    x, y, z, valid, ray_u, tu, tv = geometry.raw_line_triangle_intersect(
        *[jnp.asarray(origin[:, i], F64) for i in range(3)],
        *[jnp.asarray(p1[:, i], F64) for i in range(3)],
        *[jnp.asarray(vp[:, i], F64) for i in range(3)],
        *[jnp.asarray(v1[:, i], F64) for i in range(3)],
        *[jnp.asarray(v2[:, i], F64) for i in range(3)],
        1e-10,
    )
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(x), target[:, 0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(y), target[:, 1], atol=1e-7)
    np.testing.assert_allclose(np.asarray(z), target[:, 2], atol=1e-7)
    np.testing.assert_allclose(np.asarray(tu), a, atol=1e-7)
    np.testing.assert_allclose(np.asarray(tv), b, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ray_u), 4.0, atol=1e-7)


def test_line_triangle_parallel_invalid():
    # ray in the z=1 plane, triangle in the z=0 plane
    x, y, z, valid, ray_u, tu, tv = geometry.raw_line_triangle_intersect(
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64), jnp.asarray([1.0], F64),
        jnp.asarray([1.0], F64), jnp.asarray([0.0], F64), jnp.asarray([1.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([1.0], F64), jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([1.0], F64), jnp.asarray([0.0], F64),
        1e-10,
    )
    assert not bool(valid[0])
    assert np.isfinite(float(x[0]))


def test_line_triangle_nxm_shape(rng):
    vp, v1, v2 = _random_triangles(rng, 4)
    out = geometry.line_triangle_intersect(
        jnp.zeros(7, F64), jnp.zeros(7, F64), jnp.zeros(7, F64),
        jnp.ones(7, F64), jnp.ones(7, F64), jnp.ones(7, F64),
        *[jnp.asarray(vp[:, i], F64) for i in range(3)],
        *[jnp.asarray(v1[:, i], F64) for i in range(3)],
        *[jnp.asarray(v2[:, i], F64) for i in range(3)],
        1e-10,
    )
    assert out[0].shape == (4, 7)


# ----------------------------------------------------------------------
# Snell's law
# ----------------------------------------------------------------------

def test_snell_2d_normal_incidence_goes_straight():
    """At normal incidence the ray continues straight regardless of n."""
    xs, ys, xe, ye = geometry.snells_law_2D(
        jnp.asarray([-1.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([PI], F64),          # surface normal facing -x (toward ray)
        jnp.asarray([1.0], F64), jnp.asarray([1.5], F64), 1.0,
    )
    np.testing.assert_allclose([float(xs[0]), float(ys[0])], [0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose([float(xe[0]), float(ye[0])], [1.0, 0.0], atol=1e-9)


def test_snell_2d_obeys_snells_law():
    """n1 sin(t1) = n2 sin(t2) for a 30-degree external incidence."""
    t1 = PI / 6
    n1, n2 = 1.0, 1.5
    # ray travels in -x direction tilted by t1, hits surface with normal +x
    xs, ys, xe, ye = geometry.snells_law_2D(
        jnp.asarray([math.cos(PI - t1)], F64) * -1.0,
        jnp.asarray([math.sin(PI - t1)], F64) * -1.0,
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64),         # normal along +x
        jnp.asarray([n2], F64),          # n_in: material behind the normal? see note
        jnp.asarray([n1], F64),
        1.0,
    )
    out_angle = math.atan2(float(ye[0] - ys[0]), float(xe[0] - xs[0]))
    # outgoing ray continues into -x half-space; angle measured from -x axis
    t2 = PI - abs(out_angle)
    np.testing.assert_allclose(n1 * math.sin(t1), n2 * math.sin(t2), atol=1e-9)


def test_snell_2d_mirror_reflects():
    """n_in == 0 marks a reflective surface (materials.py:95-96)."""
    # 45-degree incidence on a vertical mirror (normal +x), ray arriving
    # from the normal side (n_in marks the material opposite the norm)
    xs, ys, xe, ye = geometry.snells_law_2D(
        jnp.asarray([1.0], F64), jnp.asarray([-1.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([1.0], F64), math.sqrt(2.0),
    )
    np.testing.assert_allclose([float(xe[0]), float(ye[0])], [1.0, 1.0], atol=1e-9)


def test_snell_3d_matches_2d(rng):
    """3D vector Snell must agree with 2D angle Snell in the z=0 plane."""
    n = 32
    t1 = rng.uniform(-1.2, 1.2, n)
    n_in = rng.uniform(1.2, 1.8, n)
    n_out = np.ones(n)
    xs = -np.cos(t1)
    ys = -np.sin(t1)

    xs2, ys2, xe2, ye2 = geometry.snells_law_2D(
        jnp.asarray(xs, F64), jnp.asarray(ys, F64),
        jnp.zeros(n, F64), jnp.zeros(n, F64),
        jnp.zeros(n, F64), jnp.asarray(n_in, F64), jnp.asarray(n_out, F64), 1.0,
    )
    norm3 = jnp.stack([jnp.ones(n, F64), jnp.zeros(n, F64), jnp.zeros(n, F64)], axis=1)
    xs3, ys3, zs3, xe3, ye3, ze3 = geometry.snells_law_3D(
        jnp.asarray(xs, F64), jnp.asarray(ys, F64), jnp.zeros(n, F64),
        jnp.zeros(n, F64), jnp.zeros(n, F64), jnp.zeros(n, F64),
        norm3, jnp.asarray(n_in, F64), jnp.asarray(n_out, F64), 1.0,
    )
    a2 = np.arctan2(np.asarray(ye2 - ys2), np.asarray(xe2 - xs2))
    a3 = np.arctan2(np.asarray(ye3 - ys3), np.asarray(xe3 - xs3))
    np.testing.assert_allclose(np.mod(a2, 2 * PI), np.mod(a3, 2 * PI), atol=1e-8)
    np.testing.assert_allclose(np.asarray(ze3), 0.0, atol=1e-9)


def test_snell_3d_tir():
    """Beyond the critical angle, dense->sparse rays totally internally reflect."""
    # internal reaction (nu > 0) uses eta = n_in / n_out; TIR needs eta > 1
    n_in, n_out = 1.5, 1.0
    # ray going +x, tilted 60 deg off the normal (+x): eta*sin(60) = 1.3 > 1
    t = PI / 3
    xs, ys, zs, xe, ye, ze = geometry.snells_law_3D(
        jnp.asarray([-math.cos(t)], F64), jnp.asarray([-math.sin(t)], F64),
        jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([[1.0, 0.0, 0.0]], F64),
        jnp.asarray([n_in], F64), jnp.asarray([n_out], F64), 1.0,
    )
    # internal: eta = n_in/n_out... sin(t)*1.5 > 1 -> TIR: reflected ray has
    # reversed x-direction component
    d = np.array([float(xe[0]), float(ye[0]), float(ze[0])])
    incoming = np.array([math.cos(t), math.sin(t), 0.0])
    expected = incoming - 2 * incoming[0] * np.array([1.0, 0.0, 0.0])
    np.testing.assert_allclose(d, expected, atol=1e-9)


def test_snell_grads_finite_everywhere(rng):
    """Gradients stay finite across refraction / TIR / mirror branches."""
    n = 16
    t1 = np.linspace(-1.4, 1.4, n)

    def f(theta):
        xs = -jnp.cos(theta)
        ys = -jnp.sin(theta)
        a, b, c, d = geometry.snells_law_2D(
            xs, ys, jnp.zeros(n, F64), jnp.zeros(n, F64), jnp.zeros(n, F64),
            jnp.asarray([0.0] * 4 + [1.5] * 6 + [1.0] * 6, F64),
            jnp.ones(n, F64), 1.0,
        )
        return jnp.sum(c + d)

    g = jax.grad(f)(jnp.asarray(t1, F64))
    assert np.all(np.isfinite(np.asarray(g)))


# ----------------------------------------------------------------------
# angle_in_interval
# ----------------------------------------------------------------------

@pytest.mark.parametrize(
    "angle,start,end,expected",
    [
        (0.0, -1.0, 1.0, True),
        (2.0, -1.0, 1.0, False),
        (PI - 0.1, PI / 2, -PI / 2, True),    # wraparound interval
        (-PI + 0.1, PI / 2, -PI / 2, True),   # wraparound interval
        (0.0, PI / 2, -PI / 2, False),
        (1.0, 1.0, 2.0, True),                # closed at start
        (2.0, 1.0, 2.0, True),                # closed at end
    ],
)
def test_angle_in_interval(angle, start, end, expected):
    got = geometry.angle_in_interval(
        jnp.asarray(angle, F64), jnp.asarray(start, F64), jnp.asarray(end, F64)
    )
    assert bool(got) == expected


# ----------------------------------------------------------------------
# exactly-critical incidence: the refraction radicand is EXACTLY 0 (passes
# the < 0 TIR test) and d/dx sqrt(0) is inf.  eta = 1.25 with n.u = 0.6
# gives radicand = 1 - 1.5625 + 0.5625 = 0 in exact float arithmetic.
# Observed in the wild as NaN gradients in deep rematerialized TPU traces.
# ----------------------------------------------------------------------

def test_snell_3d_vec_critical_angle_gradient_finite():
    from tensorflowraytrace_tpu.ops.geometry import snell_3d_vec

    p0 = jnp.asarray([[0.0, 0.0, 0.0]], F64)
    p1 = jnp.asarray([[0.8, 0.0, 0.6]], F64)     # unit: 0.64 + 0.36 exact
    norm = jnp.asarray([[0.0, 0.0, 1.0]], F64)   # n.u = 0.6, internal
    n_in = jnp.asarray([1.25], F64)
    n_out = jnp.asarray([1.0], F64)

    def loss(p1):
        _, new_p1 = snell_3d_vec(p0, p1, norm, n_in, n_out, 1.0)
        return jnp.sum(new_p1)

    v = loss(p1)
    g = jax.grad(loss)(p1)
    assert bool(jnp.all(jnp.isfinite(v)))
    assert bool(jnp.all(jnp.isfinite(g))), g


def test_snells_law_3d_critical_angle_gradient_finite():
    def loss(xe):
        out = geometry.snells_law_3D(
            jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
            jnp.asarray([0.0], F64), xe, jnp.asarray([0.0], F64),
            jnp.asarray([0.6], F64), jnp.asarray([[0.0, 0.0, 1.0]], F64),
            jnp.asarray([1.25], F64), jnp.asarray([1.0], F64), 1.0)
        return sum(jnp.sum(o) for o in out[3:])

    g = jax.grad(loss)(jnp.asarray([0.8], F64))
    assert bool(jnp.all(jnp.isfinite(g))), g


def test_snells_law_2d_critical_angle_gradient_finite():
    """2D analog: |n sin(theta1)| == 1 exactly passes the <= 1 refraction
    test and d/dx arcsin(1) is inf."""
    # ray traveling +x, surface normal at 3pi/4: the impl computes
    # theta1 = norm - ray_angle = 3pi/4 - pi = -pi/4 (external branch),
    # n = n_out/n_in; choose n_out = 1/|sin(theta1)| so |theta2| == 1
    # (to within an ulp)
    xs, ys = jnp.asarray([-1.0], F64), jnp.asarray([0.0], F64)
    xe, ye = jnp.asarray([0.0], F64), jnp.asarray([0.0], F64)
    norm = jnp.asarray([3 * PI / 4], F64)
    theta1 = 3 * PI / 4 - math.pi
    n_in = jnp.asarray([1.0], F64)
    n_out = jnp.asarray([1.0 / abs(math.sin(theta1))], F64)

    def loss(xe):
        out = geometry.snells_law_2D(xs, ys, xe, ye, norm, n_in, n_out, 1.0)
        return jnp.sum(out[2]) + jnp.sum(out[3])

    v = loss(xe)
    g = jax.grad(loss)(xe)
    assert bool(jnp.all(jnp.isfinite(v)))
    assert bool(jnp.all(jnp.isfinite(g))), g


def test_mixed_dtype_promotes_before_arithmetic():
    """f32 surface data against f64 rays must compute at f64 (regression).

    jnp.broadcast_arrays broadcasts shapes but leaves dtypes alone, so the
    raw kernels used to evaluate f32-only subexpressions (notably ``1/r`` in
    the circle solve) at f32 precision even when the ray coords were f64.
    The ~6e-8 relative rounding of 1/r shifted the scaled coordinates enough
    that a ray starting EXACTLY on the circle appeared off it and re-hit
    itself at u ~ 5e-7 -- far above the f64 self-hit epsilon.  The kernels
    now promote every operand to the common dtype up front.
    """
    # ray starting exactly on the unit circle, leaving radially outward
    xs, ys = jnp.asarray([1.0], F64), jnp.asarray([0.0], F64)
    xe, ye = jnp.asarray([2.0], F64), jnp.asarray([0.0], F64)
    r32 = jnp.asarray([1.0], jnp.float32)
    c32 = jnp.asarray([0.0], jnp.float32)
    plus, minus = geometry.raw_line_circle_intersect(
        xs, ys, xe, ye, c32, c32, r32, 1e-10)
    for out in (plus, minus):
        assert out["u"].dtype == F64
        # self-hit lands at u == 0 (or the far hit at u == -2): at f64
        # precision the start-point hit must be 0 to ~1e-15, not ~5e-7
        u = float(out["u"][0])
        assert min(abs(u), abs(u + 2.0)) < 1e-12, u

    # same discipline for the line-line and line-triangle kernels
    _, _, _, u, _ = geometry.raw_line_intersect(
        xs, ys, xe, ye,
        jnp.asarray([1.0], jnp.float32), jnp.asarray([-1.0], jnp.float32),
        jnp.asarray([1.0], jnp.float32), jnp.asarray([1.0], jnp.float32))
    assert u.dtype == F64
    np.testing.assert_allclose(float(u[0]), 0.0, atol=1e-14)

    tri32 = [jnp.asarray([v], jnp.float32) for v in
             (0.0, -1.0, -1.0, 0.0, 1.0, -1.0, 0.0, 0.0, 1.0)]
    _, _, _, _, ray_u, _, _ = geometry.raw_line_triangle_intersect(
        jnp.asarray([-1.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64), jnp.asarray([0.0], F64),
        jnp.asarray([0.0], F64), *tri32)
    assert ray_u.dtype == F64
    np.testing.assert_allclose(float(ray_u[0]), 1.0, atol=1e-14)
