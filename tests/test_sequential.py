"""The analytic sequential tracer (sequential.py, beyond reference).

Classical lens design traces a known ORDERED stack of rotationally
symmetric aspheres analytically (Spencer & Murty, JOSA 52, 1962) -- no
search, no tessellation, machine-precision hits.  The reference has no
counterpart (its engine intersects tessellated surfaces only,
/root/reference/tfrt/engine.py:1102); the workflow anchor is the ordered
multi-surface lens of /root/reference/dev/simple_3d_optimize.py:247-283.

Pinned here: closed-form conic hits (plane / sphere / hyperbola), Newton
refinement of polynomial tails, exact agreement with Snell's law and the
parabolic-mirror focus, kill paths (vignetting, TIR, missed surface,
sentinel materials), gradchecks through the unrolled Newton iterations,
OPL bookkeeping, and convergence of the TESSELLATED engine's landings to
the sequential tracer's as the mesh refines (the discretization the
analytic path removes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu import (
    AsphereStack, RaySet, Scene3D, TraceConfig, collimated_bundle, trace,
    trace_sequential,
)
from tensorflowraytrace_tpu.models.boundaries import ParametricAsphereBoundary
from tensorflowraytrace_tpu.ops import asphere
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.sequential import _intersect_asphere

F64 = jnp.float64

N_GLASS = 1.5
MATERIALS = (mats.vacuum, mats.build_constant_material(N_GLASS),
             mats.reflective, mats.crown_glass)


def bundle(n=7, half=0.8, z0=-2.0, tilt=0.0):
    p, d = collimated_bundle(n, half, z_start=z0, field_angle=tilt,
                             dtype=F64)
    return p, d


# ----------------------------------------------------------------------
# exact hits
# ----------------------------------------------------------------------

def test_plane_hit_exact():
    stack = AsphereStack.make(vertex_z=[2.0], c=0.0, mat_after=1, dtype=F64)
    p, d = bundle()
    res = trace_sequential(p, d, 550.0, stack, MATERIALS)
    assert bool(jnp.all(res.alive))
    np.testing.assert_allclose(np.asarray(res.p[:, 2]), 2.0, atol=1e-15)
    # transverse position unchanged for axis-parallel rays
    np.testing.assert_allclose(np.asarray(res.p[:, :2]),
                               np.asarray(p[:, :2]), atol=1e-15)


def test_sphere_hit_matches_line_sphere_algebra(rng):
    """Tilted rays against a spherical cap: the hit must equal the
    closed-form line-sphere intersection (center at vertex + R on axis)."""
    R = 4.0
    vz = 1.0
    stack = AsphereStack.make(vertex_z=[vz], c=1.0 / R, mat_after=1,
                              dtype=F64)
    n = 16
    p = jnp.asarray(np.stack([rng.uniform(-0.5, 0.5, n),
                              rng.uniform(-0.5, 0.5, n),
                              np.full(n, -3.0)], 1))
    d = jnp.asarray(np.stack([rng.uniform(-0.1, 0.1, n),
                              rng.uniform(-0.1, 0.1, n),
                              np.ones(n)], 1))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    res = trace_sequential(p, d, 550.0, stack, MATERIALS)
    assert bool(jnp.all(res.alive))
    # |hit - center| == R, taking the near (vertex-sheet) root
    center = np.array([0.0, 0.0, vz + R])
    dist = np.linalg.norm(np.asarray(res.p) - center, axis=1)
    np.testing.assert_allclose(dist, R, rtol=0, atol=1e-12)
    # closed form for the smaller root of |p + t d - center|^2 = R^2
    pc = np.asarray(p) - center
    dn = np.asarray(d)
    b = 2 * np.sum(pc * dn, 1)
    c0 = np.sum(pc * pc, 1) - R * R
    t_exact = (-b - np.sqrt(b * b - 4 * c0)) / 2
    hit_exact = np.asarray(p) + t_exact[:, None] * dn
    np.testing.assert_allclose(np.asarray(res.p), hit_exact, atol=1e-12)


def test_conic_and_polynomial_hit_on_surface(rng):
    """Tilted rays against a full even asphere: the hit must satisfy the
    implicit z == sag(r^2) to machine precision (Newton-refined)."""
    stack = AsphereStack.make(vertex_z=[0.5], c=0.35, k=-0.7,
                              coeffs=[[0.02, -0.004]], mat_after=1,
                              dtype=F64)
    n = 32
    p = jnp.asarray(np.stack([rng.uniform(-0.6, 0.6, n),
                              rng.uniform(-0.6, 0.6, n),
                              np.full(n, -2.0)], 1))
    d = jnp.asarray(np.stack([rng.uniform(-0.15, 0.15, n),
                              rng.uniform(-0.15, 0.15, n),
                              np.ones(n)], 1))
    res = trace_sequential(p, d, 550.0, stack, MATERIALS)
    assert bool(jnp.all(res.alive))
    hit = np.asarray(res.p)
    u = hit[:, 0] ** 2 + hit[:, 1] ** 2
    sag = np.asarray(asphere.sag(jnp.asarray(u), 0.35, -0.7,
                                 jnp.asarray([0.02, -0.004])))
    np.testing.assert_allclose(hit[:, 2] - 0.5, sag, rtol=0, atol=1e-12)


def test_vertex_sheet_selection():
    """A hyperboloid (k < -1) has two sheets; the intersector must pick the
    vertex sheet even when the other sheet's root is nearer t_min."""
    c, k = 1.2, -3.0
    t, ok = _intersect_asphere(
        jnp.asarray([[0.05, 0.0, -5.0]], F64),
        jnp.asarray([[0.0, 0.0, 1.0]], F64),
        jnp.asarray(c, F64), jnp.asarray(k, F64), jnp.zeros((0,), F64),
        jnp.asarray(1e-9, F64))
    assert bool(ok[0])
    z = -5.0 + float(t[0])
    sag = float(asphere.sag(jnp.asarray(0.05 ** 2, F64), c, k,
                            jnp.zeros((0,), F64)))
    assert abs(z - sag) < 1e-12


# ----------------------------------------------------------------------
# physics: Snell, mirrors, OPL
# ----------------------------------------------------------------------

def test_plane_refraction_matches_snell():
    """Refraction at a plane must reproduce the vector Snell's law
    exactly (sin(theta_t) = sin(theta_i) / n, in the plane of incidence)."""
    stack = AsphereStack.make(vertex_z=[0.0], c=0.0, mat_after=1, dtype=F64)
    th_i = 0.35
    p = jnp.asarray([[0.0, -1.0, -2.0]], F64)
    d = jnp.asarray([[0.0, np.sin(th_i), np.cos(th_i)]], F64)
    res = trace_sequential(p, d, 550.0, stack, MATERIALS)
    assert bool(res.alive[0])
    th_t = np.arcsin(np.sin(th_i) / N_GLASS)
    np.testing.assert_allclose(
        np.asarray(res.d[0]), [0.0, np.sin(th_t), np.cos(th_t)], atol=1e-15)
    np.testing.assert_allclose(float(res.n[0]), N_GLASS, atol=1e-15)


def test_parabolic_mirror_focus():
    """A parabolic mirror (k = -1) focuses an axis-parallel bundle to the
    focal point EXACTLY -- all rays land on the axis at z = f, a property no
    tessellated mirror can reproduce to machine precision."""
    f = 1.75
    c = 1.0 / (2.0 * f)  # sag = c r^2 / 2 = r^2 / (4 f)
    stack = AsphereStack.make(vertex_z=[0.0], c=c, k=-1.0, mirror=True,
                              mat_after=0, dtype=F64)
    p, d = collimated_bundle(9, 1.2, z_start=3.0, dtype=F64)
    d = -d  # travel toward -z onto the mirror
    res = trace_sequential(p, d, 550.0, stack, MATERIALS, image_z=f)
    assert bool(jnp.all(res.alive))
    np.testing.assert_allclose(np.asarray(res.p[:, :2]), 0.0, atol=1e-12)
    # reflected rays travel +z (reversed), and Fermat: every ray's OPL from
    # the z = 3 start plane to the focus is equal (parabola definition)
    assert bool(jnp.all(res.d[:, 2] > 0))
    opl = np.asarray(res.opl)
    np.testing.assert_allclose(opl, opl[0], atol=1e-12)


def test_opl_plane_parallel_plate():
    """OPL through a tilted plate: t_glass = thickness / cos(theta_t),
    opl = 1 * t_vac + n * t_glass."""
    th_i = 0.3
    thick = 0.4
    stack = AsphereStack.make(vertex_z=[0.0, thick], c=0.0,
                              mat_after=[1, 0], dtype=F64)
    p = jnp.asarray([[0.0, 0.0, -1.0]], F64)
    d = jnp.asarray([[0.0, np.sin(th_i), np.cos(th_i)]], F64)
    res = trace_sequential(p, d, 550.0, stack, MATERIALS)
    assert bool(res.alive[0])
    th_t = np.arcsin(np.sin(th_i) / N_GLASS)
    expected = 1.0 / np.cos(th_i) + N_GLASS * thick / np.cos(th_t)
    np.testing.assert_allclose(float(res.opl[0]), expected, atol=1e-14)
    # exiting the plate restores the incident direction (lateral shift only)
    np.testing.assert_allclose(np.asarray(res.d[0]), np.asarray(d[0]),
                               atol=1e-14)


def test_dispersion_through_stack():
    """Per-ray wavelengths see per-ray indices (crown glass curve)."""
    stack = AsphereStack.make(vertex_z=[0.0], c=0.0, mat_after=3, dtype=F64)
    th_i = 0.4
    wl = jnp.asarray([486.1, 587.6, 656.3], F64)
    p = jnp.zeros((3, 3), F64).at[:, 2].set(-1.0)
    d = jnp.broadcast_to(
        jnp.asarray([0.0, np.sin(th_i), np.cos(th_i)], F64), (3, 3))
    res = trace_sequential(p, d, wl, stack, MATERIALS)
    n_wl = np.asarray(mats.crown_glass(wl))
    np.testing.assert_allclose(np.asarray(res.n), n_wl, atol=1e-15)
    sin_t = np.sin(th_i) / n_wl
    np.testing.assert_allclose(np.asarray(res.d[:, 1]), sin_t, atol=1e-15)
    # blue bends more
    assert float(res.d[0, 1]) < float(res.d[2, 1])


# ----------------------------------------------------------------------
# kill paths
# ----------------------------------------------------------------------

def test_vignetting_kills_marginal_rays():
    stack = AsphereStack.make(vertex_z=[0.0], c=0.1, aperture=0.5,
                              mat_after=1, dtype=F64)
    p, d = collimated_bundle(9, 1.0, dtype=F64)  # heights -1..1
    res = trace_sequential(p, d, 550.0, stack, MATERIALS)
    r = np.abs(np.asarray(p[:, 1]))
    np.testing.assert_array_equal(np.asarray(res.alive), r <= 0.5)
    # dead rays are frozen at their input state
    dead = ~np.asarray(res.alive)
    np.testing.assert_allclose(np.asarray(res.p)[dead], np.asarray(p)[dead])


def test_tir_kills():
    """Steep glass -> vacuum incidence (beyond the critical angle) dies."""
    stack = AsphereStack.make(vertex_z=[0.0], c=0.0, mat_after=0, dtype=F64)
    th_crit = np.arcsin(1.0 / N_GLASS)
    angles = jnp.asarray([th_crit - 0.05, th_crit + 0.05], F64)
    p = jnp.zeros((2, 3), F64).at[:, 2].set(-1.0)
    d = jnp.stack([jnp.zeros(2, F64), jnp.sin(angles), jnp.cos(angles)], 1)
    res = trace_sequential(p, d, 550.0, stack, MATERIALS, start_mat=1)
    assert bool(res.alive[0]) and not bool(res.alive[1])


def test_missed_surface_kills():
    """A ray passing outside a sphere's natural aperture has no real
    intersection and must die, not hit the radicand-clamped ghost sheet."""
    R = 0.5
    stack = AsphereStack.make(vertex_z=[0.0], c=1.0 / R, mat_after=1,
                              dtype=F64)
    p = jnp.asarray([[0.0, 0.9, -2.0], [0.0, 0.1, -2.0]], F64)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], F64), (2, 3))
    res = trace_sequential(p, d, 550.0, stack, MATERIALS)
    assert not bool(res.alive[0]) and bool(res.alive[1])


def test_refraction_into_sentinel_material_kills_with_finite_grads():
    """mat_after = the n = 0 reflective sentinel WITHOUT mirror=True is a
    scene bug: the ray must die (not propagate an inf eta), and gradients
    through the batch must stay finite (ADVICE r4: guard the divisor)."""

    def landing_sum(c):
        stack = AsphereStack.make(vertex_z=[0.0, 1.0], c=[c, 0.0],
                                  mat_after=[2, 0], dtype=F64)
        p, d = collimated_bundle(5, 0.3, dtype=F64)
        res = trace_sequential(p, d, 550.0, stack, MATERIALS)
        return jnp.sum(jnp.where(res.alive, res.p[:, 1], 0.0)), res.alive

    (val, alive), grad = jax.value_and_grad(landing_sum, has_aux=True)(
        jnp.asarray(0.2, F64))
    assert not bool(jnp.any(alive))
    assert np.isfinite(float(val)) and np.isfinite(float(grad))


def test_mirror_with_sentinel_mat_after_grads_finite():
    """The idiomatic mirror row: mirror=True with mat_after pointing at the
    reflective sentinel.  eta = n/0 would NaN the backward pass through the
    untaken refract branch; the guard must keep d(landing)/d(curvature)
    finite AND equal to the same mirror with a benign mat_after."""

    def landing(c, mat_after):
        f = 2.0
        stack = AsphereStack.make(vertex_z=[0.0], c=c, k=-1.0, mirror=True,
                                  mat_after=mat_after, dtype=F64)
        p, d = collimated_bundle(5, 0.6, z_start=2.0, dtype=F64)
        res = trace_sequential(p, -d, 550.0, stack, MATERIALS, image_z=f)
        return jnp.sum(res.p[:, 1] ** 2)

    c0 = jnp.asarray(0.31, F64)
    g_sentinel = jax.grad(lambda c: landing(c, 2))(c0)
    g_benign = jax.grad(lambda c: landing(c, 0))(c0)
    assert np.isfinite(float(g_sentinel))
    np.testing.assert_allclose(float(g_sentinel), float(g_benign),
                               rtol=1e-12)


# ----------------------------------------------------------------------
# gradients
# ----------------------------------------------------------------------

def _singlet_spot(params, n_rays=9):
    """RMS spot of a biconvex asphere singlet at a fixed image plane, as a
    function of the full prescription vector [c1, k1, a4_1, c2, k2, a4_2]."""
    stack = AsphereStack.make(
        vertex_z=jnp.asarray([0.0, 0.35], F64),
        c=jnp.stack([params[0], params[3]]),
        k=jnp.stack([params[1], params[4]]),
        coeffs=jnp.stack([params[2:3], params[5:6]]),
        mat_after=[1, 0], dtype=F64)
    p, d = collimated_bundle(n_rays, 0.7, dtype=F64)
    res = trace_sequential(p, d, 550.0, stack, MATERIALS, image_z=2.5)
    return jnp.sqrt(jnp.mean(jnp.where(res.alive, res.p[:, 1], 0.0) ** 2))


def test_gradcheck_full_prescription_vs_finite_differences():
    """jax.grad through the unrolled Newton iterations == central finite
    differences, for every entry of the prescription (curvatures, conics,
    polynomial coefficients) -- the IFT fixed-point property."""
    params = jnp.asarray([0.42, -0.2, 0.01, -0.40, 0.1, -0.005], F64)
    g = jax.grad(_singlet_spot)(params)
    eps = 1e-6
    for i in range(6):
        e = jnp.zeros(6, F64).at[i].set(eps)
        fd = (float(_singlet_spot(params + e))
              - float(_singlet_spot(params - e))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=2e-5, atol=1e-10)


def test_gradient_designs_singlet():
    """A few Adam steps on the analytic singlet reduce the spot (the
    classical lens-design inner loop, machine-precision version)."""
    import optax

    params = jnp.asarray([0.42, 0.0, 0.0, -0.42, 0.0, 0.0], F64)
    tx = optax.adam(5e-3)
    state = tx.init(params)
    vag = jax.jit(jax.value_and_grad(_singlet_spot))
    v0 = float(_singlet_spot(params))
    for _ in range(60):
        _, grad = vag(params)
        upd, state = tx.update(grad, state)
        params = optax.apply_updates(params, upd)
    assert float(_singlet_spot(params)) < 0.5 * v0


# ----------------------------------------------------------------------
# agreement with the tessellated engine
# ----------------------------------------------------------------------

def _mesh_landings(c, k, edge, n_rays, z_img):
    """Trace the same spherical cap through the TESSELLATED 3D engine."""
    # the cap's face normals point +z, so incoming -z-side rays make an
    # "internal" hit (nu > 0): mat_in is the INCIDENT vacuum side here
    b = ParametricAsphereBoundary((0.0, 0.0, 0.0), (0.0, 0.0, 1.0),
                                  aperture_radius=1.0, target_edge_size=edge,
                                  mat_in=0, mat_out=1, dtype=F64)
    surf = b.build(jnp.asarray([c, k], F64))
    from tensorflowraytrace_tpu import TriangleSet

    half = 5.0
    target = TriangleSet.make(
        [[-half, -half, z_img], [half, half, z_img]],
        [[half, -half, z_img], [-half, half, z_img]],
        [[half, half, z_img], [-half, -half, z_img]], dtype=F64)
    scene = Scene3D.build(optical=[surf], targets=[target])
    p, d = collimated_bundle(n_rays, 0.6, z_start=-1.0, grid="hex",
                             dtype=F64)
    rays = RaySet.make(p, p + d, 550.0, dtype=F64)
    res = trace(rays, scene, MATERIALS, TraceConfig(max_bounces=2))
    return np.asarray(res.rays.p1[:, :2]), np.asarray(res.rays.state)


def test_tessellated_engine_converges_to_sequential():
    """The mesh engine's landings approach the analytic tracer's as the
    tessellation refines (the discretization floor sequential removes)."""
    from tensorflowraytrace_tpu.config import FINISHED

    c, k, z_img = 0.5, -0.3, 2.0
    stack = AsphereStack.make(vertex_z=[0.0], c=c, k=k, mat_after=1,
                              dtype=F64)
    n_rays = 64
    p, d = collimated_bundle(n_rays, 0.6, z_start=-1.0, grid="hex",
                             dtype=F64)
    res = trace_sequential(p, d, 550.0, stack, MATERIALS, image_z=z_img)
    assert bool(jnp.all(res.alive))
    exact = np.asarray(res.p[:, :2])

    errs = []
    for edge in (0.2, 0.1, 0.05):
        land, state = _mesh_landings(c, k, edge, n_rays, z_img)
        fin = state == FINISHED
        assert fin.mean() > 0.9  # a stray edge-hit may drop a ray or two
        errs.append(float(np.abs(land[fin] - exact[fin]).max()))
    # measured contraction is ~O(edge): 0.045 -> 0.019 -> 0.009 (the max
    # landing error is dominated by rays crossing near facet boundaries,
    # where the normal error is first-order in the edge length)
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < errs[0] * 0.35
    assert errs[2] < 1.5e-2


def test_boundaries_sag_delegates_to_shared_model():
    """Drift guard for the factored sag (ADVICE r4): the tessellated
    boundary's sag must BE ops.asphere.sag."""
    from tensorflowraytrace_tpu.models.boundaries import _asphere_sag

    r2 = jnp.linspace(0.0, 2.0, 17, dtype=F64)
    params = jnp.asarray([0.4, -1.2, 0.03, -0.01], F64)
    a = _asphere_sag(r2, params, 2, F64)
    b = asphere.sag(r2, params[0], params[1], params[2:])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ----------------------------------------------------------------------
# sources
# ----------------------------------------------------------------------

def test_collimated_bundle_grids():
    p, d = collimated_bundle(11, 0.5, field_angle=0.1, azimuth=0.3,
                             dtype=F64)
    assert p.shape == (11, 3) and d.shape == (11, 3)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(d, axis=1)), 1.0,
                               atol=1e-15)
    # line grid spans the meridional section
    np.testing.assert_allclose(float(p[0, 1]), -0.5, atol=1e-15)
    p2, _ = collimated_bundle(64, 0.5, grid="hex", dtype=F64)
    r = np.linalg.norm(np.asarray(p2[:, :2]), axis=1)
    assert r.max() <= 0.5 + 1e-12 and r.min() < 0.1
