"""First-order (paraxial/ABCD) analysis: textbook formulas + agreement with
the real sequential tracer in the small-aperture limit.

The reference has no first-order layer (all questions go through real-ray
traces of /root/reference/tfrt/engine.py); these tests pin the new
paraxial module against (a) closed-form thin/thick-lens and mirror formulas
and (b) tensorflowraytrace_tpu.sequential real rays, which were themselves
validated against the tessellated engine (tests/test_sequential.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.paraxial import (
    axial_color, field_curves, gaussian_beam, lateral_color,
    paraxial_system, paraxial_trace, petzval_sum, seidel_sums, solve_stop,
)
from tensorflowraytrace_tpu.sequential import AsphereStack, trace_sequential

N_GLASS = 1.5
GLASS = mats.build_constant_material(N_GLASS)
AIR = mats.vacuum
MATERIALS = [AIR, GLASS, mats.crown_glass, mats.flint_glass]
WL = 550.0


def lens_stack(r1, r2, thickness, z0=0.0, mat=1):
    """Biconvex-style two-surface lens starting at z0."""
    return AsphereStack.make(
        vertex_z=jnp.array([z0, z0 + thickness], jnp.float64),
        c=jnp.array([1.0 / r1, 1.0 / r2]),
        mat_after=jnp.array([mat, 0], jnp.int32),
        dtype=jnp.float64)


# ----------------------------------------------------------------------
# closed-form checks
# ----------------------------------------------------------------------

class TestTextbookFormulas:
    def test_thin_lens_efl_matches_lensmaker(self):
        r1, r2 = 10.0, -10.0
        sys = paraxial_system(lens_stack(r1, r2, 1e-9), MATERIALS, WL)
        f_expected = 1.0 / ((N_GLASS - 1.0) * (1.0 / r1 - 1.0 / r2))
        np.testing.assert_allclose(float(sys.efl), f_expected, rtol=1e-9)

    def test_thick_lens_efl_matches_full_lensmaker(self):
        r1, r2, t = 10.0, -15.0, 2.0
        sys = paraxial_system(lens_stack(r1, r2, t), MATERIALS, WL)
        n = N_GLASS
        inv_f = (n - 1.0) * (1.0 / r1 - 1.0 / r2
                             + (n - 1.0) * t / (n * r1 * r2))
        np.testing.assert_allclose(float(sys.power), inv_f, rtol=1e-12)

    def test_thick_lens_principal_planes(self):
        # Hecht eq. 6.3-6.4: distances of P (from front vertex) and P'
        # (from back vertex): x_P = -f (n-1) t / (R2 n),
        # x_P' = -f (n-1) t / (R1 n)  (signed, along +z)
        r1, r2, t = 10.0, -15.0, 2.0
        sys = paraxial_system(lens_stack(r1, r2, t), MATERIALS, WL)
        f = float(sys.efl)
        n = N_GLASS
        x_p = -f * (n - 1.0) * t / (r2 * n)
        x_pp = -f * (n - 1.0) * t / (r1 * n)
        np.testing.assert_allclose(
            float(sys.front_principal_plane) - 0.0, x_p, rtol=1e-9)
        np.testing.assert_allclose(
            float(sys.back_principal_plane) - t, x_pp, rtol=1e-9)

    def test_nodal_points_equal_principal_in_air(self):
        sys = paraxial_system(lens_stack(10.0, -15.0, 2.0), MATERIALS, WL)
        np.testing.assert_allclose(float(sys.front_nodal_point),
                                   float(sys.front_principal_plane))
        np.testing.assert_allclose(float(sys.back_nodal_point),
                                   float(sys.back_principal_plane))

    def test_concave_mirror_focal_point(self):
        # vertex at z=0, R = -10 (center of curvature at z=-10, concave
        # toward incoming +z rays): focus at z = -5, power 2|c|, principal
        # plane at the vertex.
        stack = AsphereStack.make(
            vertex_z=jnp.array([0.0], jnp.float64),
            c=jnp.array([-0.1]), mirror=jnp.array([True]),
            dtype=jnp.float64)
        sys = paraxial_system(stack, MATERIALS, WL)
        np.testing.assert_allclose(float(sys.power), 0.2, rtol=1e-12)
        np.testing.assert_allclose(float(sys.back_focal_point), -5.0,
                                   rtol=1e-12)
        np.testing.assert_allclose(float(sys.back_principal_plane), 0.0,
                                   atol=1e-12)

    def test_thin_lens_image_equation(self):
        # 1/s' - 1/s = 1/f with the z-signed convention
        r1, r2 = 12.0, -12.0
        sys = paraxial_system(lens_stack(r1, r2, 1e-9), MATERIALS, WL)
        f = float(sys.efl)
        s = -30.0  # object 30 to the left of the (thin) lens at z=0
        s_img = 1.0 / (1.0 / f + 1.0 / s)
        np.testing.assert_allclose(float(sys.image_distance(s)), s_img,
                                   rtol=1e-6)
        np.testing.assert_allclose(float(sys.magnification(s)), s_img / s,
                                   rtol=1e-6)

    def test_petzval_thin_lens_and_mirror(self):
        r1, r2 = 10.0, -10.0
        stack = lens_stack(r1, r2, 1e-9)
        p = float(petzval_sum(stack, MATERIALS, WL))
        # thin lens: sum = (n-1)(1/R1 - 1/R2)/n = 1/(n f) = power/n
        sys = paraxial_system(stack, MATERIALS, WL)
        np.testing.assert_allclose(p, float(sys.power) / N_GLASS, rtol=1e-9)

        mirror = AsphereStack.make(
            vertex_z=jnp.array([0.0], jnp.float64), c=jnp.array([-0.1]),
            mirror=jnp.array([True]), dtype=jnp.float64)
        np.testing.assert_allclose(
            float(petzval_sum(mirror, MATERIALS, WL)), 2.0 * (-0.1),
            rtol=1e-12)


# ----------------------------------------------------------------------
# agreement with the real sequential tracer (small-aperture limit)
# ----------------------------------------------------------------------

def axis_crossing_z(res):
    """z where a (meridional) traced ray crosses y = 0."""
    t = -res.p[:, 1] / res.d[:, 1]
    return res.p[:, 2] + t * res.d[:, 2]


def doublet_stack():
    """Cemented doublet (crown + flint), all-spherical, 4 media changes."""
    return AsphereStack.make(
        vertex_z=jnp.array([0.0, 1.2, 1.8], jnp.float64),
        c=jnp.array([1 / 15.0, -1 / 12.0, -1 / 40.0]),
        mat_after=jnp.array([2, 3, 0], jnp.int32),
        dtype=jnp.float64)


class TestSequentialAgreement:
    def test_back_focal_point_vs_real_marginal_ray(self):
        stack = doublet_stack()
        sys = paraxial_system(stack, MATERIALS, WL)
        y0 = 1e-7
        p = jnp.array([[0.0, y0, -1.0]], jnp.float64)
        d = jnp.array([[0.0, 0.0, 1.0]], jnp.float64)
        res = trace_sequential(p, d, WL, stack, MATERIALS)
        assert bool(res.alive[0])
        np.testing.assert_allclose(float(axis_crossing_z(res)[0]),
                                   float(sys.back_focal_point), rtol=1e-8)

    def test_finite_conjugate_and_magnification_vs_real_rays(self):
        stack = doublet_stack()
        sys = paraxial_system(stack, MATERIALS, WL)
        z_obj = -60.0
        # two tiny-angle rays from an axial object point -> image crossing
        u = jnp.array([1e-7, 2e-7], jnp.float64)
        p = jnp.zeros((2, 3), jnp.float64).at[:, 2].set(z_obj)
        d = jnp.stack([jnp.zeros_like(u), jnp.sin(u), jnp.cos(u)], axis=1)
        res = trace_sequential(p, d, WL, stack, MATERIALS)
        z_img = axis_crossing_z(res)
        np.testing.assert_allclose(np.asarray(z_img),
                                   float(sys.image_distance(z_obj)),
                                   rtol=1e-7)
        # magnification: tiny off-axis object point, image height at z_img
        h = 1e-7
        p2 = jnp.array([[0.0, h, z_obj]], jnp.float64)
        d2 = jnp.array([[0.0, 0.0, 1.0]], jnp.float64)
        res2 = trace_sequential(p2, d2, WL, stack, MATERIALS,
                                image_z=sys.image_distance(z_obj))
        np.testing.assert_allclose(float(res2.p[0, 1]) / h,
                                   float(sys.magnification(z_obj)),
                                   rtol=1e-6)

    def test_catadioptric_signed_index_vs_real_rays(self):
        # lens into glass, back to air, then a concave mirror: rays return
        # through -z; the signed-index bookkeeping must still place the
        # focus where the real tracer does.
        stack = AsphereStack.make(
            vertex_z=jnp.array([0.0, 0.8, 6.0], jnp.float64),
            c=jnp.array([1 / 20.0, -1 / 25.0, -1 / 30.0]),
            mat_after=jnp.array([1, 0, 0], jnp.int32),
            mirror=jnp.array([False, False, True]),
            dtype=jnp.float64)
        sys = paraxial_system(stack, MATERIALS, WL)
        y0 = 1e-7
        p = jnp.array([[0.0, y0, -1.0]], jnp.float64)
        d = jnp.array([[0.0, 0.0, 1.0]], jnp.float64)
        res = trace_sequential(p, d, WL, stack, MATERIALS)
        assert bool(res.alive[0])
        assert float(res.d[0, 2]) < 0  # really travelling backward
        np.testing.assert_allclose(float(axis_crossing_z(res)[0]),
                                   float(sys.back_focal_point), rtol=1e-8)

    def test_paraxial_trace_table_vs_real_hits(self):
        stack = doublet_stack()
        y0 = 1e-7
        ys, us = paraxial_trace(y0, 0.0, stack, MATERIALS, WL,
                                z_start=-1.0)
        # real ray: heights at each surface = paraxial ys (to first order)
        p = jnp.array([[0.0, y0, -1.0]], jnp.float64)
        d = jnp.array([[0.0, 0.0, 1.0]], jnp.float64)
        # trace surface-by-surface by truncating the stack
        for k in range(stack.n_surfaces):
            sub = jax.tree.map(lambda a: a[:k + 1], stack)
            res = trace_sequential(p, d, WL, sub, MATERIALS)
            np.testing.assert_allclose(float(res.p[0, 1]), float(ys[k]),
                                       rtol=1e-6)
            np.testing.assert_allclose(
                float(res.d[0, 1] / res.d[0, 2]), float(us[k]), rtol=1e-6)


# ----------------------------------------------------------------------
# Seidel sums: every coefficient pinned against real rays
# ----------------------------------------------------------------------

H_AP = 0.5      # marginal semi-aperture of the Seidel test lens
THETA = 0.02    # full-field angle
Z0 = -1.0
RHOS = np.linspace(-1, 1, 21)[1:-1]


def singlet(k=None, coeffs=None):
    """Crown singlet, stop at the front vertex (z=0)."""
    return AsphereStack.make(
        vertex_z=jnp.array([0.0, 1.0], jnp.float64),
        c=jnp.array([1 / 20.0, -1 / 30.0]), k=k, coeffs=coeffs,
        mat_after=jnp.array([2, 0], jnp.int32), dtype=jnp.float64)


def seidel_setup(stack, theta=THETA):
    """Seidel sums + the quantities the real-ray relations need."""
    sys = paraxial_system(stack, MATERIALS, WL)
    bfp = float(sys.back_focal_point)
    marg, chief = (H_AP, 0.0), (theta * Z0, theta)
    S = seidel_sums(stack, MATERIALS, WL, marg, chief, z_start=Z0,
                    chromatic=(486.1, 656.3))
    _, us = paraxial_trace(H_AP, 0.0, stack, MATERIALS, WL, z_start=Z0)
    u_img = float(us[-1])
    n_img = float(sys.n_img)
    ysb, usb = paraxial_trace(chief[0], chief[1], stack, MATERIALS, WL,
                              z_start=Z0)
    yb_img = float(ysb[-1]) + (bfp - float(stack.vertex_z[-1])) * float(
        usb[-1])
    return S, bfp, 2.0 * n_img * u_img, u_img, n_img, yb_img


def meridional_fan(stack, bfp, theta=THETA):
    """Real meridional fan at the full field, launched with slope EXACTLY
    the paraxial slope (d ~ (0, u, 1)); returns landing y per rho."""
    yl = RHOS * H_AP + theta * Z0
    s = np.full(len(RHOS), theta)
    nrm = np.sqrt(1 + s * s)
    p = jnp.stack([np.zeros(len(RHOS)), yl, np.full(len(RHOS), Z0)], axis=1)
    d = jnp.stack([np.zeros(len(RHOS)), s / nrm, 1 / nrm], axis=1)
    res = trace_sequential(p, d, WL, stack, MATERIALS, image_z=bfp)
    assert bool(jnp.all(res.alive))
    return np.asarray(res.p[:, 1])


class TestSeidelVsRealRays:
    """Welford's five sums, the aspheric terms, mirrors, and both color
    sums' relations, each checked against the analytic sequential tracer
    (the calibration protocol is documented in SeidelSums's docstring)."""

    def test_petzval_identity(self):
        stack = singlet()
        S, *_ = seidel_setup(stack)
        np.testing.assert_allclose(
            float(S.S4),
            float(S.H) ** 2 * float(petzval_sum(stack, MATERIALS, WL)),
            rtol=1e-12)

    def test_on_axis_spherical_cubic(self):
        stack = singlet()
        S, bfp, den, *_ = seidel_setup(stack)
        eps = meridional_fan(stack, bfp, theta=0.0)
        a3 = np.polyfit(RHOS, eps, 5)[-4]
        np.testing.assert_allclose(a3, float(S.S1) / den, rtol=1e-4)

    def test_full_field_fan_pins_coma_fieldcurv_distortion(self):
        stack = singlet()
        S, bfp, den, _, _, yb_img = seidel_setup(stack)
        eps = meridional_fan(stack, bfp) - yb_img
        cf = np.polyfit(RHOS, eps, 5)
        a0, a1, a2, a3 = cf[-1], cf[-2], cf[-3], cf[-4]
        np.testing.assert_allclose(a3, float(S.S1) / den, rtol=5e-3)
        np.testing.assert_allclose(a2, 3 * float(S.S2) / den, rtol=5e-3)
        np.testing.assert_allclose(
            a1, (3 * float(S.S3) + float(S.S4)) / den, rtol=5e-3)
        np.testing.assert_allclose(a0, float(S.S5) / den, rtol=5e-3)

    def test_distortion_scales_as_theta_cubed(self):
        stack = singlet()
        deltas = []
        for th in (0.01, 0.02, 0.04):
            S, bfp, den, _, _, yb_img = seidel_setup(stack, theta=th)
            nr = np.sqrt(1 + th * th)
            p = jnp.array([[0.0, th * Z0, Z0]], jnp.float64)
            d = jnp.array([[0.0, th / nr, 1 / nr]], jnp.float64)
            res = trace_sequential(p, d, WL, stack, MATERIALS, image_z=bfp)
            real = float(res.p[0, 1]) - yb_img
            np.testing.assert_allclose(real, float(S.S5) / den, rtol=2e-3)
            deltas.append(real)
        # theta-cubed scaling: x2 in field -> x8 in distortion
        np.testing.assert_allclose(deltas[1] / deltas[0], 8.0, rtol=0.02)
        np.testing.assert_allclose(deltas[2] / deltas[1], 8.0, rtol=0.05)

    @pytest.mark.parametrize("k,a4", [(-2.0, None), (None, 3e-4),
                                      (-2.0, 3e-4)])
    def test_aspheric_figure_terms(self, k, a4):
        kk = None if k is None else jnp.array([k, 0.0])
        cc = None if a4 is None else jnp.array([[a4], [0.0]])
        stack = singlet(k=kk, coeffs=cc)
        S, bfp, den, *_ = seidel_setup(stack)
        eps = meridional_fan(stack, bfp, theta=0.0)
        a3 = np.polyfit(RHOS, eps, 5)[-4]
        np.testing.assert_allclose(a3, float(S.S1) / den, rtol=1e-4)
        # and the aspheric term really changed S1 vs the sphere
        S_sph, *_ = seidel_setup(singlet())
        assert abs(float(S.S1) - float(S_sph.S1)) > 0.2 * abs(
            float(S_sph.S1))

    def test_spherical_mirror_and_exact_parabola(self):
        mir = AsphereStack.make(
            vertex_z=jnp.array([0.0], jnp.float64), c=jnp.array([-0.05]),
            mirror=jnp.array([True]), dtype=jnp.float64)
        S, bfp, den, *_ = seidel_setup(mir)
        eps = meridional_fan(mir, bfp, theta=0.0)
        a3 = np.polyfit(RHOS, eps, 5)[-4]
        np.testing.assert_allclose(a3, float(S.S1) / den, rtol=1e-4)
        # textbook: sphere mirror S1 = (y c)^3 y / ... > 0 here; parabola
        # (k = -1) has exactly zero spherical aberration
        par = AsphereStack.make(
            vertex_z=jnp.array([0.0], jnp.float64), c=jnp.array([-0.05]),
            k=jnp.array([-1.0]), mirror=jnp.array([True]),
            dtype=jnp.float64)
        Sp, bfp_p, *_ = seidel_setup(par)
        assert float(Sp.S1) == 0.0
        eps_p = meridional_fan(par, bfp_p, theta=0.0)
        assert np.max(np.abs(eps_p)) < 1e-12  # machine-exact focus

    def test_axial_color_matches_c1(self):
        stack = singlet()
        S, _, _, u_img, n_img, _ = seidel_setup(stack)
        curve = axial_color(stack, MATERIALS,
                            jnp.array([486.1, 656.3], jnp.float64))
        dz = float(curve[0] - curve[1])
        np.testing.assert_allclose(
            dz, -float(S.C1) / (n_img * u_img ** 2), rtol=1e-2)

    def test_astigmatic_foci_thirdorder(self):
        # algebraic tangential/sagittal focus from +-rho ray crossings
        stack = singlet()
        S, bfp, _, u_img, n_img, _ = seidel_setup(stack)
        rho = 0.15
        nr = np.sqrt(1 + THETA ** 2)
        # tangential pair (y pupil)
        ylt = np.array([rho, -rho]) * H_AP + THETA * Z0
        p_t = jnp.stack([np.zeros(2), ylt, np.full(2, Z0)], axis=1)
        d_ = jnp.broadcast_to(jnp.array([0.0, THETA / nr, 1 / nr]), (2, 3))
        rt = trace_sequential(p_t, d_, WL, stack, MATERIALS)
        y_, z_, sy = (np.asarray(rt.p[:, 1]), np.asarray(rt.p[:, 2]),
                      np.asarray(rt.d[:, 1] / rt.d[:, 2]))
        z_tan = (y_[1] - y_[0] - z_[1] * sy[1] + z_[0] * sy[0]) / (
            sy[0] - sy[1])
        # sagittal pair (x pupil)
        p_s = jnp.stack([np.array([rho, -rho]) * H_AP,
                         np.full(2, THETA * Z0), np.full(2, Z0)], axis=1)
        rs = trace_sequential(p_s, d_, WL, stack, MATERIALS)
        x_, zz_, sx = (np.asarray(rs.p[:, 0]), np.asarray(rs.p[:, 2]),
                       np.asarray(rs.d[:, 0] / rs.d[:, 2]))
        z_sag = (x_[1] - x_[0] - zz_[1] * sx[1] + zz_[0] * sx[0]) / (
            sx[0] - sx[1])
        dd = 2 * n_img * u_img ** 2
        np.testing.assert_allclose(
            z_tan - bfp, -(3 * float(S.S3) + float(S.S4)) / dd, rtol=0.05)
        np.testing.assert_allclose(
            z_sag - bfp, -(float(S.S3) + float(S.S4)) / dd, rtol=0.05)

    def test_per_surface_table_sums_to_totals(self):
        stack = doublet_stack()
        S, *_ = seidel_setup(stack)
        tot = np.asarray(jnp.sum(S.per_surface, axis=0))
        np.testing.assert_allclose(
            tot[:5], [float(x) for x in (S.S1, S.S2, S.S3, S.S4, S.S5)],
            rtol=1e-12)

    def test_jit_matches_eager(self):
        stack = singlet()
        args = (stack, MATERIALS, WL, (H_AP, 0.0), (THETA * Z0, THETA))
        eager = seidel_sums(*args, z_start=Z0)
        jitted = jax.jit(lambda st: seidel_sums(
            st, MATERIALS, WL, (H_AP, 0.0), (THETA * Z0, THETA),
            z_start=Z0).S1)(stack)
        np.testing.assert_allclose(float(jitted), float(eager.S1))


# ----------------------------------------------------------------------
# stop / pupil solves
# ----------------------------------------------------------------------

class TestSolveStop:
    def test_stop_at_front_surface_reproduces_hand_rays(self):
        stack = singlet()
        sol = solve_stop(stack, MATERIALS, WL, stop_index=0,
                         aperture=H_AP, field_angle=THETA, z_start=Z0)
        np.testing.assert_allclose(float(sol.marginal[0]), H_AP)
        np.testing.assert_allclose(float(sol.chief[0]), THETA * Z0,
                                   rtol=1e-12)
        # pupils of a front-surface stop: EP is the stop plane itself
        np.testing.assert_allclose(float(sol.entrance_pupil), 0.0,
                                   atol=1e-12)
        # and the Seidel sums match the hand-built protocol exactly
        S_auto = seidel_sums(stack, MATERIALS, WL, sol.marginal,
                             sol.chief, z_start=Z0)
        S_hand = seidel_sums(stack, MATERIALS, WL, (H_AP, 0.0),
                             (THETA * Z0, THETA), z_start=Z0)
        for f in ("S1", "S2", "S3", "S4", "S5"):
            np.testing.assert_allclose(float(getattr(S_auto, f)),
                                       float(getattr(S_hand, f)),
                                       rtol=1e-12)

    def test_internal_stop_entrance_pupil_is_stop_conjugate(self):
        # stop at the SECOND surface of a thick lens: the entrance pupil
        # must be the plane whose image through the front subsystem is the
        # stop plane.
        stack = lens_stack(10.0, -15.0, 2.0)
        sol = solve_stop(stack, MATERIALS, WL, stop_index=1,
                         aperture=0.3, field_angle=0.01, z_start=-1.0)
        front = jax.tree.map(lambda a: a[:1], stack)
        sub = paraxial_system(front, MATERIALS, WL)
        z_stop_img = float(sub.image_distance(sol.entrance_pupil))
        np.testing.assert_allclose(z_stop_img, float(stack.vertex_z[1]),
                                   rtol=1e-9)
        # chief really crosses the stop center (real paraxial trace)
        ys, _ = paraxial_trace(sol.chief[0], sol.chief[1], stack,
                               MATERIALS, WL, z_start=-1.0)
        assert abs(float(ys[1])) < 1e-14

    def test_front_focal_stop_is_image_telecentric(self):
        # a stop (plane dummy surface) at the front focal plane of a thin
        # lens makes image space telecentric: exit chief parallel to axis,
        # exit pupil at infinity.
        r1, r2 = 12.0, -12.0
        lens_z = 5.0
        thin = lens_stack(r1, r2, 1e-9, z0=lens_z)
        f = float(paraxial_system(thin, MATERIALS, WL).efl)
        stop_z = lens_z - f
        stack = AsphereStack.make(
            vertex_z=jnp.array([stop_z, lens_z, lens_z + 1e-9],
                               jnp.float64),
            c=jnp.array([0.0, 1.0 / r1, 1.0 / r2]),
            mat_after=jnp.array([0, 1, 0], jnp.int32), dtype=jnp.float64)
        sol = solve_stop(stack, MATERIALS, WL, stop_index=0,
                         aperture=0.3, field_angle=0.02,
                         z_start=stop_z - 1.0)
        ys, us = paraxial_trace(sol.chief[0], sol.chief[1], stack,
                                MATERIALS, WL, z_start=stop_z - 1.0)
        assert abs(float(us[-1])) < 1e-10   # telecentric exit
        # pupil at (numerical) infinity: inf if the slope rounded to zero,
        # else astronomically far compared to the system scale
        xp = float(sol.exit_pupil)
        assert (not np.isfinite(xp)) or abs(xp) > 1e6

    def test_solve_stop_jits(self):
        stack = singlet()
        z_ep = jax.jit(lambda st: solve_stop(
            st, MATERIALS, WL, stop_index=0, aperture=H_AP,
            field_angle=THETA, z_start=Z0).entrance_pupil)(stack)
        np.testing.assert_allclose(float(z_ep), 0.0, atol=1e-12)


# ----------------------------------------------------------------------
# differentiability / transforms
# ----------------------------------------------------------------------

class TestTransforms:
    def test_grad_of_efl_matches_finite_difference(self):
        def efl_of_c1(c1):
            stack = AsphereStack.make(
                vertex_z=jnp.array([0.0, 2.0], jnp.float64),
                c=jnp.stack([c1, jnp.asarray(-0.05, jnp.float64)]),
                mat_after=jnp.array([1, 0], jnp.int32), dtype=jnp.float64)
            return paraxial_system(stack, MATERIALS, WL).efl

        c1 = jnp.asarray(0.08, jnp.float64)
        g = jax.grad(efl_of_c1)(c1)
        eps = 1e-6
        fd = (efl_of_c1(c1 + eps) - efl_of_c1(c1 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-6)

    def test_jit_matches_eager(self):
        stack = doublet_stack()
        eager = paraxial_system(stack, MATERIALS, WL)
        jitted = jax.jit(
            lambda s: paraxial_system(s, MATERIALS, WL).back_focal_point
        )(stack)
        np.testing.assert_allclose(float(jitted),
                                   float(eager.back_focal_point))

    def test_axial_color_matches_per_wavelength_loop(self):
        stack = doublet_stack()
        wls = jnp.array([486.1, 587.6, 656.3], jnp.float64)
        curve = axial_color(stack, MATERIALS, wls)
        for i, wl in enumerate(np.asarray(wls)):
            np.testing.assert_allclose(
                float(curve[i]),
                float(paraxial_system(stack, MATERIALS,
                                      float(wl)).back_focal_point))

    def test_seidel_grad_finite_and_matches_fd(self):
        def s1_of_c1(c1):
            st = AsphereStack.make(
                vertex_z=jnp.array([0.0, 1.0], jnp.float64),
                c=jnp.stack([c1, jnp.asarray(-1 / 30.0, jnp.float64)]),
                mat_after=jnp.array([2, 0], jnp.int32), dtype=jnp.float64)
            return seidel_sums(st, MATERIALS, WL, (0.5, 0.0),
                               (-0.02, 0.02), z_start=-1.0).S1

        c1 = jnp.asarray(1 / 20.0, jnp.float64)
        g = jax.grad(s1_of_c1)(c1)
        eps = 1e-6
        fd = (s1_of_c1(c1 + eps) - s1_of_c1(c1 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)

    def test_doublet_reduces_axial_color_vs_singlet(self):
        # sanity: the crown/flint doublet's C-F focal split is smaller than
        # an equal-power crown singlet's (the reason doublets exist)
        stack = doublet_stack()
        wls = jnp.array([486.1, 656.3], jnp.float64)
        split_doublet = float(jnp.abs(jnp.diff(
            axial_color(stack, MATERIALS, wls))[0]))
        sys = paraxial_system(stack, MATERIALS, 587.6)
        f = float(sys.efl)
        n_d = float(mats.crown_glass(jnp.asarray(587.6)))
        r = 2.0 * (n_d - 1.0) * f  # equiconvex singlet, same EFL
        singlet = AsphereStack.make(
            vertex_z=jnp.array([0.0, 1e-9], jnp.float64),
            c=jnp.array([1.0 / r, -1.0 / r]),
            mat_after=jnp.array([2, 0], jnp.int32), dtype=jnp.float64)
        split_singlet = float(jnp.abs(jnp.diff(
            axial_color(singlet, MATERIALS, wls))[0]))
        assert split_doublet < 0.5 * split_singlet


# ----------------------------------------------------------------------
# lateral color + real-ray field curves
# ----------------------------------------------------------------------

class TestLateralColor:
    def test_matches_seidel_c2(self):
        # crown/flint doublet with real dispersion: the short-minus-long
        # chief height difference is C2 / (n' u') to first order in dn
        stack = doublet_stack()
        sol = solve_stop(stack, MATERIALS, WL, stop_index=0, aperture=1.0,
                         field_angle=0.05, z_start=Z0)
        S, bfp, _, u_img, n_img, _ = seidel_setup(stack, theta=0.05)
        wls = jnp.array([486.1, 656.3], jnp.float64)
        lc = lateral_color(stack, MATERIALS, wls, sol.chief, Z0, bfp)
        dy = float(lc[0] - lc[1])
        np.testing.assert_allclose(dy, float(S.C2) / (n_img * u_img),
                                   rtol=1e-2)

    def test_zero_for_constant_index_glass(self):
        stack = singlet()  # crown glass -- replace with dispersion-free
        flat = AsphereStack.make(
            vertex_z=stack.vertex_z, c=stack.c,
            mat_after=jnp.array([1, 0], jnp.int32), dtype=jnp.float64)
        sys = paraxial_system(flat, MATERIALS, WL)
        wls = jnp.array([486.1, 550.0, 656.3], jnp.float64)
        lc = lateral_color(flat, MATERIALS, wls, (THETA * Z0, THETA), Z0,
                           sys.back_focal_point)
        np.testing.assert_allclose(np.diff(np.asarray(lc)), 0.0, atol=1e-15)


class TestFieldCurves:
    def test_astigmatic_foci_match_seidel(self):
        stack = singlet()
        S, bfp, dd, u_img, n_img, _ = seidel_setup(stack)
        fc = field_curves(stack, MATERIALS, WL, stop_index=0,
                          aperture=H_AP, field_angles=THETA,
                          z_start=Z0, rho=0.15)
        np.testing.assert_allclose(float(fc.z_image), bfp, rtol=1e-12)
        np.testing.assert_allclose(
            float(fc.tangential[0]) - bfp,
            -(3 * float(S.S3) + float(S.S4)) / (dd * u_img), rtol=0.05)
        np.testing.assert_allclose(
            float(fc.sagittal[0]) - bfp,
            -(float(S.S3) + float(S.S4)) / (dd * u_img), rtol=0.05)

    def test_field_curves_scale_quadratically(self):
        stack = singlet()
        fc = field_curves(stack, MATERIALS, WL, stop_index=0,
                          aperture=H_AP,
                          field_angles=jnp.array([0.0, THETA / 2, THETA]),
                          z_start=Z0, rho=0.15)
        # shifts measured from the SAME-rho axial focus (removes the
        # spherical-aberration offset of the finite-rho pair)
        t = np.asarray(fc.tangential)
        s = np.asarray(fc.sagittal)
        np.testing.assert_allclose((t[2] - t[0]) / (t[1] - t[0]), 4.0,
                                   rtol=0.07)
        np.testing.assert_allclose((s[2] - s[0]) / (s[1] - s[0]), 4.0,
                                   rtol=0.07)
        # on axis the tangential and sagittal pairs focus together
        np.testing.assert_allclose(t[0], s[0], rtol=1e-9)

    def test_distortion_matches_s5_and_theta_cubed(self):
        stack = singlet()
        S, bfp, dd, *_ = seidel_setup(stack)
        fc = field_curves(stack, MATERIALS, WL, stop_index=0,
                          aperture=H_AP,
                          field_angles=jnp.array([0.0, THETA / 2, THETA]),
                          z_start=Z0, rho=0.05)
        d_abs = np.asarray(fc.chief_height - fc.paraxial_height)
        np.testing.assert_allclose(d_abs[2], float(S.S5) / dd, rtol=5e-3)
        # absolute distortion ~ theta^3: x8 per field doubling
        np.testing.assert_allclose(d_abs[2] / d_abs[1], 8.0, rtol=0.02)
        assert float(fc.distortion[0]) == 0.0

    def test_internal_stop_chief_passes_stop_center(self):
        stack = doublet_stack()
        fc = field_curves(stack, MATERIALS, WL, stop_index=1,
                          aperture=0.3, field_angles=0.03, z_start=Z0,
                          rho=0.1)
        # re-derive the chief launch height the function used and confirm
        # the PARAXIAL chief crosses the stop surface center
        ys_a, _ = paraxial_trace(1.0, 0.0, stack, MATERIALS, WL,
                                 z_start=Z0)
        ys_b, _ = paraxial_trace(0.0, 0.03, stack, MATERIALS, WL,
                                 z_start=Z0)
        y0_chief = -float(ys_b[1]) / float(ys_a[1])
        ys, _ = paraxial_trace(y0_chief, 0.03, stack, MATERIALS, WL,
                               z_start=Z0)
        assert abs(float(ys[1])) < 1e-14
        assert np.all(np.isfinite(np.asarray(fc.tangential)))

    def test_field_curves_jit_and_grad(self):
        stack = singlet()

        def tan_shift(c0):
            st = AsphereStack.make(
                vertex_z=stack.vertex_z,
                c=stack.c.at[0].set(c0),
                mat_after=jnp.array([2, 0], jnp.int32), dtype=jnp.float64)
            fc = field_curves(st, MATERIALS, WL, stop_index=0,
                              aperture=H_AP, field_angles=THETA,
                              z_start=Z0, rho=0.1)
            return fc.tangential[0] - fc.z_image

        eager = float(tan_shift(jnp.asarray(1 / 20.0, jnp.float64)))
        jitted = float(jax.jit(tan_shift)(jnp.asarray(1 / 20.0,
                                                      jnp.float64)))
        np.testing.assert_allclose(jitted, eager, rtol=1e-12)
        g = float(jax.grad(tan_shift)(jnp.asarray(1 / 20.0, jnp.float64)))
        assert np.isfinite(g) and g != 0.0


# ----------------------------------------------------------------------
# Gaussian (TEM00) beam propagation
# ----------------------------------------------------------------------

LAM_MM = WL * 1e-6


class TestGaussianBeam:
    def thin_lens(self, f=10.0, z0=5.0):
        r = 2.0 * (N_GLASS - 1.0) * f
        return AsphereStack.make(
            vertex_z=jnp.array([z0, z0 + 1e-9], jnp.float64),
            c=jnp.array([1.0 / r, -1.0 / r]),
            mat_after=jnp.array([1, 0], jnp.int32), dtype=jnp.float64)

    def test_focal_plane_to_focal_plane_transform(self):
        # waist at F -> waist at F' with w0' = lambda f / (pi w0)
        stack = self.thin_lens()
        sys = paraxial_system(stack, MATERIALS, WL)
        w0 = 0.05
        b = gaussian_beam(stack, MATERIALS, WL, w0,
                          sys.front_focal_point)
        np.testing.assert_allclose(float(b.z_waist),
                                   float(sys.back_focal_point), rtol=1e-12)
        np.testing.assert_allclose(
            float(b.waist), LAM_MM * float(sys.efl) / (np.pi * w0),
            rtol=1e-12)

    def test_geometric_limit_is_paraxial_imaging(self):
        # as w0 -> 0 the output waist sits at the paraxial image with
        # |magnification| * w0 size
        stack = self.thin_lens()
        sys = paraxial_system(stack, MATERIALS, WL)
        z_obj = -20.0
        w0 = 1e-5
        b = gaussian_beam(stack, MATERIALS, WL, w0, z_obj)
        np.testing.assert_allclose(float(b.z_waist),
                                   float(sys.image_distance(z_obj)),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(b.waist) / w0,
                                   abs(float(sys.magnification(z_obj))),
                                   rtol=1e-6)

    def test_plane_interface_apparent_depth(self):
        # a beam converging toward a waist depth d past a plane interface
        # into glass forms it at n*d instead (and zR scales by n)
        plane = AsphereStack.make(
            vertex_z=jnp.array([0.0], jnp.float64), c=jnp.array([0.0]),
            mat_after=jnp.array([1], jnp.int32), dtype=jnp.float64)
        b = gaussian_beam(plane, MATERIALS, WL, 1e-4, 2.0)
        np.testing.assert_allclose(float(b.z_waist), N_GLASS * 2.0,
                                   rtol=1e-9)
        free = np.pi * 1e-4 ** 2 / LAM_MM
        np.testing.assert_allclose(float(b.rayleigh), N_GLASS * free,
                                   rtol=1e-9)
        np.testing.assert_allclose(float(b.waist), 1e-4, rtol=1e-12)

    def test_mirror_beam_focus(self):
        # collimated-ish beam (huge zR) onto a concave mirror: the waist
        # forms at the mirror focus, traveling backward
        mirror = AsphereStack.make(
            vertex_z=jnp.array([10.0], jnp.float64),
            c=jnp.array([-1 / 30.0]),
            mat_after=jnp.array([0], jnp.int32),
            mirror=jnp.array([True]), dtype=jnp.float64)
        sys = paraxial_system(mirror, MATERIALS, WL)
        b = gaussian_beam(mirror, MATERIALS, WL, 5.0, 0.0)
        np.testing.assert_allclose(float(b.z_waist),
                                   float(sys.back_focal_point), rtol=1e-4)
        assert float(b.z_waist) < 10.0  # really in front of the mirror

    def test_width_hyperbola_and_divergence(self):
        stack = self.thin_lens()
        b = gaussian_beam(stack, MATERIALS, WL, 0.05, -5.0)
        np.testing.assert_allclose(
            float(b.width(b.z_waist + b.rayleigh)) / float(b.waist),
            np.sqrt(2.0), rtol=1e-12)
        np.testing.assert_allclose(
            float(b.divergence),
            LAM_MM / (np.pi * float(b.waist)), rtol=1e-12)
        # far field: w(z) -> divergence * (z - z_waist)
        zfar = float(b.z_waist) + 1e5
        np.testing.assert_allclose(
            float(b.width(zfar)),
            float(b.divergence) * (zfar - float(b.z_waist)), rtol=1e-6)

    def test_jit_grad_mode_matching(self):
        # mode matching as a differentiable objective: d(waist z)/d(c1)
        stack = self.thin_lens()

        def out_waist_z(c0):
            st = AsphereStack.make(
                vertex_z=stack.vertex_z, c=stack.c.at[0].set(c0),
                mat_after=jnp.array([1, 0], jnp.int32), dtype=jnp.float64)
            return gaussian_beam(st, MATERIALS, WL, 0.05, -5.0).z_waist

        c0 = stack.c[0]
        eager = float(out_waist_z(c0))
        np.testing.assert_allclose(float(jax.jit(out_waist_z)(c0)), eager,
                                   rtol=1e-12)
        g = float(jax.grad(out_waist_z)(c0))
        fd = (float(out_waist_z(c0 + 1e-7)) -
              float(out_waist_z(c0 - 1e-7))) / 2e-7
        np.testing.assert_allclose(g, fd, rtol=1e-5)
