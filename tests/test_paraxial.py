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
    axial_color, paraxial_system, paraxial_trace, petzval_sum,
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
