"""Damped least squares (lsq.lm_solve): textbook problems + a lens design.

The classical optimizer every production lens-design code uses; beyond the
reference (its dev scripts only ever ran first-order SGD/Adam).  Pins:
exactness on linear least squares, Rosenbrock convergence, Marquardt
scaling invariance, pytree params, insensitive-variable robustness, jit,
and a real best-form-singlet design whose converged shape factor matches
the thin-lens third-order prediction q = 2(n^2-1)/(n+2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu.lsq import lm_solve
from tensorflowraytrace_tpu.ops.materials import crown_glass, vacuum
from tensorflowraytrace_tpu.paraxial import paraxial_system
from tensorflowraytrace_tpu.sequential import (
    AsphereStack, collimated_bundle, trace_sequential,
)


class TestLinear:
    def test_exact_on_linear_least_squares(self, rng):
        A = jnp.asarray(rng.normal(size=(12, 3)))
        b = jnp.asarray(rng.normal(size=(12,)))
        x_star, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)

        res = lm_solve(lambda x: A @ x - b, jnp.zeros(3), steps=6)
        np.testing.assert_allclose(np.asarray(res.params), x_star,
                                   atol=1e-10)
        r_star = A @ jnp.asarray(x_star) - b
        np.testing.assert_allclose(float(res.cost),
                                   0.5 * float(r_star @ r_star), rtol=1e-12)
        # optimality: J^T r == 0 at the least-squares solution
        assert float(res.grad_norm) < 1e-9

    def test_history_monotone_nonincreasing(self, rng):
        A = jnp.asarray(rng.normal(size=(8, 2)))
        b = jnp.asarray(rng.normal(size=(8,)))
        res = lm_solve(lambda x: A @ x - b, jnp.ones(2), steps=10)
        hist = np.asarray(res.cost_history)
        assert np.all(np.diff(hist) <= 1e-15)

    def test_marquardt_scaling_handles_bad_conditioning(self):
        # variables differing by 1e6 in natural scale: Marquardt's
        # diag(J^T J) damping makes the step unit-invariant
        scales = jnp.asarray([1.0, 1e-6])
        target = jnp.asarray([1.0, 1.0])

        def resid(x):
            return scales * x - target

        res = lm_solve(resid, jnp.zeros(2), steps=10, marquardt=True)
        np.testing.assert_allclose(np.asarray(res.params), [1.0, 1e6],
                                   rtol=1e-8)

    def test_insensitive_variable_does_not_break_solve(self):
        # the residual ignores x[1] entirely (zero Jacobian column); the
        # diagonal floor keeps the normal equations solvable
        def resid(x):
            return jnp.atleast_1d(x[0] - 2.0)

        res = lm_solve(resid, jnp.zeros(2), steps=8)
        assert np.isfinite(np.asarray(res.params)).all()
        np.testing.assert_allclose(float(res.params[0]), 2.0, atol=1e-10)


class TestNonlinear:
    def test_rosenbrock(self):
        def resid(x):
            return jnp.stack([1.0 - x[0], 10.0 * (x[1] - x[0] ** 2)])

        res = lm_solve(resid, jnp.asarray([-1.2, 1.0]), steps=60)
        np.testing.assert_allclose(np.asarray(res.params), [1.0, 1.0],
                                   atol=1e-8)
        assert float(res.cost) < 1e-16

    def test_pytree_params_and_residuals(self):
        def resid(p):
            return {"a": p["a"] - jnp.asarray([1.0, 2.0]),
                    "b": jnp.atleast_1d(p["b"] - 3.0)}

        p0 = {"a": jnp.zeros(2), "b": jnp.asarray(0.0)}
        res = lm_solve(resid, p0, steps=6)
        assert set(res.params) == {"a", "b"}
        np.testing.assert_allclose(np.asarray(res.params["a"]), [1.0, 2.0],
                                   atol=1e-10)
        np.testing.assert_allclose(float(res.params["b"]), 3.0, atol=1e-10)

    def test_extra_args_passed_through(self):
        def resid(x, a, b):
            return a * x - b

        res = lm_solve(resid, jnp.zeros(2), jnp.asarray([2.0, 4.0]),
                       jnp.asarray([2.0, 8.0]), steps=6)
        np.testing.assert_allclose(np.asarray(res.params), [1.0, 2.0],
                                   atol=1e-10)

    def test_jit_wrappable(self):
        def resid(x):
            return jnp.stack([x[0] - 1.0, x[1] + 2.0, x[0] * x[1] + 2.0])

        solve = jax.jit(lambda x0: lm_solve(resid, x0, steps=20))
        res = solve(jnp.zeros(2))
        np.testing.assert_allclose(np.asarray(res.params), [1.0, -2.0],
                                   atol=1e-8)


class TestLensDesign:
    """Best-form singlet: LM drives an f/10 singlet's two curvatures to the
    minimum-spherical shape while pinning EFL = 50 mm through a weighted
    first-order residual row — the canonical DLS merit construction."""

    WL = 587.6
    EFL = 50.0

    @staticmethod
    def _stack(c):
        return AsphereStack.make(
            vertex_z=jnp.asarray([0.0, 3.0]), c=c,
            aperture=jnp.asarray([8.0, 8.0]),
            mat_after=jnp.asarray([1, 0]), dtype=jnp.float64)

    @classmethod
    def _resid(cls, c):
        mats = [vacuum, crown_glass]
        stack = cls._stack(c)
        ps = paraxial_system(stack, mats, cls.WL)
        p, d = collimated_bundle(15, 2.5, z_start=-5.0, dtype=jnp.float64)
        r = trace_sequential(p, d, cls.WL, stack, mats,
                             image_z=ps.back_focal_point)
        # transverse ray aberrations (mm) + a hard-weighted EFL target
        return jnp.concatenate([
            r.p[:, 1] * jnp.where(r.alive, 1.0, 0.0),
            jnp.atleast_1d(100.0 * (ps.efl - cls.EFL)),
        ])

    def test_best_form_singlet(self):
        n = float(crown_glass(jnp.asarray(self.WL)))
        # start at an equiconvex lens of roughly the right power
        c0 = jnp.asarray([0.02, -0.02], jnp.float64)
        cost0 = 0.5 * float(jnp.sum(self._resid(c0) ** 2))
        res = lm_solve(self._resid, c0, steps=25)
        assert bool(np.asarray(res.accepted).any())
        assert float(res.cost) < cost0 * 1e-2

        c1, c2 = float(res.params[0]), float(res.params[1])
        mats = [vacuum, crown_glass]
        ps = paraxial_system(self._stack(res.params), mats, self.WL)
        assert abs(float(ps.efl) - self.EFL) < 1e-3

        # thin-lens third-order minimum-spherical shape factor (object at
        # infinity): q = (c1 + c2)/(c1 - c2) = 2(n^2 - 1)/(n + 2); the
        # 3 mm thickness shifts the real optimum by a few hundredths
        q = (c1 + c2) / (c1 - c2)
        q_thin = 2.0 * (n * n - 1.0) / (n + 2.0)
        assert abs(q - q_thin) < 0.15, (q, q_thin)

        # the converged fan beats the equiconvex start by a wide margin
        def rms_spot(c):
            stack = self._stack(c)
            ps = paraxial_system(stack, mats, self.WL)
            p, d = collimated_bundle(15, 2.5, z_start=-5.0,
                                     dtype=jnp.float64)
            r = trace_sequential(p, d, self.WL, stack, mats,
                                 image_z=ps.back_focal_point)
            return float(jnp.sqrt(jnp.mean(r.p[:, 1] ** 2)))

        assert rms_spot(res.params) < 0.3 * rms_spot(c0)


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-n", "0"])
