"""The even-asphere sag model, shared by every surface that uses it.

One canonical implementation of the industry-standard rotationally
symmetric even-asphere sag

    sag(r) = c r^2 / (1 + sqrt(1 - (1+k) c^2 r^2)) + a4 r^4 + a6 r^6 + ...

as a function of ``u = r^2``, plus its analytic radial derivative
``d(sag)/du``.  Consumed by the tessellated parametric boundaries
(``models.boundaries.ParametricAsphereBoundary`` / ``...Segment``) and by
the analytic sequential tracer (``sequential.py``) so the two engines can
never drift on the guard constant or the polynomial convention (ADVICE r4).

The conic radicand is clamped from below (1e-8) so points past the conic's
natural aperture (where ``(1+k) c^2 r^2 > 1``) produce finite values and
finite gradients instead of NaN -- the same guarded-sqrt discipline as the
reference's safe divides (/root/reference/tfrt/geometry.py:44-52).

``coeffs`` carries the even polynomial coefficients ``a4, a6, ...``
(starting at r^4; the r^2 term is absorbed into the curvature) with a
STATIC trailing length, possibly 0, so XLA sees a fixed fused Horner
polynomial.
"""

from __future__ import annotations

import jax.numpy as jnp

RADICAND_FLOOR = 1e-8


def sag(u, c, k, coeffs):
    """Even-asphere sag at ``u = r^2``; broadcasts over every argument."""
    dtype = jnp.asarray(u).dtype
    rad = 1.0 - (1.0 + k) * (c * c) * u
    rad = jnp.maximum(rad, jnp.asarray(RADICAND_FLOOR, dtype))
    s = c * u / (1.0 + jnp.sqrt(rad))
    n_a = coeffs.shape[-1]
    if n_a:
        poly = coeffs[..., n_a - 1]
        for i in range(n_a - 2, -1, -1):
            poly = poly * u + coeffs[..., i]
        s = s + poly * u * u
    return s


def sag_du(u, c, k, coeffs):
    """Analytic ``d(sag)/du``.  With ``s = sqrt(1 - (1+k) c^2 u)``::

        d/du [c u / (1+s)] = c/(1+s) + c u (1+k) c^2 / (2 s (1+s)^2)

    plus ``sum (i+2) a_i u^(i+1)`` for the polynomial tail."""
    dtype = jnp.asarray(u).dtype
    rad = 1.0 - (1.0 + k) * (c * c) * u
    rad = jnp.maximum(rad, jnp.asarray(RADICAND_FLOOR, dtype))
    s = jnp.sqrt(rad)
    one_p_s = 1.0 + s
    d = c / one_p_s + c * u * (1.0 + k) * (c * c) / (2.0 * s * one_p_s ** 2)
    n_a = coeffs.shape[-1]
    if n_a:
        dp = (n_a + 1) * coeffs[..., n_a - 1]
        for i in range(n_a - 2, -1, -1):
            dp = dp * u + (i + 2) * coeffs[..., i]
        d = d + dp * u
    return d
