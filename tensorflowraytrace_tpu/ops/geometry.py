"""Core geometric kernels: intersection tests and Snell's law, in pure jnp.

TPU-native re-implementation of the reference geometry layer
(/root/reference/tfrt/geometry.py).  Functional parity targets, with citations
to the reference implementation:

* ``raw_line_intersect``       <- geometry.py:96   (2D infinite-line x line)
* ``line_intersect``           <- geometry.py:27   (N x M wrapper)
* ``raw_line_circle_intersect``<- geometry.py:420  (2D line x circle, +/- branches)
* ``line_circle_intersect``    <- geometry.py:338
* ``raw_line_triangle_intersect`` <- geometry.py:275 (Cramer's rule solve)
* ``line_triangle_intersect``  <- geometry.py:191
* ``snells_law_2D``            <- geometry.py:565  (angle form, TIR + mirror)
* ``snells_law_3D``            <- geometry.py:671  (vector form, GA-raytracer note)
* ``angle_in_interval``        <- geometry.py:766  (wraparound-safe membership)

Differences from the reference, by design:

* jnp broadcasting instead of ``tf.meshgrid`` materialization -- the N x M
  wrappers reshape to ``(M, 1)`` x ``(N,)`` and let XLA fuse, so no
  intermediate endpoint grids hit HBM.
* dtype-agnostic (float32 on TPU, float64 for CPU parity tests); the
  default epsilon is derived from the input dtype.
* The "safe divide" discipline (mask the denominator BEFORE dividing so the
  backward pass never sees inf/nan -- geometry.py:142-158) is preserved
  exactly; it is load-bearing for gradients through invalid intersections.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tensorflowraytrace_tpu.config import default_epsilon

PI = math.pi


def _eps(epsilon, ref):
    if epsilon is None:
        return jnp.asarray(default_epsilon(ref.dtype), dtype=ref.dtype)
    return jnp.asarray(epsilon, dtype=ref.dtype)


# ======================================================================
# line x line (2D)
# ======================================================================

def raw_line_intersect(x1s, y1s, x1e, y1e, x2s, y2s, x2e, y2e, epsilon=None):
    """Infinite-line/line intersection on co-broadcastable inputs.

    Returns ``(x, y, valid, u, v)``: intersection point, validity (False where
    the lines are parallel), and the line parameters along line-set 1 / 2.
    Mirrors geometry.py:96-167 including the safe-denominator trick.
    """
    dt = jnp.result_type(x1s, y1s, x1e, y1e, x2s, y2s, x2e, y2e)
    x1s, y1s, x1e, y1e, x2s, y2s, x2e, y2e = (
        a.astype(dt)
        for a in jnp.broadcast_arrays(x1s, y1s, x1e, y1e, x2s, y2s, x2e, y2e))
    epsilon = _eps(epsilon, x1s)

    x1 = x1e - x1s
    y1 = y1e - y1s
    x2 = x2e - x2s
    y2 = y2e - y2s
    denominator = x1 * y2 - y1 * x2

    valid = jnp.abs(denominator) >= epsilon
    safe_value = jnp.ones_like(denominator)
    inv_den = 1.0 / jnp.where(valid, denominator, safe_value)

    u = jnp.where(valid, (x2 * (y1s - y2s) - y2 * (x1s - x2s)) * inv_den, safe_value)
    v = jnp.where(valid, (y1 * (x2s - x1s) - x1 * (y2s - y1s)) * inv_den, safe_value)
    x = x1s + u * x1
    y = y1s + u * y1
    return x, y, valid, u, v


def line_intersect(x1s, y1s, x1e, y1e, x2s, y2s, x2e, y2e, epsilon=None):
    """All N x M intersections between N lines (set 1) and M lines (set 2).

    Output shape ``(M, N)`` to match the reference convention
    (geometry.py:27-78: ``tf.meshgrid`` 'xy' puts the second set on axis 0).
    """
    b = lambda a: jnp.asarray(a)[None, :]     # (1, N) first set
    s = lambda a: jnp.asarray(a)[:, None]     # (M, 1) second set
    return raw_line_intersect(
        b(x1s), b(y1s), b(x1e), b(y1e), s(x2s), s(y2s), s(x2e), s(y2e), epsilon
    )


# ======================================================================
# line x triangle (3D)
# ======================================================================

def raw_line_triangle_intersect(
    rx1, ry1, rz1, rx2, ry2, rz2, xp, yp, zp, x1, y1, z1, x2, y2, z2, epsilon=None
):
    """Cramer's-rule line/triangle solve on co-broadcastable inputs.

    Returns ``(x, y, z, valid, ray_u, trig_u, trig_v)``.  Exactly the algebra
    of geometry.py:275-320 (valid is False where ray is parallel to the
    triangle's plane; barycentric pruning is the caller's job, as in
    engine.py:1138-1141).
    """
    dt = jnp.result_type(rx1, ry1, rz1, rx2, ry2, rz2, xp, yp, zp,
                         x1, y1, z1, x2, y2, z2)
    rx1, ry1, rz1, rx2, ry2, rz2, xp, yp, zp, x1, y1, z1, x2, y2, z2 = (
        a.astype(dt)
        for a in jnp.broadcast_arrays(
            rx1, ry1, rz1, rx2, ry2, rz2, xp, yp, zp, x1, y1, z1, x2, y2, z2
        )
    )
    epsilon = _eps(epsilon, rx1)

    a = rx1 - rx2
    b = x1 - xp
    c = x2 - xp
    d = ry1 - ry2
    f = y1 - yp
    g = y2 - yp
    h = rz1 - rz2
    k = z1 - zp
    l = z2 - zp

    q = rx1 - xp
    r = ry1 - yp
    s = rz1 - zp

    denominator = a * g * k + b * d * l + c * f * h - a * f * l - b * g * h - c * d * k
    ray_u_num = b * l * r + c * f * s + g * k * q - b * g * s - c * k * r - f * l * q
    trig_u_num = a * g * s + c * h * r + d * l * q - a * l * r - c * d * s - g * h * q
    trig_v_num = a * k * r + b * d * s + f * h * q - a * f * s - b * h * r - d * k * q

    valid = jnp.abs(denominator) >= epsilon
    inv_den = 1.0 / jnp.where(valid, denominator, jnp.ones_like(denominator))
    ray_u = ray_u_num * inv_den
    trig_u = trig_u_num * inv_den
    trig_v = trig_v_num * inv_den

    # minus because a/d/h are (start - end), see geometry.py:313-318
    x = rx1 - ray_u * a
    y = ry1 - ray_u * d
    z = rz1 - ray_u * h
    return x, y, z, valid, ray_u, trig_u, trig_v


def line_triangle_intersect(
    rx1, ry1, rz1, rx2, ry2, rz2, xp, yp, zp, x1, y1, z1, x2, y2, z2, epsilon=None
):
    """All N x M line/triangle intersections; output shape ``(M, N)``
    (triangles on axis 0), matching geometry.py:191-251."""
    b = lambda a: jnp.asarray(a)[None, :]
    s = lambda a: jnp.asarray(a)[:, None]
    return raw_line_triangle_intersect(
        b(rx1), b(ry1), b(rz1), b(rx2), b(ry2), b(rz2),
        s(xp), s(yp), s(zp), s(x1), s(y1), s(z1), s(x2), s(y2), s(z2), epsilon
    )


# ======================================================================
# line x circle (2D)
# ======================================================================

def raw_line_circle_intersect(xs, ys, xe, ye, xc, yc, r, epsilon=None):
    """Infinite-line/circle intersection on co-broadcastable inputs.

    Returns a 2-tuple of dicts ``(plus, minus)`` with keys
    ``x, y, valid, u, v`` for the two quadratic branches, reproducing
    geometry.py:420-547 including the tangent (rad ~ 0 -> snap to 0) and
    degenerate-line (a ~ 0) special cases.
    """
    # promote to the COMMON dtype before any arithmetic:
    # jnp.broadcast_arrays broadcasts shapes but leaves dtypes alone, so a
    # float32 surface set against float64 rays would leave float32-only
    # subexpressions (notably ``1.0 / r`` below) at f32 precision.  The 1/r
    # rounding (~6e-8 relative) distorts the scaled coordinates, so a ray
    # starting EXACTLY on the circle appears off it and re-hits itself at
    # u ~ 5e-7 -- far above the f64 ray_start_eps self-hit guard.
    dt = jnp.result_type(xs, ys, xe, ye, xc, yc, r)
    xs, ys, xe, ye, xc, yc, r = (
        a.astype(dt)
        for a in jnp.broadcast_arrays(xs, ys, xe, ye, xc, yc, r))
    epsilon = _eps(epsilon, xs)

    inverse_r = 1.0 / r
    xr = (xs - xc) * inverse_r
    yr = (ys - yc) * inverse_r
    xd = (xe - xs) * inverse_r
    yd = (ye - ys) * inverse_r

    a = xd * xd + yd * yd
    b = 2.0 * xr * xd + 2.0 * yr * yd
    c = xr * xr + yr * yr - 1.0
    rad = b * b - 4.0 * a * c

    # tangent special case: snap tiny |rad| to exactly zero so both branches
    # coincide at the tangency point (geometry.py:487-496)
    rad = jnp.where(jnp.abs(rad) < epsilon, jnp.zeros_like(rad), rad)

    # no-intersection special case: rad < 0
    safe_value = jnp.ones_like(a)
    rad_neg = rad < 0
    branch_valid = ~rad_neg
    safe_rad = jnp.sqrt(jnp.where(rad_neg, safe_value, rad))
    uminus = jnp.where(rad_neg, safe_value, -b - safe_rad)
    uplus = jnp.where(rad_neg, safe_value, -b + safe_rad)

    # degenerate line special case: a ~ 0 (start == end)
    azero = jnp.abs(a) < epsilon
    inv_den = 1.0 / jnp.where(azero, safe_value, 2.0 * a)
    valid = branch_valid & ~azero
    uminus = jnp.where(azero, safe_value, uminus * inv_den)
    uplus = jnp.where(azero, safe_value, uplus * inv_den)

    xminus = xs + (xe - xs) * uminus
    xplus = xs + (xe - xs) * uplus
    yminus = ys + (ye - ys) * uminus
    yplus = ys + (ye - ys) * uplus
    vminus = jnp.arctan2(yminus - yc, xminus - xc)
    vplus = jnp.arctan2(yplus - yc, xplus - xc)

    return (
        {"x": xplus, "y": yplus, "valid": valid, "u": uplus, "v": vplus},
        {"x": xminus, "y": yminus, "valid": valid, "u": uminus, "v": vminus},
    )


def line_circle_intersect(xs, ys, xe, ye, xc, yc, r, epsilon=None):
    """All N x M line/circle intersections; output shape ``(M, N)``
    (circles on axis 0), matching geometry.py:338-402."""
    b = lambda a: jnp.asarray(a)[None, :]
    s = lambda a: jnp.asarray(a)[:, None]
    return raw_line_circle_intersect(
        b(xs), b(ys), b(xe), b(ye), s(xc), s(yc), s(r), epsilon
    )


# ======================================================================
# Snell's law
# ======================================================================

def _safe_direction_2d(dx, dy):
    """Substitute (1, 0) where the direction is degenerate so arctan2's
    partials stay finite.  The reference compacts rays before reacting, so it
    never feeds a zero-length direction to Snell; the rebuild's slot-stable
    engine runs EVERY slot through the reaction and masks afterwards, which
    means dead/garbage slots reach this code -- and d/dx atan2(0, 0) is NaN,
    poisoning reverse-mode gradients of the whole batch even though the slot
    is masked out (where() blocks cotangents, not the NaN the unused branch's
    backward creates)."""
    eps = jnp.finfo(jnp.result_type(dx)).eps
    degenerate = (dx * dx + dy * dy) < eps * eps
    return (jnp.where(degenerate, jnp.ones_like(dx), dx),
            jnp.where(degenerate, jnp.zeros_like(dy), dy))


def _safe_unit(v, axis=-1):
    """Normalize ``v`` with the squared magnitude clamped away from zero, so
    rsqrt's value AND partials stay finite for degenerate (masked-out) slots
    (same discipline as :func:`_safe_direction_2d`).  Exact for any real ray:
    the clamp only engages below |v| ~ finfo.eps.  One fused rsqrt -- cheaper
    than substitute-then-renormalize, and this runs per bounce on every
    slot."""
    eps = jnp.finfo(v.dtype).eps
    mag2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(mag2, eps * eps))


def select_eta(n_in, n_out, internal_mask):
    """Refractive-index-ratio selection shared by every Snell form and the
    Fresnel intensity reaction: ``eta = n_in/n_out`` on internal hits
    (travelling along the normal), ``n_out/n_in`` on external hits, with the
    0-sentinel (mirror materials, reference materials.py:95-96) propagated as
    ``eta == 0`` through safe divides so gradients never see a divide by
    zero (reference geometry.py:601-611 / 728-736 -- identical chain in both
    dimensions).  Inputs must already be broadcast to a common shape."""
    one = jnp.ones_like(n_in)
    zero = jnp.zeros_like(n_in)
    n_in_is_safe = n_in != 0.0
    n_in_safe = jnp.where(n_in_is_safe, n_in, one)
    n_out_is_safe = n_out != 0.0
    n_out_safe = jnp.where(n_out_is_safe, n_out, one)
    eta_internal = jnp.where(n_out_is_safe, n_in_safe / n_out_safe, zero)
    eta_external = jnp.where(n_in_is_safe, n_out_safe / n_in_safe, zero)
    return jnp.where(internal_mask, eta_internal, eta_external)


def snells_law_2D(x_start, y_start, x_end, y_end, norm, n_in, n_out, new_ray_length):
    """2D optical reaction (refract / reflect / TIR), angle formulation.

    1:1 data layout: each element describes a ray whose endpoint already lies
    on the surface, ``norm`` is the absolute angle of the surface normal.
    ``n_in == 0`` marks a mirror.  Returns the child ray endpoints.
    Reproduces geometry.py:565-653.
    """
    norm = jnp.mod(norm, 2 * PI)
    dx, dy = _safe_direction_2d(x_start - x_end, y_start - y_end)
    ray_angle = jnp.arctan2(dy, dx)
    ray_angle = jnp.mod(ray_angle, 2 * PI)
    theta1 = norm - ray_angle
    theta1 = jnp.where(theta1 > PI, theta1 - 2 * PI, theta1)
    theta1 = jnp.where(theta1 < -PI, theta1 + 2 * PI, theta1)

    internal_mask = jnp.abs(theta1) >= PI / 2

    zero = jnp.zeros_like(theta1)
    n_in = jnp.broadcast_to(n_in, theta1.shape)
    n_out = jnp.broadcast_to(n_out, theta1.shape)
    n = select_eta(n_in, n_out, internal_mask)

    norm = jnp.where(internal_mask, norm, norm + PI)
    theta1 = jnp.where(internal_mask, theta1 + PI, theta1)

    theta2 = n * jnp.sin(theta1)
    # refract when |sin(theta2)| <= 1 and not a mirror; otherwise reflect.
    # double-where keeps the asin branch's gradient finite where it is unused
    refracts = (jnp.abs(theta2) <= 1.0) & (n != 0.0)
    safe_theta2 = jnp.where(refracts, theta2, zero)
    # derivative guard: d/dx arcsin(x) -> inf at |x| == 1 (exactly-critical
    # incidence passes the <= 1 refraction test); clamping by one dtype-eps
    # bounds the derivative at ~1/sqrt(2*eps) with a forward change only for
    # the measure-zero exactly-critical ray (same spirit as the radicand
    # clamp in snells_law_3D)
    lim = 1.0 - jnp.finfo(theta2.dtype).eps
    safe_theta2 = jnp.clip(safe_theta2, -lim, lim)
    new_angle = jnp.where(refracts, norm - jnp.arcsin(safe_theta2), norm + theta1 + PI)

    x_start_new = x_end
    y_start_new = y_end
    x_end_new = x_start_new + new_ray_length * jnp.cos(new_angle)
    y_end_new = y_start_new + new_ray_length * jnp.sin(new_angle)
    return x_start_new, y_start_new, x_end_new, y_end_new


def snells_law_3D(
    x_start, y_start, z_start, x_end, y_end, z_end, norm, n_in, n_out, new_ray_length
):
    """3D optical reaction, vector formulation (geometry.py:671-753; algorithm
    from the GA raytracer note cited there).

    ``norm`` is an ``(N, 3)`` vector field (need not be normalized);
    ``n_in == 0`` marks a mirror.  Returns the six child-ray coordinates.
    """
    u = _safe_unit(jnp.stack([x_end - x_start, y_end - y_start,
                              z_end - z_start], axis=1), axis=1)
    n = _safe_unit(norm, axis=1)
    nu = jnp.sum(n * u, axis=1, keepdims=True)

    internal_mask = nu > 0
    eta = select_eta(jnp.reshape(n_in, (-1, 1)), jnp.reshape(n_out, (-1, 1)),
                     internal_mask)
    nu_eta = eta * nu

    radicand = 1 - eta * eta + nu_eta * nu_eta
    do_tir = radicand < 0
    safe_radicand = jnp.where(do_tir, jnp.ones_like(radicand), radicand)
    # clamp away from 0: d/dx sqrt(x) -> inf at exactly-critical incidence
    # (radicand == 0 escapes the < 0 TIR guard).  eps**2 keeps the forward
    # value bit-unchanged at the dtype's resolution while bounding the
    # derivative at 0.5/eps.  Observed in the wild: TPU remat recompute
    # rounds a near-critical radicand to exactly 0 -> NaN gradients.
    tir_eps = jnp.finfo(radicand.dtype).eps ** 2
    safe_radicand = jnp.maximum(safe_radicand, tir_eps)
    refract = (jnp.sign(nu) * jnp.sqrt(safe_radicand) - nu_eta) * n + eta * u

    reflect = -2 * nu * n + u

    reflective_surface = jnp.reshape(n_in == 0, (-1, 1))
    do_reflect = do_tir | reflective_surface
    new_vector = jnp.where(do_reflect, reflect, refract)

    end = jnp.stack([x_end, y_end, z_end], axis=1)
    new_end = end + new_ray_length * new_vector
    return x_end, y_end, z_end, new_end[:, 0], new_end[:, 1], new_end[:, 2]


def snell_3d_vec(p0, p1, norm, n_in, n_out, new_ray_length):
    """Vectorized 3D Snell on ``(N, 3)`` endpoint arrays (TPU-idiomatic form
    used by the trace engine; same math as :func:`snells_law_3D`)."""
    u = _safe_unit(p1 - p0)
    n = _safe_unit(norm)
    nu = jnp.sum(n * u, axis=-1, keepdims=True)

    internal_mask = nu > 0
    eta = select_eta(n_in[..., None], n_out[..., None], internal_mask)
    nu_eta = eta * nu

    radicand = 1 - eta * eta + nu_eta * nu_eta
    do_tir = radicand < 0
    safe_radicand = jnp.where(do_tir, jnp.ones_like(radicand), radicand)
    # derivative guard at exactly-critical incidence (see snells_law_3D)
    safe_radicand = jnp.maximum(safe_radicand,
                                jnp.finfo(radicand.dtype).eps ** 2)
    refract = (jnp.sign(nu) * jnp.sqrt(safe_radicand) - nu_eta) * n + eta * u
    reflect = -2 * nu * n + u

    do_reflect = do_tir | (n_in == 0)[..., None]
    direction = jnp.where(do_reflect, reflect, refract)
    return p1, p1 + new_ray_length * direction


# ======================================================================
# angular interval membership
# ======================================================================

def angle_in_interval(angle, start, end):
    """True where ``angle`` lies in the closed angular interval
    ``[start, end]``; wraparound-safe for inputs in [-PI, PI]
    (geometry.py:766-802)."""
    reduced_angle = angle - start
    reduced_angle = jnp.where(reduced_angle < 0.0, reduced_angle + 2 * PI, reduced_angle)
    reduced_end = end - start
    reduced_end = jnp.where(reduced_end < 0.0, reduced_end + 2 * PI, reduced_end)
    return reduced_angle <= reduced_end


def transverse_basis(u):
    """Orthonormal frame ``(t1, t2)`` transverse to unit directions ``u``
    ((N, 3)): ``t1 = normalize(u x e_k)`` with ``e_k`` the coordinate axis
    least aligned with each ``u`` (always well-conditioned -- no fixed
    helper-axis threshold), ``t2 = u x t1``.  Shared by polarization basis
    seeding and rough-surface scattering."""
    tiny = jnp.finfo(u.dtype).tiny
    axis = jax.nn.one_hot(jnp.argmin(jnp.abs(u), axis=-1), 3, dtype=u.dtype)
    t1 = jnp.cross(u, axis)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), tiny)
    t2 = jnp.cross(u, t1)
    return t1, t2
