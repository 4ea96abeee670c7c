"""Paraxial (first-order) analysis of sequential asphere stacks.

Classical lens design starts from first-order quantities — focal length,
cardinal points, image location, Petzval field curvature — computed by y-nu
(ABCD) tracing rather than real rays.  The reference framework has no
first-order layer at all (every question is answered by tracing real rays
through `/root/reference/tfrt/engine.py` and inspecting landings); this
module supplies the missing classical workflow on top of
:class:`~tensorflowraytrace_tpu.sequential.AsphereStack`, sharing its
prescription pytree so a design can be *simultaneously* optimized against
real-ray criteria (spot, Strehl via :mod:`analysis`) and first-order
constraints (hold EFL while aberrations are driven down) in one jitted,
differentiated loss.

Formulation: the state vector is ``(y, omega)`` with ``omega = n * u`` the
*reduced* angle, so a transfer by axial distance ``t`` in index ``n`` is
``[[1, t/n], [0, 1]]`` and refraction with surface power
``phi = (n' - n) * c`` is ``[[1, 0], [-phi, 1]]``.  Mirrors use the
signed-index convention ``n' = -n`` (so ``phi = -2 n c`` and subsequent
transfers, with their negative axial deltas, stay consistent); an even
number of mirrors returns the sign to +.  All outputs are differentiable in
every prescription entry (the whole computation is a ``lax.scan`` of 2x2
products), and everything is validated against the real sequential tracer
in the small-aperture limit (tests/test_paraxial.py).

Sign conventions match :mod:`sequential`: the axis is +z, a surface is
``z = vertex_z + sag(r)``, curvature ``c = 1/R`` is positive when the
center of curvature lies toward +z from the vertex.  All cardinal "points"
returned here are absolute z coordinates in the stack's frame, not
vertex-relative distances.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from tensorflowraytrace_tpu.ops.materials import material_index_lookup
from tensorflowraytrace_tpu.sequential import AsphereStack, trace_sequential


def _signed_indices(stack: AsphereStack, materials, wavelength, start_mat):
    """Signed refractive index before and after each surface.

    Returns ``(n_in, n_out)`` of shape (K,).  ``n_in[i]`` is the (signed)
    index of the medium the ray travels through to REACH surface ``i``;
    ``n_out[i]`` the index after it.  The sign is the mirror parity: after
    each reflective surface the index flips sign, which makes the reduced
    transfer ``t / n`` positive again for the backward-travelling segments
    (standard signed-index bookkeeping, e.g. Greivenkamp, Field Guide to
    Geometrical Optics).
    """
    dtype = stack.vertex_z.dtype
    K = stack.n_surfaces
    wl = jnp.broadcast_to(jnp.asarray(wavelength, dtype), (K,))
    n_after_raw = material_index_lookup(materials, wl, stack.mat_after)
    n_start = material_index_lookup(
        materials, wl[:1], jnp.full((1,), start_mat, jnp.int32))[0]

    # sign AFTER surface i = (-1)^(number of mirrors among surfaces 0..i)
    flip = jnp.where(stack.mirror, -1.0, 1.0).astype(dtype)
    sign_after = jnp.cumprod(flip)
    sign_before = jnp.concatenate([jnp.ones((1,), dtype), sign_after[:-1]])

    # unsigned index after surface i: mirror rows keep the incoming medium
    # (they must not consult mat_after, which may be the n=0 reflective
    # sentinel); refractive rows take the lookup.
    def body(carry, x):
        mirror, n_raw = x
        n_next = jnp.where(mirror, carry, n_raw)
        return n_next, n_next

    _, n_unsigned = jax.lax.scan(body, n_start, (stack.mirror, n_after_raw))
    n_unsigned_before = jnp.concatenate(
        [jnp.full((1,), n_start, dtype), n_unsigned[:-1]])
    return sign_before * n_unsigned_before, sign_after * n_unsigned


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "B", "C", "D", "n_obj", "n_img", "z_front", "z_back"],
    meta_fields=[],
)
@dataclass
class ParaxialSystem:
    """First-order description of a stack: the vertex-to-vertex ABCD matrix
    acting on ``(y, n*u)``, plus the bracketing (signed) indices and vertex
    coordinates needed to turn it into cardinal points.

    All scalars are 0-d jax arrays; every property is differentiable."""

    A: jax.Array
    B: jax.Array
    C: jax.Array
    D: jax.Array
    n_obj: jax.Array    # signed index of object space
    n_img: jax.Array    # signed index of image space (negative after an
                        # odd number of mirrors)
    z_front: jax.Array  # first vertex z
    z_back: jax.Array   # last vertex z

    @property
    def power(self):
        """System power ``phi = -C``; EFL = 1/phi."""
        return -self.C

    @property
    def efl(self):
        """Effective focal length 1/power (the catalogue number)."""
        return 1.0 / self.power

    @property
    def back_focal_point(self):
        """z of the rear focal point F' (where an axis-parallel input ray
        crosses the axis).  Offset from the back vertex is the back focal
        distance; negative offsets mean in front of the stack (mirrors)."""
        return self.z_back - self.n_img * self.A / self.C

    @property
    def front_focal_point(self):
        """z of the front focal point F (rays from it exit axis-parallel)."""
        return self.z_front + self.n_obj * self.D / self.C

    @property
    def back_principal_plane(self):
        """z of the rear principal plane P' (F' minus the rear focal
        length ``f' = n_img / power``)."""
        return self.back_focal_point - self.n_img / self.power

    @property
    def front_principal_plane(self):
        """z of the front principal plane P (F plus ``f = n_obj / power``)."""
        return self.front_focal_point + self.n_obj / self.power

    @property
    def back_nodal_point(self):
        """z of N' (unit angular magnification); equals P' when object and
        image space share an index."""
        return self.back_focal_point - self.n_obj / self.power

    @property
    def front_nodal_point(self):
        return self.front_focal_point + self.n_img / self.power

    def image_distance(self, z_obj):
        """z of the paraxial image of an axial object point at ``z_obj``
        (finite conjugates; for an object at infinity the image is at
        :attr:`back_focal_point`).  Solves for the conjugate plane where the
        object-to-image B element vanishes."""
        z_obj = jnp.asarray(z_obj, self.A.dtype)
        t1 = (self.z_front - z_obj) / self.n_obj
        denom = self.C * t1 + self.D
        t2 = -(self.A * t1 + self.B) / denom
        return self.z_back + t2 * self.n_img

    def magnification(self, z_obj):
        """Transverse magnification at the conjugate of ``z_obj``: the A
        element of the object-to-image matrix (its B element is zero at the
        conjugate, so ``y_img = A_tot * y_obj``)."""
        z_img = self.image_distance(z_obj)
        t2 = (z_img - self.z_back) / self.n_img
        return self.A + t2 * self.C


def paraxial_system(stack: AsphereStack, materials, wavelength,
                    start_mat=0) -> ParaxialSystem:
    """Vertex-to-vertex ABCD matrix of the stack at one wavelength.

    ``materials``/``start_mat`` as in
    :func:`~tensorflowraytrace_tpu.sequential.trace_sequential`.  Fully
    differentiable and jittable; vmap over ``wavelength`` for chromatic
    curves (see :func:`axial_color`)."""
    dtype = stack.vertex_z.dtype
    n_in, n_out = _signed_indices(stack, materials, wavelength, start_mat)
    phi = (n_out - n_in) * stack.c
    # transfer BEFORE surface i (0 for the first surface)
    t_gap = jnp.diff(stack.vertex_z, prepend=stack.vertex_z[:1])
    tau = t_gap / n_in

    def body(m, x):
        tau_i, phi_i = x
        a, b, c_, d_ = m
        # refraction([[1,0],[-phi,1]]) @ transfer([[1,tau],[0,1]]) @ M
        a2, b2 = a, b
        c2, d2 = c_, d_
        a3 = a2 + tau_i * c2
        b3 = b2 + tau_i * d2
        c3 = c2 - phi_i * a3
        d3 = d2 - phi_i * b3
        return (a3, b3, c3, d3), None

    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    (A, B, C, D), _ = jax.lax.scan(body, (one, zero, zero, one), (tau, phi))
    return ParaxialSystem(
        A=A, B=B, C=C, D=D, n_obj=n_in[0], n_img=n_out[-1],
        z_front=stack.vertex_z[0], z_back=stack.vertex_z[-1])


def paraxial_trace(y0, u0, stack: AsphereStack, materials, wavelength,
                   start_mat=0, z_start=None):
    """y-nu trace: heights and (real, unreduced) angles AT each surface.

    ``y0``/``u0``: scalar or (N,) initial height and angle at ``z_start``
    (default: the first vertex plane).  Returns ``(y, u)`` of shape (K, N)
    (or (K,) for scalar input): the height at each surface and the real ray
    angle AFTER it — the table every lens-design text prints.  Used for
    stop/pupil solves and as the marginal/chief ray of aberration theory."""
    dtype = stack.vertex_z.dtype
    y0 = jnp.asarray(y0, dtype)
    u0 = jnp.asarray(u0, dtype)
    scalar = y0.ndim == 0 and u0.ndim == 0
    y0, u0 = jnp.atleast_1d(y0), jnp.atleast_1d(u0)
    y0, u0 = jnp.broadcast_arrays(y0, u0)

    n_in, n_out = _signed_indices(stack, materials, wavelength, start_mat)
    phi = (n_out - n_in) * stack.c
    start = stack.vertex_z[0] if z_start is None else jnp.asarray(
        z_start, dtype)
    t_gap = jnp.diff(stack.vertex_z, prepend=start[None])
    tau = t_gap / n_in

    omega0 = n_in[0] * u0

    def body(carry, x):
        y, w = carry
        tau_i, phi_i, n_out_i = x
        y = y + tau_i * w
        w = w - phi_i * y
        return (y, w), (y, w / n_out_i)

    (_, _), (ys, us) = jax.lax.scan(body, (y0, omega0), (tau, phi, n_out))
    if scalar:
        return ys[:, 0], us[:, 0]
    return ys, us


def petzval_sum(stack: AsphereStack, materials, wavelength, start_mat=0):
    """The Petzval sum ``sum_i c_i (n_i' - n_i) / (n_i' n_i)`` (signed
    indices, so a mirror contributes ``2 c / n``).  The paraxial image
    surface curvature in the absence of astigmatism is
    ``-n_img * petzval_sum``; a flat-field design drives this toward 0.
    First-order chapter of every design text; no reference counterpart."""
    n_in, n_out = _signed_indices(stack, materials, wavelength, start_mat)
    return jnp.sum(stack.c * (n_out - n_in) / (n_out * n_in))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["S1", "S2", "S3", "S4", "S5", "C1", "C2", "H",
                 "per_surface"],
    meta_fields=[],
)
@dataclass
class SeidelSums:
    """Third-order (Seidel) wavefront aberration sums, Welford's convention
    (W. T. Welford, *Aberrations of Optical Systems*, 1986, ch. 8):

    ``S1`` spherical, ``S2`` coma, ``S3`` astigmatism, ``S4`` Petzval,
    ``S5`` distortion; ``C1``/``C2`` axial/lateral color (present when a
    wavelength pair was given, else zeros); ``H`` the Lagrange invariant of
    the two defining rays.  ``per_surface`` is the (K, 7) table of
    per-surface contributions (columns S1..S5, C1, C2) — the classical
    "Seidel diagram" showing which surface hurts.

    The relations to REAL ray errors at the paraxial image plane, each
    pinned at ratio 1.000 against
    :func:`~tensorflowraytrace_tpu.sequential.trace_sequential` in
    tests/test_paraxial.py (``n'``/``u'`` the SIGNED image-space index and
    marginal slope, ``rho`` the relative pupil height of the meridional
    fan at the defining full field; real rays must be launched with slope
    exactly the paraxial slope, i.e. ``d ~ (0, u, 1)`` normalized, not
    ``(0, sin u, cos u)`` — the tan/sin difference is itself third order):

    * on-axis transverse aberration:  ``eps_y = S1 rho^3 / (2 n' u')``
    * full-field meridional fan:      ``eps_y = [S1 rho^3 + 3 S2 rho^2
      + (3 S3 + S4) rho + S5] / (2 n' u')``
    * sagittal/tangential astigmatic focus shifts (to third order):
      ``-(S3 + S4)/(2 n' u'^2)`` and ``-(3 S3 + S4)/(2 n' u'^2)``
    * paraxial focus shift short-to-long wavelength: ``-C1 / (n' u'^2)``
    """

    S1: jax.Array
    S2: jax.Array
    S3: jax.Array
    S4: jax.Array
    S5: jax.Array
    C1: jax.Array
    C2: jax.Array
    H: jax.Array
    per_surface: jax.Array


def seidel_sums(stack: AsphereStack, materials, wavelength,
                marginal, chief, z_start, start_mat=0,
                chromatic=None) -> SeidelSums:
    """Seidel third-order aberration sums of a stack from its two defining
    paraxial rays.

    ``marginal``/``chief``: ``(y0, u0)`` height and slope of the paraxial
    marginal and chief rays at the plane ``z_start`` (in the ``start_mat``
    medium).  The classical choice: marginal from the axial object point
    through the aperture edge, chief from the full field through the stop
    center; the sums then predict the real ray errors per the table in
    :class:`SeidelSums`.  ``chromatic``: optional ``(wl_short, wl_long)``
    pair for the color sums C1/C2 (about the base ``wavelength``).

    Per-surface refraction invariants ``A = n(u + y c)`` drive Welford's
    sums; even-asphere fourth-order figure deviation
    ``G = k c^3 / 8 + a4`` adds the standard aspheric terms
    ``8 G y^{4-m} ybar^m (n'-n)``.  Signed indices (mirror rows flip
    ``n``) keep catadioptric systems correct.  Differentiable in every
    prescription entry — Seidel targets ("null the coma") are loss terms.
    """
    dtype = stack.vertex_z.dtype
    n_in, n_out = _signed_indices(stack, materials, wavelength, start_mat)
    if chromatic is not None:
        wl_s, wl_l = chromatic
        ns_in, ns_out = _signed_indices(stack, materials, wl_s, start_mat)
        nl_in, nl_out = _signed_indices(stack, materials, wl_l, start_mat)
        dn_in, dn_out = ns_in - nl_in, ns_out - nl_out
    else:
        dn_in = dn_out = jnp.zeros_like(n_in)

    z_start = jnp.asarray(z_start, dtype)
    t_gap = jnp.diff(stack.vertex_z, prepend=z_start[None])
    tau = t_gap / n_in
    phi = (n_out - n_in) * stack.c
    # fourth-order figure deviation from the osculating sphere:
    # sag = (c/2) r^2 + ((1+k) c^3/8 + a4) r^4 + ... vs sphere (c^3/8) r^4
    a4 = stack.coeffs[:, 0] if stack.coeffs.shape[1] > 0 else jnp.zeros(
        (stack.n_surfaces,), dtype)
    G = stack.k * stack.c ** 3 / 8.0 + a4

    y0, u0 = (jnp.asarray(v, dtype) for v in marginal)
    yb0, ub0 = (jnp.asarray(v, dtype) for v in chief)
    w0 = n_in[0] * u0
    wb0 = n_in[0] * ub0
    H = w0 * yb0 - wb0 * y0  # n(u ybar - ubar y) sign: Welford's H

    def body(carry, x):
        y, w, yb, wb = carry
        tau_i, phi_i, c_i, G_i, n1, n2, dn1, dn2 = x
        # transfer to the surface
        y = y + tau_i * w
        yb = yb + tau_i * wb
        # refraction invariants A = n i = n u + n y c = w + n y c
        A = w + n1 * y * c_i
        Ab = wb + n1 * yb * c_i
        w2 = w - phi_i * y
        wb2 = wb - phi_i * yb
        # Delta(u/n) = u'/n' - u/n with u = w/n
        d_un = w2 / (n2 * n2) - w / (n1 * n1)
        d_inv = 1.0 / n2 - 1.0 / n1
        dn_term = dn2 / n2 - dn1 / n1

        s1 = -(A * A) * y * d_un
        s2 = -(A * Ab) * y * d_un
        s3 = -(Ab * Ab) * y * d_un
        s4 = -(H * H) * c_i * d_inv
        safe_A = jnp.where(jnp.abs(A) > jnp.finfo(dtype).tiny * 1e4, A, 1.0)
        ratio = jnp.where(jnp.abs(A) > jnp.finfo(dtype).tiny * 1e4,
                          Ab / safe_A, 0.0)
        s5 = ratio * (s3 + s4)
        # aspheric fourth-order figure terms
        dn_fig = n2 - n1
        asph = 8.0 * G_i * dn_fig
        s1 = s1 + asph * y ** 4
        s2 = s2 + asph * y ** 3 * yb
        s3 = s3 + asph * y ** 2 * yb ** 2
        s5 = s5 + asph * y * yb ** 3
        # chromatic (Welford 8.29): C1 = sum A y Delta(dn/n), likewise C2
        c1 = A * y * dn_term
        c2 = Ab * y * dn_term
        return (y, w2, yb, wb2), jnp.stack([s1, s2, s3, s4, s5, c1, c2])

    xs = (tau, phi, stack.c, G, n_in, n_out, dn_in, dn_out)
    (_, _, _, _), rows = jax.lax.scan(body, (y0, w0, yb0, wb0), xs)
    tot = jnp.sum(rows, axis=0)
    return SeidelSums(S1=tot[0], S2=tot[1], S3=tot[2], S4=tot[3],
                      S5=tot[4], C1=tot[5], C2=tot[6], H=H,
                      per_surface=rows)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["marginal", "chief", "entrance_pupil", "exit_pupil"],
    meta_fields=[],
)
@dataclass
class StopSolve:
    """The two defining paraxial rays and pupil locations for a chosen
    aperture stop (see :func:`solve_stop`)."""

    marginal: tuple          # (y0, u0) at z_start
    chief: tuple             # (y0, u0) at z_start
    entrance_pupil: jax.Array  # z of the stop's image in object space
    exit_pupil: jax.Array      # z of the stop's image in image space


def solve_stop(stack: AsphereStack, materials, wavelength, stop_index,
               aperture, field_angle=0.0, z_start=None, start_mat=0):
    """Solve the classical stop problem: given WHICH surface is the
    aperture stop, produce the marginal and chief rays (ready for
    :func:`seidel_sums`) and the entrance/exit pupil positions.

    ``stop_index``: index into the stack of the stop surface (static
    Python int); ``aperture``: marginal ray height AT the stop;
    ``field_angle``: object-space chief slope (object at infinity — the
    overwhelmingly common lens-design case; for finite conjugates build
    the rays directly).  ``z_start``: plane where the returned ray states
    live (default: first vertex minus 1).

    Uses the linearity of paraxial tracing: heights at the stop are
    affine in the launch height, so two probe traces solve each ray —
    no matrix surgery, and the whole solve stays differentiable in every
    prescription entry.  The entrance (exit) pupil is the axis crossing
    of the chief ray's object-space (image-space) straight-line extension
    — infinite for telecentric spaces (the returned value is then huge or
    inf; test the exit slope against 0 instead).
    """
    dtype = stack.vertex_z.dtype
    if z_start is None:
        z_start = stack.vertex_z[0] - 1.0
    z_start = jnp.asarray(z_start, dtype)
    field_angle = jnp.asarray(field_angle, dtype)
    aperture = jnp.asarray(aperture, dtype)

    def height_at_stop(y0, u0):
        ys, _ = paraxial_trace(y0, u0, stack, materials, wavelength,
                               start_mat=start_mat, z_start=z_start)
        return ys[stop_index]

    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    # marginal: collimated from the axial object point at infinity;
    # y_stop is linear in y0 (no constant term at u0 = 0 from y0 = 0? no:
    # y_stop(0, 0) = 0 exactly), so scale one probe.
    h1 = height_at_stop(one, zero)
    y0_marg = aperture / h1
    # chief: slope fixed at the field angle; y_stop affine in y0
    b = height_at_stop(zero, field_angle)
    a = h1  # d(y_stop)/d(y0) is the same linear map as the marginal probe
    y0_chief = -b / a

    # pupils from the chief line: object-space crossing of (y0_chief,
    # field_angle) at z_start; image-space crossing of the exit state
    eps = jnp.finfo(dtype).tiny * 1e8
    safe_u0 = jnp.where(jnp.abs(field_angle) > eps, field_angle, 1.0)
    z_ep = jnp.where(jnp.abs(field_angle) > eps,
                     z_start - y0_chief / safe_u0, jnp.inf)
    ys_c, us_c = paraxial_trace(y0_chief, field_angle, stack, materials,
                                wavelength, start_mat=start_mat,
                                z_start=z_start)
    y_exit, u_exit = ys_c[-1], us_c[-1]
    safe_ue = jnp.where(jnp.abs(u_exit) > eps, u_exit, 1.0)
    z_xp = jnp.where(jnp.abs(u_exit) > eps,
                     stack.vertex_z[-1] - y_exit / safe_ue, jnp.inf)
    return StopSolve(marginal=(y0_marg, zero),
                     chief=(y0_chief, field_angle),
                     entrance_pupil=z_ep, exit_pupil=z_xp)


def axial_color(stack: AsphereStack, materials, wavelengths, start_mat=0):
    """Back-focal-point z at each wavelength — the axial (longitudinal)
    chromatic aberration curve.  One vmap'd first-order computation."""
    wavelengths = jnp.asarray(wavelengths, stack.vertex_z.dtype)

    def bfp(wl):
        return paraxial_system(stack, materials, wl,
                               start_mat=start_mat).back_focal_point

    return jax.vmap(bfp)(wavelengths)


def lateral_color(stack: AsphereStack, materials, wavelengths, chief,
                  z_start, z_image, start_mat=0):
    """Chief-ray image height at each wavelength — the lateral
    (transverse) chromatic aberration curve.

    ``chief``: ``(y0, u0)`` of the chief ray at ``z_start`` (e.g. from
    :func:`solve_stop` at the full field); ``z_image``: the image plane
    (fixed across wavelengths — that is what makes the effect *lateral*).
    The short-minus-long height difference agrees with the Seidel ``C2``
    sum as ``C2 / (n' u')`` to first order in the dispersion
    (tests/test_paraxial.py).  One vmap'd first-order computation.
    """
    dtype = stack.vertex_z.dtype
    wavelengths = jnp.asarray(wavelengths, dtype)
    y0 = jnp.asarray(chief[0], dtype)
    u0 = jnp.asarray(chief[1], dtype)
    z_image = jnp.asarray(z_image, dtype)

    def h(wl):
        ys, us = paraxial_trace(y0, u0, stack, materials, wl,
                                start_mat=start_mat, z_start=z_start)
        return ys[-1] + us[-1] * (z_image - stack.vertex_z[-1])

    return jax.vmap(h)(wavelengths)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["waist", "z_waist", "rayleigh", "divergence", "n_img"],
    meta_fields=[],
)
@dataclass
class GaussianBeamResult:
    """Image-space TEM00 beam from :func:`gaussian_beam`: waist radius,
    absolute waist z, (physical, in-medium) Rayleigh range, far-field
    half-angle divergence, and the signed image-space index."""

    waist: jax.Array
    z_waist: jax.Array
    rayleigh: jax.Array
    divergence: jax.Array
    n_img: jax.Array

    def width(self, z):
        """1/e^2 beam radius at plane ``z`` in image space:
        ``w(z) = w0 sqrt(1 + ((z - z_waist)/zR)^2)``."""
        dz = (jnp.asarray(z, self.waist.dtype) - self.z_waist)
        return self.waist * jnp.sqrt(1.0 + (dz / self.rayleigh) ** 2)


def gaussian_beam(stack: AsphereStack, materials, wavelength, waist,
                  z_waist, unit_scale=1e-6, start_mat=0
                  ) -> GaussianBeamResult:
    """Propagate a TEM00 Gaussian beam through the stack by the complex
    beam parameter (laser-optics ABCD; Siegman ch. 20).

    ``waist``/``z_waist``: 1/e^2 waist radius and its absolute z in object
    space; ``wavelength`` in nm (the materials' argument),
    ``unit_scale`` converting nm to the stack's length units (default
    1e-6: mm scenes, matching :func:`analysis.polychromatic_psf`).

    Uses the REDUCED beam parameter ``q^ = q / n``, which transforms under
    this module's reduced-angle ABCD exactly as rays do:
    ``q^' = (A q^ + B) / (C q^ + D)``.  Its imaginary part
    ``pi w0^2 / lambda0`` is index-independent, so refraction bookkeeping
    is automatic, including signed-index mirror spaces.  Differentiable in
    every prescription entry and in the input beam — mode-matching
    ("place the output waist HERE with THIS size") is a loss term.

    Geometric consistency: as ``w0 -> 0`` the output waist approaches the
    paraxial image of ``z_waist`` with ``|magnification| * w0`` size
    (pinned in tests/test_paraxial.py along with the textbook f-to-f
    transform ``w0' = lambda f / (pi w0)`` and the apparent-depth shift at
    a plane interface).
    """
    dtype = stack.vertex_z.dtype
    lam0 = jnp.asarray(wavelength, dtype) * jnp.asarray(unit_scale, dtype)
    w0 = jnp.asarray(waist, dtype)
    z_w = jnp.asarray(z_waist, dtype)
    sys = paraxial_system(stack, materials, wavelength, start_mat=start_mat)

    # reduced q at the front vertex
    q_re = (sys.z_front - z_w) / sys.n_obj
    q_im = jnp.pi * w0 ** 2 / lam0
    q = jax.lax.complex(q_re, q_im)
    q2 = (sys.A * q + sys.B) / (sys.C * q + sys.D)

    # back out the image-space beam: transfer q^ -> q^ + (z - z_back)/n'
    z_waist_out = sys.z_back - sys.n_img * jnp.real(q2)
    im = jnp.imag(q2)          # = pi w0'^2 / lambda0, positive
    w0_out = jnp.sqrt(lam0 * im / jnp.pi)
    zr_out = jnp.abs(sys.n_img) * im
    div_out = lam0 / (jnp.pi * w0_out * jnp.abs(sys.n_img))
    return GaussianBeamResult(waist=w0_out, z_waist=z_waist_out,
                              rayleigh=zr_out, divergence=div_out,
                              n_img=sys.n_img)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["field_angles", "z_image", "tangential", "sagittal",
                 "chief_height", "paraxial_height", "distortion"],
    meta_fields=[],
)
@dataclass
class FieldCurves:
    """Real-ray field curves from :func:`field_curves`: the classical
    astigmatic field plot (tangential/sagittal focus z per field) plus
    the distortion curve.  All arrays are (F,) over the field angles."""

    field_angles: jax.Array
    z_image: jax.Array         # paraxial image plane used as the baseline
    tangential: jax.Array      # z of the tangential (meridional) focus
    sagittal: jax.Array        # z of the sagittal (skew) focus
    chief_height: jax.Array    # REAL chief-ray height at z_image
    paraxial_height: jax.Array  # first-order chief height at z_image
    distortion: jax.Array      # (real - paraxial) / paraxial (0 on axis)


def field_curves(stack: AsphereStack, materials, wavelength, stop_index,
                 aperture, field_angles, z_start=None, rho=0.1,
                 start_mat=0) -> FieldCurves:
    """The classical field-curve analysis — REAL tangential/sagittal foci
    and distortion vs field angle — in one batched sequential trace.

    For each field angle (object at infinity): the chief ray through the
    center of the stop surface ``stop_index`` (paraxial linearity solve,
    as in :func:`solve_stop`); a close meridional pair at pupil heights
    ``+-rho * aperture`` whose crossing is the tangential focus; a close
    skew pair offset in x whose return to the meridional plane is the
    sagittal focus.  Distortion compares the real chief-ray height at the
    paraxial image plane against the first-order height.  To third order
    the focus shifts reproduce ``-(3 S3 + S4) / (2 n' u'^2)`` and
    ``-(S3 + S4) / (2 n' u'^2)`` and the distortion the ``S5`` term of
    :func:`seidel_sums` (pinned in tests/test_paraxial.py); at real
    apertures and fields they include ALL orders, which is the point.

    Differentiable in every prescription entry and in ``field_angles``,
    so "flatten the tangential field" is a loss term.  ``rho`` sets the
    pupil fraction of the focus-finding pairs (small = closer to the
    axial-limit definition, larger = includes aperture dependence).
    """
    dtype = stack.vertex_z.dtype
    if z_start is None:
        z_start = stack.vertex_z[0] - 1.0
    z_start = jnp.asarray(z_start, dtype)
    thetas = jnp.atleast_1d(jnp.asarray(field_angles, dtype))
    f_count = thetas.shape[0]

    z_img = paraxial_system(stack, materials, wavelength,
                            start_mat=start_mat).back_focal_point

    # paraxial linear map to the stop: y_stop = a * y0 + b(theta)
    ys_a, _ = paraxial_trace(jnp.ones((), dtype), jnp.zeros((), dtype),
                             stack, materials, wavelength,
                             start_mat=start_mat, z_start=z_start)
    a = ys_a[stop_index]
    ys_b, _ = paraxial_trace(jnp.zeros_like(thetas), thetas, stack,
                             materials, wavelength, start_mat=start_mat,
                             z_start=z_start)
    b = ys_b[stop_index]                      # (F,)
    y0_chief = -b / a                          # (F,)
    h = rho * jnp.asarray(aperture, dtype)
    y0_tan = (jnp.stack([h, -h])[None, :] - b[:, None]) / a   # (F, 2)
    x0_sag = jnp.stack([h / a, -h / a])                        # (2,)

    # 5 rays per field: chief, tangential +-, sagittal +- (one flat trace)
    nr = jnp.sqrt(1.0 + thetas ** 2)
    d_one = jnp.stack([jnp.zeros_like(thetas), thetas / nr, 1.0 / nr],
                      axis=1)                                  # (F, 3)
    zeros = jnp.zeros_like(thetas)
    px = jnp.stack([zeros, zeros, zeros,
                    jnp.broadcast_to(x0_sag[0], thetas.shape),
                    jnp.broadcast_to(x0_sag[1], thetas.shape)], axis=1)
    py = jnp.stack([y0_chief, y0_tan[:, 0], y0_tan[:, 1],
                    y0_chief, y0_chief], axis=1)
    p = jnp.stack([px, py, jnp.full_like(px, z_start)], axis=2)  # (F,5,3)
    d = jnp.broadcast_to(d_one[:, None, :], (f_count, 5, 3))
    res = trace_sequential(p.reshape(-1, 3), d.reshape(-1, 3), wavelength,
                           stack, materials, start_mat=start_mat)
    pf = res.p.reshape(f_count, 5, 3)
    df = res.d.reshape(f_count, 5, 3)

    tiny = jnp.finfo(dtype).tiny * 1e8

    def safe_div(num, den):
        ok = jnp.abs(den) > tiny
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

    # chief height at the image plane
    s_chief = safe_div(df[:, 0, 1], df[:, 0, 2])
    y_real = pf[:, 0, 1] + (z_img - pf[:, 0, 2]) * s_chief
    ys_c, us_c = paraxial_trace(y0_chief, thetas, stack, materials,
                                wavelength, start_mat=start_mat,
                                z_start=z_start)
    y_par = ys_c[-1] + us_c[-1] * (z_img - stack.vertex_z[-1])
    distortion = safe_div(y_real - y_par, y_par)

    # tangential focus: meridional crossing of the +-rho pair
    s1 = safe_div(df[:, 1, 1], df[:, 1, 2])
    s2 = safe_div(df[:, 2, 1], df[:, 2, 2])
    z_tan = safe_div(
        pf[:, 2, 1] - pf[:, 1, 1] - pf[:, 2, 2] * s2 + pf[:, 1, 2] * s1,
        s1 - s2)
    # sagittal focus: each skew ray re-crosses x = 0 at the same z
    sx = safe_div(df[:, 3, 0], df[:, 3, 2])
    z_sag = pf[:, 3, 2] - safe_div(pf[:, 3, 0], sx)

    return FieldCurves(field_angles=thetas, z_image=z_img,
                       tangential=z_tan, sagittal=z_sag,
                       chief_height=y_real, paraxial_height=y_par,
                       distortion=distortion)
