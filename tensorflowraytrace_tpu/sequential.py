"""Sequential analytic ray tracing: exact asphere intersections, no meshes.

The non-sequential engine (``engine.py``) — like the whole reference
(/root/reference/tfrt/engine.py) — intersects rays against *tessellated*
surfaces (segments/arcs/triangles), paying a candidate search per bounce and
a discretization floor set by the facet size.  Classical lens design does
not need either: the surfaces are a known ordered stack of rotationally
symmetric aspheres on a common axis, and every production lens-design code
(and every textbook, e.g. Spencer & Murty, JOSA 52, 1962) traces them
*sequentially and analytically*:

* each ray is intersected with each surface IN ORDER — no search, no
  acceleration structure, no tessellation, machine-precision hits;
* the conic part has a closed-form quadratic intersection; the even-asphere
  polynomial tail is refined by a few Newton steps on the sag implicit
  ``g(t) = z(t) - sag(r^2(t))`` (quadratically convergent from the conic
  seed, a fixed unrolled iteration count so XLA sees straight-line code);
* the surface normal is the analytic gradient of the implicit.

This is the fastest possible TPU mapping of the classical problem: a
``lax.scan`` over K stacked surfaces of pure fused element-wise math over N
rays — no gathers at all.  Everything (curvatures, conic constants,
polynomial coefficients, vertex positions, the image plane) is
differentiable; gradients flow through the unrolled Newton iterations,
whose fixed point makes them equal to the implicit-function-theorem
derivative at convergence.

Shares the even-asphere sag model of
``models.boundaries.ParametricAsphereBoundary``::

    sag(r) = c r^2 / (1 + sqrt(1 - (1+k) c^2 r^2)) + a4 r^4 + a6 r^6 + ...

Conventions: the optical axis is +z; a surface is ``z = vertex_z + sag(r)``;
rays generally travel toward +z (mirrors reverse them, which is handled);
each surface must be hit at a parameter ``t > t_min`` or the ray dies
(vignetting, missed surface, TIR, evanescence all kill rays — dead rays are
frozen and reported via ``alive``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from tensorflowraytrace_tpu.config import resolve_dtype
from tensorflowraytrace_tpu.ops.asphere import sag as _sag
from tensorflowraytrace_tpu.ops.asphere import sag_du as _sag_du
from tensorflowraytrace_tpu.ops.materials import material_index_lookup

NEWTON_ITERS = 8


# ======================================================================
# surface stack pytree
# ======================================================================

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["vertex_z", "c", "k", "coeffs", "aperture", "mat_after",
                 "mirror"],
    meta_fields=[],
)
@dataclass
class AsphereStack:
    """K rotationally-symmetric even-asphere surfaces on the z axis, stored
    stacked (every field has leading axis K) so the trace is one
    ``lax.scan`` regardless of K.  A pytree: build it from trainable arrays
    inside a loss and every optical prescription entry is differentiable."""

    vertex_z: jax.Array      # (K,) axis crossing of each vertex
    c: jax.Array             # (K,) curvature (1/R; 0 = plane)
    k: jax.Array             # (K,) conic constant
    coeffs: jax.Array        # (K, A) even coefficients a4, a6, ... (A >= 0)
    aperture: jax.Array      # (K,) semi-diameter; r > aperture vignettes
    mat_after: jax.Array     # (K,) int32 material index AFTER the surface
    mirror: jax.Array        # (K,) bool: reflect instead of refract

    @staticmethod
    def make(vertex_z, c, k=None, coeffs=None, aperture=None, mat_after=None,
             mirror=None, dtype=None):
        dtype = resolve_dtype(dtype)
        vertex_z = jnp.atleast_1d(jnp.asarray(vertex_z, dtype))
        K = vertex_z.shape[0]

        def arr(x, default):
            if x is None:
                return jnp.full((K,), default, dtype)
            return jnp.broadcast_to(jnp.asarray(x, dtype), (K,))

        if coeffs is None:
            coeffs = jnp.zeros((K, 0), dtype)
        else:
            coeffs = jnp.asarray(coeffs, dtype)
            if coeffs.ndim == 1:
                coeffs = jnp.broadcast_to(coeffs[None, :],
                                          (K, coeffs.shape[0]))
        if mat_after is None:
            mat_after = jnp.zeros((K,), jnp.int32)
        else:
            mat_after = jnp.broadcast_to(
                jnp.asarray(mat_after, jnp.int32), (K,))
        if mirror is None:
            mirror = jnp.zeros((K,), bool)
        else:
            mirror = jnp.broadcast_to(jnp.asarray(mirror, bool), (K,))
        return AsphereStack(
            vertex_z=vertex_z, c=arr(c, 0.0), k=arr(k, 0.0), coeffs=coeffs,
            aperture=arr(aperture, jnp.inf), mat_after=mat_after,
            mirror=mirror)

    @property
    def n_surfaces(self) -> int:
        return self.vertex_z.shape[0]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["p", "d", "opl", "n", "alive"],
    meta_fields=[],
)
@dataclass
class SequentialResult:
    """Ray state after the stack (and image-plane transfer if requested)."""

    p: jax.Array       # (N, 3) final position
    d: jax.Array       # (N, 3) final unit direction
    opl: jax.Array     # (N,) accumulated optical path length (sum n_i d_i)
    n: jax.Array       # (N,) refractive index of the final medium
    alive: jax.Array   # (N,) bool: survived every surface

    @property
    def landing(self):
        """Transverse (x, y) at the final position."""
        return self.p[:, :2]


# ======================================================================
# intersection of one stacked-surface slice with all rays
# ======================================================================

def _intersect_asphere(p, d, c, k, coeffs, t_min):
    """Exact intersection of rays ``p + t d`` (surface frame: vertex at the
    origin) with ``z = sag(x^2 + y^2)``.

    Conic seed: the conic sheet through the vertex satisfies the implicit
    quadric ``F = c r^2 + c (1+k) z^2 - 2 z = 0`` (substitute the sag to
    check), giving ``A t^2 + B t + C = 0`` — solved with the
    sign-stable/Citardauq root pair so the plane limit ``c -> 0`` (A -> 0)
    and grazing rays stay exact.  The vertex sheet is the root with
    ``1 - c (1+k) z >= 0`` (the other sheet of an ellipsoid/hyperboloid
    violates it).  Newton then refines the polynomial tail on
    ``g(t) = z(t) - sag(r^2(t))`` with the analytic derivative; the
    division guard is the double-where discipline used everywhere else.

    Returns ``(t, ok)``; ``ok`` is False for misses (no real root on the
    vertex sheet ahead of ``t_min``)."""
    dtype = p.dtype
    eps = jnp.finfo(dtype).tiny * 1e8
    px, py, pz = p[:, 0], p[:, 1], p[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]

    ck = c * (1.0 + k)
    A = c * (dx * dx + dy * dy) + ck * dz * dz
    B = 2.0 * (c * (px * dx + py * dy) + ck * pz * dz - dz)
    C = c * (px * px + py * py) + ck * pz * pz - 2.0 * pz

    disc = B * B - 4.0 * A * C
    real = disc >= 0
    sq = jnp.sqrt(jnp.where(real, disc, 0.0))
    # sign-stable root pair; sign(0) := 1 so B = 0 still splits the roots
    sgn = jnp.where(B >= 0, 1.0, -1.0)
    q = -0.5 * (B + sgn * sq)
    safe_A = jnp.where(jnp.abs(A) > eps, A, 1.0)
    safe_q = jnp.where(jnp.abs(q) > eps, q, 1.0)
    t1 = jnp.where(jnp.abs(A) > eps, q / safe_A, jnp.inf)
    t2 = jnp.where(jnp.abs(q) > eps, C / safe_q, jnp.inf)

    def score(t):
        z = pz + t * dz
        on_sheet = 1.0 - ck * z >= -1e-9
        ok = real & on_sheet & (t > t_min) & jnp.isfinite(t)
        return jnp.where(ok, t, jnp.inf)

    t0 = jnp.minimum(score(t1), score(t2))
    seed_ok = jnp.isfinite(t0)
    t = jnp.where(seed_ok, t0, 0.0)

    # Newton refinement (exact already for pure conics; converges the
    # polynomial tail).  Unrolled: NEWTON_ITERS is static.
    for _ in range(NEWTON_ITERS):
        x = px + t * dx
        y = py + t * dy
        u = x * x + y * y
        g = pz + t * dz - _sag(u, c, k, coeffs)
        gp = dz - _sag_du(u, c, k, coeffs) * 2.0 * (x * dx + y * dy)
        safe_gp = jnp.where(jnp.abs(gp) > eps, gp, 1.0)
        step = jnp.where(jnp.abs(gp) > eps, g / safe_gp, 0.0)
        t = t - step

    # converged-hit audit: the residual must be small relative to the
    # travel, and the hit must stay ahead of t_min
    x = px + t * dx
    y = py + t * dy
    u = x * x + y * y
    g = pz + t * dz - _sag(u, c, k, coeffs)
    tol = jnp.asarray(1e-4 if dtype == jnp.float32 else 1e-9, dtype)
    scale = 1.0 + jnp.abs(t)
    ok = seed_ok & (t > t_min) & (jnp.abs(g) < tol * scale)
    # inside the conic's natural aperture (the clamped radicand region is
    # not a real surface point)
    ok = ok & (1.0 - (1.0 + k) * (c * c) * u >= 0.0)
    return t, ok


def _surface_normal(x, y, u, c, k, coeffs):
    """Unit normal of ``z - sag(x^2+y^2) = 0`` (+z-ish orientation)."""
    m = _sag_du(u, c, k, coeffs)
    nx = -2.0 * x * m
    ny = -2.0 * y * m
    nz = jnp.ones_like(u)
    inv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz)
    return nx * inv, ny * inv, nz * inv


# ======================================================================
# the sequential trace
# ======================================================================

def trace_sequential(p, d, wavelength, stack: AsphereStack, materials,
                     image_z=None, start_mat=0, t_min=1e-9,
                     decenter=None, tilt=None, dn=None):
    """Trace N rays through K analytic surfaces in order.

    ``p``/``d``: (N, 3) origins and directions (``d`` is normalized here);
    ``wavelength``: (N,) nm; ``materials``: the usual list of n(wavelength)
    callables (``ops.materials``); ``start_mat``: material index of the
    medium before the first surface; ``image_z``: optional plane to
    transfer to after the last surface.

    Tolerance/alignment perturbations (all optional, all differentiable —
    the hooks the :mod:`tolerance` module drives; every production
    tolerancing run is built on exactly these three knobs):

    * ``decenter``: (K, 2) transverse (dx, dy) offset of each surface's
      vertex off the optical axis;
    * ``tilt``: (K, 2) rotation (radians) of each surface about the x then
      the y axis through its (decentered) vertex — EXACT rigid-frame
      transforms (rotate the ray into the surface frame, intersect/refract
      there, rotate back), not small-angle approximations, so wedge and
      fold-mirror setups are representable too;
    * ``dn``: (K,) refractive-index offset of the medium AFTER each
      surface (melt-data tolerance); ignored on mirror rows.

    Returns a :class:`SequentialResult`.  Rays that miss a surface,
    vignette (``r > aperture``), or TIR at a refraction are marked dead and
    frozen; the trace is one ``lax.scan`` over the stacked surfaces, fully
    differentiable in every stack field, the ray inputs, ``image_z``, and
    the perturbations.
    """
    dtype = p.dtype
    n_rays = p.shape[0]
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    wavelength = jnp.broadcast_to(jnp.asarray(wavelength, dtype), (n_rays,))
    n_cur = material_index_lookup(
        materials, wavelength,
        jnp.full((n_rays,), start_mat, jnp.int32))
    opl = jnp.zeros((n_rays,), dtype)
    alive = jnp.ones((n_rays,), bool)
    t_min = jnp.asarray(t_min, dtype)

    def one_surface(carry, surf):
        p, d, n_cur, opl, alive = carry
        vz, c, k, coeffs, ap, mat_after, mirror = surf

        local = p - jnp.stack([jnp.zeros_like(vz), jnp.zeros_like(vz), vz])
        t, ok = _intersect_asphere(local, d, c, k, coeffs, t_min)
        t = jnp.where(ok, t, 0.0)
        hit_local = local + t[:, None] * d
        x, y = hit_local[:, 0], hit_local[:, 1]
        u = x * x + y * y
        ok = ok & (u <= ap * ap)

        nx, ny, nz = _surface_normal(x, y, u, c, k, coeffs)
        # orient the normal against the incoming ray: cos(theta_i) >= 0
        ndotd = nx * d[:, 0] + ny * d[:, 1] + nz * d[:, 2]
        flip = jnp.where(ndotd > 0, -1.0, 1.0)
        nx, ny, nz = nx * flip, ny * flip, nz * flip
        cos_i = -(nx * d[:, 0] + ny * d[:, 1] + nz * d[:, 2])

        n2 = material_index_lookup(
            materials, wavelength,
            jnp.broadcast_to(mat_after, (n_rays,)))
        # the refraction branch must never divide by the n = 0 reflective
        # sentinel (mirror rows do not consult mat_after) or by a NaN
        # out-of-range lookup: the untaken jnp.where branch still runs in
        # backward mode, so sanitize the divisor first and kill bad-index
        # refractions below (double-where discipline, ADVICE r4)
        n2_ok = jnp.isfinite(n2) & (n2 != 0)
        n2_safe = jnp.where(n2_ok, n2, n_cur)
        eta = n_cur / n2_safe
        rad = 1.0 - eta * eta * (1.0 - cos_i * cos_i)
        tir = rad < 0
        safe_rad = jnp.maximum(jnp.where(tir, 1.0, rad),
                               jnp.finfo(dtype).eps ** 2)
        cos_t = jnp.sqrt(safe_rad)
        coef = eta * cos_i - cos_t
        d_refr = jnp.stack([eta * d[:, 0] + coef * nx,
                            eta * d[:, 1] + coef * ny,
                            eta * d[:, 2] + coef * nz], axis=1)
        two_nd = 2.0 * cos_i
        d_refl = jnp.stack([d[:, 0] + two_nd * nx,
                            d[:, 1] + two_nd * ny,
                            d[:, 2] + two_nd * nz], axis=1)

        d_new = jnp.where(mirror, d_refl, d_refr)
        n_new = jnp.where(mirror, n_cur, n2_safe)
        ok = ok & (mirror | (~tir & n2_ok))

        step_alive = alive & ok
        hit = hit_local + jnp.stack(
            [jnp.zeros_like(vz), jnp.zeros_like(vz), vz])
        sa = step_alive[:, None]
        p = jnp.where(sa, hit, p)
        d = jnp.where(sa, d_new, d)
        opl = jnp.where(step_alive, opl + n_cur * t, opl)
        n_cur = jnp.where(step_alive, n_new, n_cur)
        return (p, d, n_cur, opl, step_alive), None

    surf_fields = (stack.vertex_z, stack.c, stack.k, stack.coeffs,
                   stack.aperture, stack.mat_after, stack.mirror)
    (p, d, n_cur, opl, alive), _ = jax.lax.scan(
        one_surface, (p, d, n_cur, opl, alive), surf_fields)

    if image_z is not None:
        image_z = jnp.asarray(image_z, dtype)
        dz = d[:, 2]
        safe_dz = jnp.where(jnp.abs(dz) > jnp.finfo(dtype).tiny * 1e4,
                            dz, 1.0)
        t_img = (image_z - p[:, 2]) / safe_dz
        ok = jnp.abs(dz) > jnp.finfo(dtype).tiny * 1e4
        p = jnp.where((alive & ok)[:, None], p + t_img[:, None] * d, p)
        opl = jnp.where(alive & ok, opl + n_cur * t_img, opl)
        alive = alive & ok

    return SequentialResult(p=p, d=d, opl=opl, n=n_cur, alive=alive)


def collimated_bundle(n_rays, half_aperture, z_start=-1.0, field_angle=0.0,
                      azimuth=0.0, grid="line", dtype=None):
    """Convenience source for sequential traces: a collimated bundle of
    ``n_rays`` at ``field_angle`` radians off-axis (rotated about the
    ``azimuth`` direction in the pupil).  ``grid='line'`` spans the
    meridional section; ``grid='hex'`` fills the pupil disk with a golden
    spiral (matching models/distributions.py's circle sampling idea but
    deterministic)."""
    dtype = resolve_dtype(dtype)
    if grid == "line":
        ys = jnp.linspace(-half_aperture, half_aperture, n_rays, dtype=dtype)
        xs = jnp.zeros_like(ys)
    else:
        i = jnp.arange(n_rays, dtype=dtype)
        r = half_aperture * jnp.sqrt((i + 0.5) / n_rays)
        th = i * jnp.asarray(2.399963229728653, dtype)  # golden angle
        xs, ys = r * jnp.cos(th), r * jnp.sin(th)
    sf, cf = jnp.sin(jnp.asarray(field_angle, dtype)), jnp.cos(
        jnp.asarray(field_angle, dtype))
    ca, sa = jnp.cos(jnp.asarray(azimuth, dtype)), jnp.sin(
        jnp.asarray(azimuth, dtype))
    d = jnp.stack([jnp.broadcast_to(-sf * sa, xs.shape),
                   jnp.broadcast_to(sf * ca, xs.shape),
                   jnp.broadcast_to(cf, xs.shape)], axis=1)
    p = jnp.stack([xs, ys, jnp.full_like(xs, z_start)], axis=1)
    # launch each ray so the CHIEF direction passes through the pupil point
    # at z=z_start (the pupil is sampled transverse to the axis; for the
    # small field angles of lens design this is the standard approximation)
    return p, d
