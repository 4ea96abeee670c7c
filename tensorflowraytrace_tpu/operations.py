"""Ray operations: pluggable per-bounce reactions and annotations.

Reference counterpart: /root/reference/tfrt/operation.py.  The reference's
RayOperation is a stateful 4-hook plugin (annotate / preprocess / main /
postprocess) that produces dynamically-shaped child-ray dicts.  Here a
*reaction* is a pure function ``reaction(projection, rays, cfg) -> (p0, p1)``
returning the child-ray endpoints for every slot (the engine masks in only
the slots that actually react), and *annotations* are plain field writes on
the RaySet -- slot-stable fields make the reference's inheritance machinery
(OldestAncestor, wavelength/rank pass-through) automatic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorflowraytrace_tpu.engine import Projection, TraceConfig, default_reaction
from tensorflowraytrace_tpu.models.rays import RaySet
from tensorflowraytrace_tpu.ops import geometry

# StandardReaction (operation.py:200-307) is the engine default.
standard_reaction = default_reaction


def ghost_through(proj: Projection, rays: RaySet, cfg: TraceConfig):
    """GhostThrough (operation.py:311-333): rays pass straight through
    optical surfaces unchanged in direction."""
    new_p0 = rays.p1
    new_p1 = 2 * rays.p1 - rays.p0
    return new_p0, new_p1


def annotate_oldest_ancestor(rays: RaySet, start: int = 0) -> RaySet:
    """OldestAncestor (operation.py:166-196): tag each source ray with its
    index so descendants can be traced back.  With slot-stable rays the tag
    simply rides in the slot; no per-bounce copying is needed."""
    idx = jnp.arange(start, start + rays.n_rays, dtype=jnp.int32)
    return rays.with_field("oldest_ancestor", idx)


# ======================================================================
# class-based operation API (facade compatibility with reference
# operation.py:25-162: signature sets + annotate/reaction hooks)
# ======================================================================

class RayOperation:
    """Base class for pluggable ray operations (operation.py:25-162).

    In the rebuild the per-bounce compute hook is a single pure ``reaction``
    function; ``annotate(engine)`` remains for setup-time source annotation.
    The signature-set properties are kept so validate_system-style audits and
    user subclasses carry over.
    """

    def __init__(self, active=True):
        self.active = active

    input_signature = frozenset()
    output_signature = frozenset()
    optical_signature = frozenset()
    stop_signature = frozenset()
    target_signature = frozenset()
    material_signature = frozenset()
    simple_ray_inheritance = frozenset()
    exclusions = frozenset()

    # reaction(projection, rays, cfg) -> (child_p0, child_p1), or None if
    # this operation does not generate rays
    reaction = None

    def annotate(self, engine):
        pass


class StandardReaction(RayOperation):
    """Snell's-law refraction/reflection (operation.py:200-307).

    ``refractive_index_type``: 'index' (per-surface mat_in/mat_out indices
    into the material list, dispersion evaluated per-ray wavelength) or
    'value' (per-surface n_in/n_out floats).
    """

    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})

    def __init__(self, refractive_index_type="index", **kw):
        super().__init__(**kw)
        if refractive_index_type not in ("index", "value"):
            raise ValueError(
                "StandardReaction: refractive_index_type must be 'index' or "
                "'value'")
        self.refractive_index_type = refractive_index_type
        if refractive_index_type == "index":
            self.input_signature = frozenset({"wavelength"})
            self.simple_ray_inheritance = frozenset({"wavelength"})
        else:
            self.optical_signature = frozenset({"n_in", "n_out"})

    reaction = staticmethod(standard_reaction)


class GhostThrough(RayOperation):
    """Pass-through test operation (operation.py:311-333)."""

    reaction = staticmethod(ghost_through)


def _fresnel_prelude(proj, rays):
    """Shared geometry + branch setup for the Fresnel reactions: unit ray
    direction, unit surface normal, signed normal projection ``nu``,
    incidence cosine, sanitized refractive indices, the Snell ratio
    ``eta = n1/n2`` (ops/geometry.select_eta convention: internal hits see
    n_in/n_out, external the inverse; mirror sentinels propagate as 0),
    the TIR radicand, and the set of branches the geometry REFLECTS.

    The reflect predicate mirrors each dimension's actual geometric branch
    (the field updates must follow the path the child ray really took):

    * 2D reflects on TIR and on eta == 0 -- the refract test is
      ``|theta2| <= 1 and eta != 0`` (geometry.py:601-653), so an n_in == 0
      mirror hit from the INTERNAL side (eta = 1/n_out != 0) genuinely
      REFRACTS through in 2D (one-sided mirror, reference parity).
    * 3D reflects on TIR and on n_in == 0 from EITHER side
      (``do_reflect = tir | reflective_surface``, reference
      geometry.py:746-748), plus eta == 0 (a mat_out-mirror seen from an
      internal hit) -- that configuration is out-of-contract in 3D ("n_out
      should not be zero", reference geometry.py:683) and treating it as a
      reflection avoids silently zeroing the ray's downstream power.

    Non-reacting slots can carry non-finite indices (the out-of-range
    material-id path deliberately produces NaN n so the ray dies at the
    finite-child backstop).  The engine masks forward factors by
    jnp.where(reacts, ...), but a product's backward multiplies the zeroed
    cotangent by the raw factor, and 0 * NaN = NaN would contaminate the
    whole field gradient -- so the indices are sanitized here, same
    double-where discipline as snells_law_2D's safe_theta2.
    """
    dtype = rays.p0.dtype
    d = rays.p1 - rays.p0
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                        jnp.finfo(dtype).tiny)
    if proj.dim == 3:
        n = proj.norm
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                            jnp.finfo(dtype).tiny)
    else:
        n = jnp.stack([jnp.cos(proj.norm), jnp.sin(proj.norm)], axis=1)
    nu = jnp.sum(n * d, axis=-1)
    cos_i = jnp.abs(nu)

    n_in = jnp.where(jnp.isfinite(proj.n_in), proj.n_in,
                     jnp.ones_like(proj.n_in))
    n_out = jnp.where(jnp.isfinite(proj.n_out), proj.n_out,
                      jnp.ones_like(proj.n_out))
    eta = geometry.select_eta(n_in, n_out, nu > 0)

    radicand = 1 - eta * eta * (1 - cos_i * cos_i)
    tir = radicand < 0
    if proj.dim == 3:
        reflects = tir | (n_in == 0) | (eta == 0.0)
    else:
        reflects = tir | (eta == 0.0)
    return d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects


def _run_base(base_reaction, proj, rays, cfg):
    """Call a wrapped base reaction, accepting both the plain 2-tuple and
    the field-updating 3-tuple reaction protocols, so the field-tracking
    wrappers (intensity / Jones / OPL) compose with each other, e.g.
    ``optical_path_reaction(base_reaction=fresnel_intensity_reaction())``.
    Returns ``(child_p0, child_p1, field_updates)``."""
    out = base_reaction(proj, rays, cfg)
    if len(out) == 2:
        p0, p1 = out
        return p0, p1, {}
    p0, p1, updates = out
    return p0, p1, dict(updates)


def _merge_updates(inner, outer):
    """Merge an outer wrapper's field updates over its base reaction's,
    failing loudly if both write the same field (stacking two trackers of
    the same field has no well-defined order).  Multiplicative intensity
    trackers avoid the clash by POPPING the base's update of their field
    and chaining onto it (see _chain_field)."""
    clash = set(inner) & set(outer)
    if clash:
        raise ValueError(
            f"composed reactions both update field(s) {sorted(clash)}; "
            "wrap distinct fields or merge them by hand")
    inner.update(outer)
    return inner


def _effective_reflects(base_updates, prelude_reflects):
    """The branch predicate a field tracker should follow.  A
    direction-modifying base reaction (grating / metasurface) reports the
    branch its children ACTUALLY took in the reserved ``__reflects__``
    update -- a reflection grating reflects rays the Snell prelude would
    call refracting, and trackers that switch media (cur_n / cur_alpha) or
    pick a power branch must follow the real child.  Reads WITHOUT popping:
    every tracker in a stacked composition (absorption over OPL over a
    grating) needs the same branch, and the engine drops any leftover
    ``__``-prefixed keys at the end."""
    return base_updates.get("__reflects__", prelude_reflects)


def _chain_field(base_updates, rays, field, who):
    """Starting value for a multiplicative field tracker: the base
    reaction's update of the same field if it made one (intensity trackers
    compose multiplicatively -- interface factor x bulk absorption), else
    the ray's current value.  Missing seed fails loudly."""
    old = base_updates.pop(field, rays.fields.get(field))
    if old is None:
        raise KeyError(
            f"{who}: rays carry no {field!r} field; seed it on the source "
            "rays")
    return old


def _per_surface_table(proj, tables, n_rays, default):
    """Gather a per-surface id table to per-ray values: ``tables`` maps
    surface kind ("triangles" in 3D / "segments", "arcs" in 2D) to an array
    aligned with the scene's merged surface set of that kind; absent kinds
    contribute ``default``.  Indices are clipped before the gather (the
    kind mask makes out-of-range slots irrelevant, but the gather itself
    must stay in bounds)."""
    from tensorflowraytrace_tpu.ops import intersect as isect

    out = jnp.full((n_rays,), default, jnp.int32)
    if proj.dim == 3:
        table = tables.get("triangles")
        if table is not None:
            table = jnp.asarray(table, jnp.int32)
            idx = jnp.clip(proj.surf_idx, 0, table.shape[0] - 1)
            out = table[idx]
        return out
    for key, kind in (("segments", isect.KIND_SEGMENT),
                      ("arcs", isect.KIND_ARC)):
        table = tables.get(key)
        if table is None:
            continue
        table = jnp.asarray(table, jnp.int32)
        idx = jnp.clip(proj.surf_idx, 0, table.shape[0] - 1)
        out = jnp.where(proj.kind == kind, table[idx], out)
    return out


def _tangential_child(rays, cfg, d, n, nu, n1, n2, is_refl, t_kick,
                      child_p0, child_p1, marked):
    """Shared tangential-momentum child construction for the grating and
    metasurface reactions: ``u_out_t = (n1/n2) u_in_t + t_kick``, normal
    component rebuilt by a clamped sqrt (transmission keeps the incident
    normal sign, reflection flips it), evanescent kicks and unmarked
    surfaces falling back to the base child.  Returns
    ``(p0, p1, use_mask)``."""
    dtype = rays.p0.dtype
    eps = jnp.finfo(dtype).eps
    n2_safe = jnp.where(n2 != 0, n2, jnp.ones_like(n2))
    d_t = d - nu[:, None] * n
    out_t = (n1 / n2_safe)[:, None] * d_t + t_kick
    s2 = jnp.sum(out_t * out_t, axis=-1)
    evan = s2 >= 1.0
    # clamped sqrt: grazing emergence (s2 == 1 exactly) would put an inf
    # derivative on the selected branch (same class as the engine's
    # radicand clamps)
    c = jnp.sqrt(jnp.clip(1.0 - s2, eps * eps, 1.0))
    sign = jnp.sign(jnp.where(nu == 0, jnp.ones_like(nu), nu))
    sign = jnp.where(is_refl, -sign, sign)
    out = out_t + (sign * c)[:, None] * n

    length = jnp.asarray(cfg.new_ray_length, dtype)
    use = marked & ~evan & (n2 != 0)
    use_c = use[:, None]
    p0 = jnp.where(use_c, rays.p1, child_p0)
    p1 = jnp.where(use_c, rays.p1 + length * out, child_p1)
    return p0, p1, use


def fresnel_intensity_reaction(base_reaction=default_reaction,
                               field="intensity"):
    """Wrap a reaction with per-ray radiant-intensity tracking.

    Beyond the reference (tfrt carries no intensity): at each optical
    interaction the continuing ray's ``fields[field]`` is attenuated by the
    unpolarized Fresnel power coefficient of the branch it took --
    transmittance T = 1 - (rs^2 + rp^2)/2 on refraction, 1 on total internal
    reflection and on mirror surfaces (n_in == 0 sentinel, materials.py:95).
    Uses the engine's 3-tuple reaction protocol (the third element is a
    per-ray field-update dict applied to reacting slots); fully
    differentiable, so intensity-weighted losses can drive optimization.

    Seed the field on the source rays (e.g. ``RaySet.make(fields={
    "intensity": jnp.ones(n)})`` or a source ``extra_fields`` entry);
    missing fields fail loudly at trace time.
    """

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        dtype = rays.p0.dtype
        d, n, nu, cos_i, n_in, _n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))
        cos_t = jnp.sqrt(jnp.maximum(radicand, jnp.finfo(dtype).eps ** 2))
        # rs/rp with n1/n2 expressed through eta = n1/n2
        rs_d = jnp.maximum(eta * cos_i + cos_t, jnp.finfo(dtype).eps)
        rp_d = jnp.maximum(eta * cos_t + cos_i, jnp.finfo(dtype).eps)
        rs = (eta * cos_i - cos_t) / rs_d
        rp = (eta * cos_t - cos_i) / rp_d
        reflectance = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)

        # the effective reflectance of THIS interface: exactly 1 wherever
        # the Snell geometry itself reflects (TIR: |r| = 1; mirror
        # sentinel: r = -1 -- the clamped cos_t makes the computed value
        # only approximately 1 there), else the Fresnel R.  The branch the
        # child actually took (prelude, or a base reaction's __reflects__
        # report: gratings, forced ghost branches) then selects R vs 1 - R
        # -- so a FORCED reflection at a partial interface carries R, and a
        # forced transmission under TIR carries exactly 0 (ghost-path
        # energy bookkeeping, tests/test_ghost.py).
        R_eff = jnp.where(reflects, jnp.ones_like(reflectance), reflectance)
        eff_reflects = _effective_reflects(base_updates, reflects)
        factor = jnp.where(eff_reflects, R_eff, 1.0 - R_eff)
        # a diffraction-efficiency report from a grating/metasurface base
        # reaction: applied exactly once (popped) by the innermost
        # intensity tracker in a composed stack
        eta = base_updates.pop("__efficiency__", None)
        if eta is not None:
            factor = factor * eta
        old = _chain_field(base_updates, rays, field,
                           "fresnel_intensity_reaction")
        return child_p0, child_p1, _merge_updates(
            base_updates, {field: old * factor.astype(old.dtype)})

    return reaction


class FresnelIntensity(RayOperation):
    """Class-op wrapper for :func:`fresnel_intensity_reaction`: standard
    Snell children plus per-ray intensity attenuation by the Fresnel power
    transmittance of the taken branch."""

    # the default base reaction is StandardReaction in 'index' mode and the
    # Fresnel factor itself reads proj.n_in/n_out, so declare the same
    # optical/material requirements StandardReaction does -- otherwise
    # validate_system would pass on a system whose optical surfaces were
    # never annotated with mat_in/mat_out
    input_signature = frozenset({"intensity", "wavelength"})
    output_signature = frozenset({"intensity"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"intensity", "wavelength"})

    def __init__(self, base_reaction=default_reaction, field="intensity",
                 **kw):
        super().__init__(**kw)
        self.reaction = fresnel_intensity_reaction(base_reaction, field)


# ======================================================================
# polarization ray tracing (Jones amplitudes with s/p basis transport)
# ======================================================================

POL_FIELDS_2D = ("es_re", "es_im", "ep_re", "ep_im")
POL_FIELDS_3D = POL_FIELDS_2D + ("pol_sx", "pol_sy", "pol_sz")


def _cdiv(nr, ni, dr, di, eps):
    """Complex division (nr+i ni)/(dr+i di) in explicit re/im parts (stays
    dtype-generic and avoids TPU complex-support caveats)."""
    den = jnp.maximum(dr * dr + di * di, eps)
    return (nr * dr + ni * di) / den, (ni * dr - nr * di) / den


def _pol_basis_rotation(proj, rays, d, n, dtype):
    """Shared plane-of-incidence basis transport for the Jones reactions:
    reads the ray's (Es, Ep) fields (failing loudly if unseeded), rotates
    them into the new plane of incidence (3D; s_new = d x n, kept at normal
    incidence), and returns ``(es_re, es_im, ep_re, ep_im, updates)`` where
    ``updates`` carries the child's new s-axis fields (3D) or is empty
    (2D: s is globally the out-of-plane axis, rotation is the identity)."""
    for f in (POL_FIELDS_3D if proj.dim == 3 else POL_FIELDS_2D):
        if f not in rays.fields:
            raise KeyError(
                f"jones polarization transport: rays carry no {f!r} "
                "field; seed the source rays with seed_polarization()")
    es_re, es_im = rays.fields["es_re"], rays.fields["es_im"]
    ep_re, ep_im = rays.fields["ep_re"], rays.fields["ep_im"]

    updates = {}
    if proj.dim == 3:
        # rotate (Es, Ep) from the ray's stored basis into the plane of
        # incidence: s_new = d x n (kept at normal incidence), and with
        # p = d x s the rotation is [[c, s], [-s, c]]
        s_old = jnp.stack([rays.fields["pol_sx"], rays.fields["pol_sy"],
                           rays.fields["pol_sz"]], axis=1)
        p_old = jnp.cross(d, s_old)
        dxn = jnp.cross(d, n)
        c_len = jnp.linalg.norm(dxn, axis=-1, keepdims=True)
        s_new = jnp.where(c_len > jnp.finfo(dtype).eps ** 0.5,
                          dxn / jnp.maximum(c_len, jnp.finfo(dtype).tiny),
                          s_old)
        cr = jnp.sum(s_old * s_new, axis=-1)
        sr = jnp.sum(p_old * s_new, axis=-1)
        es_re, ep_re = cr * es_re + sr * ep_re, -sr * es_re + cr * ep_re
        es_im, ep_im = cr * es_im + sr * ep_im, -sr * es_im + cr * ep_im
        # the new s axis is normal to the plane of incidence, hence
        # perpendicular to BOTH child directions (reflected or
        # refracted) -- it is the child's basis as-is
        updates.update(pol_sx=s_new[:, 0], pol_sy=s_new[:, 1],
                       pol_sz=s_new[:, 2])
    return es_re, es_im, ep_re, ep_im, updates


def _bare_jones_coefs(dtype, cos_i, eta, radicand, tir, reflects):
    """Bare-Fresnel complex amplitude coefficients of the taken branch
    (the Jones reactions' shared core): complex (rs, rp) with the TIR
    phase continuation ``cos_t -> i b``, the ideal-mirror ``r = -1``
    override on non-TIR reflections, and the power-normalized real
    transmissions ``sqrt(1 - |r|^2)``.  Returns
    ``(rs_re, rs_im, rp_re, rp_im, ts, tp)``; see
    :func:`jones_polarization_reaction` for the clamp rationale."""
    eps = jnp.finfo(dtype).eps
    # cos_t continued to the upper complex half-plane under TIR.
    # double-where around each sqrt (masked-branch inf derivative times
    # its zeroed cotangent = NaN), PLUS an eps**2 clamp on the SELECTED
    # branch: radicand == 0 exactly (critical incidence; escapes the
    # strict < 0 TIR test, and TPU remat is known to round a
    # near-critical radicand to 0 -- see snells_law_3D) would otherwise
    # feed sqrt'(0) = inf straight into the backward pass
    eps2 = eps * eps
    a = jnp.where(tir, jnp.zeros_like(radicand),
                  jnp.sqrt(jnp.where(tir, 1.0,
                                     jnp.maximum(radicand, eps2))))
    b = jnp.where(tir, jnp.sqrt(jnp.where(tir, jnp.maximum(-radicand,
                                                           eps2), 1.0)),
                  jnp.zeros_like(radicand))
    rs_re, rs_im = _cdiv(eta * cos_i - a, -b, eta * cos_i + a, b, eps)
    rp_re, rp_im = _cdiv(cos_i - eta * a, -eta * b,
                         cos_i + eta * a, eta * b, eps)
    # ideal mirror (n == 0 sentinel): r = -1 for both components
    mirror = reflects & ~tir
    rs_re = jnp.where(mirror, -jnp.ones_like(rs_re), rs_re)
    rs_im = jnp.where(mirror, jnp.zeros_like(rs_im), rs_im)
    rp_re = jnp.where(mirror, -jnp.ones_like(rp_re), rp_re)
    rp_im = jnp.where(mirror, jnp.zeros_like(rp_im), rp_im)

    # transmissions only matter on the refract branch; under reflection
    # |r| = 1 makes the radicand 0 and sqrt's derivative inf, so feed the
    # sqrt a safe value there and mask after.  The refract branch needs
    # the same eps**2 clamp: grazing refraction (|r| -> 1) drives the
    # radicand to exactly 0 on the SELECTED branch
    ts_rad = jnp.clip(1.0 - (rs_re * rs_re + rs_im * rs_im), 0.0, 1.0)
    tp_rad = jnp.clip(1.0 - (rp_re * rp_re + rp_im * rp_im), 0.0, 1.0)
    ts = jnp.sqrt(jnp.where(reflects, 1.0, jnp.maximum(ts_rad, eps2)))
    tp = jnp.sqrt(jnp.where(reflects, 1.0, jnp.maximum(tp_rad, eps2)))
    return rs_re, rs_im, rp_re, rp_im, ts, tp


def jones_polarization_reaction(base_reaction=default_reaction):
    """Wrap a reaction with full polarization ray tracing.

    Beyond the reference (and beyond :func:`fresnel_intensity_reaction`'s
    scalar unpolarized power): each ray carries a complex Jones vector
    ``(Es, Ep)`` in a ray-attached s/p basis, stored as the real fields
    ``es_re, es_im, ep_re, ep_im`` plus (3D) the s-axis unit vector
    ``pol_sx, pol_sy, pol_sz``.  At every optical interaction:

    * the amplitudes are rotated into the new plane of incidence
      (s-axis = d x n; at normal incidence the old basis is kept),
    * the Fresnel *amplitude* coefficients of the taken branch are applied:
      complex ``rs = (eta cos_i - cos_t)/(eta cos_i + cos_t)`` and
      ``rp = (cos_i - eta cos_t)/(cos_i + eta cos_t)`` with
      ``cos_t = sqrt(1 - eta^2 sin_i^2)`` continued to ``i b`` under TIR --
      so TIR applies the textbook phase shifts
      ``tan(d_s/2) = sqrt(sin^2 t - n^2)/cos t`` and
      ``tan(d_p/2) = sqrt(sin^2 t - n^2)/(n^2 cos t)`` (a Fresnel rhomb
      builds circular polarization out of two TIRs, see tests);
      ideal mirrors (n == 0 sentinel) reflect both components with
      ``r = -1``,
    * on refraction the power-normalized real transmissions
      ``sqrt(1 - |rs|^2)`` / ``sqrt(1 - |rp|^2)`` are applied, so
      ``|Es|^2 + |Ep|^2`` remains the ray's radiant power (an equal-power
      incoherent split reproduces fresnel_intensity_reaction's unpolarized
      factor exactly).

    In 2D the plane of incidence IS the plane: s is the out-of-plane axis
    globally, no basis fields are needed and the rotation is the identity.
    Fully differentiable.  Seed the fields with :func:`seed_polarization`;
    read them back with :func:`stokes_parameters`.
    """

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        dtype = rays.p0.dtype
        d, n, nu, cos_i, n_in, _n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))
        reflects = _effective_reflects(base_updates, reflects)

        es_re, es_im, ep_re, ep_im, updates = _pol_basis_rotation(
            proj, rays, d, n, dtype)
        rs_re, rs_im, rp_re, rp_im, ts, tp = _bare_jones_coefs(
            dtype, cos_i, eta, radicand, tir, reflects)

        cs_re = jnp.where(reflects, rs_re, ts)
        cs_im = jnp.where(reflects, rs_im, jnp.zeros_like(ts))
        cp_re = jnp.where(reflects, rp_re, tp)
        cp_im = jnp.where(reflects, rp_im, jnp.zeros_like(tp))

        updates.update(
            es_re=(cs_re * es_re - cs_im * es_im).astype(dtype),
            es_im=(cs_re * es_im + cs_im * es_re).astype(dtype),
            ep_re=(cp_re * ep_re - cp_im * ep_im).astype(dtype),
            ep_im=(cp_re * ep_im + cp_im * ep_re).astype(dtype),
        )
        return child_p0, child_p1, _merge_updates(base_updates, updates)

    return reaction


def seed_polarization(rays: RaySet, jones=(1.0, 0.0), s_axis=None) -> RaySet:
    """Attach the polarization fields to source rays.

    ``jones``: the complex (Es, Ep) amplitudes -- scalars or per-ray arrays
    (``|Es|^2 + |Ep|^2`` is the ray's radiant power).  ``s_axis``: the
    initial s basis vector.  3D default: the normalized cross product of the
    ray direction with its least-aligned coordinate axis (any transverse
    axis is a valid basis; the first interaction rotates into its plane of
    incidence anyway).  2D rays need no basis (s = the out-of-plane axis).
    """
    dtype = rays.p0.dtype
    n = rays.n_rays
    es, ep = jones
    es = jnp.broadcast_to(jnp.asarray(es), (n,))
    ep = jnp.broadcast_to(jnp.asarray(ep), (n,))
    out = rays
    for name, v in (("es_re", jnp.real(es)), ("es_im", jnp.imag(es)),
                    ("ep_re", jnp.real(ep)), ("ep_im", jnp.imag(ep))):
        out = out.with_field(name, v.astype(dtype))
    if rays.p0.shape[1] == 2:
        return out
    d = rays.p1 - rays.p0
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                        jnp.finfo(dtype).tiny)
    if s_axis is None:
        s = geometry.transverse_basis(d)[0]
    else:
        s = jnp.broadcast_to(jnp.asarray(s_axis, dtype), (n, 3))
        s = s - d * jnp.sum(s * d, axis=-1, keepdims=True)  # transverse part
    s = s / jnp.maximum(jnp.linalg.norm(s, axis=-1, keepdims=True),
                        jnp.finfo(dtype).tiny)
    return (out.with_field("pol_sx", s[:, 0])
               .with_field("pol_sy", s[:, 1])
               .with_field("pol_sz", s[:, 2]))


def stokes_parameters(rays: RaySet):
    """Per-ray Stokes parameters from the polarization fields:
    ``S0 = |Es|^2 + |Ep|^2`` (power), ``S1 = |Es|^2 - |Ep|^2``,
    ``S2 = 2 Re(Es conj(Ep))``, ``S3 = -2 Im(Es conj(Ep))`` (S3 = +S0 is
    right-circular in this convention).  Returns a dict of (N,) arrays."""
    es_re, es_im = rays.fields["es_re"], rays.fields["es_im"]
    ep_re, ep_im = rays.fields["ep_re"], rays.fields["ep_im"]
    i_s = es_re * es_re + es_im * es_im
    i_p = ep_re * ep_re + ep_im * ep_im
    return {
        "S0": i_s + i_p,
        "S1": i_s - i_p,
        "S2": 2.0 * (es_re * ep_re + es_im * ep_im),
        "S3": -2.0 * (es_im * ep_re - es_re * ep_im),
    }


class JonesPolarization(RayOperation):
    """Class-op wrapper for :func:`jones_polarization_reaction`: standard
    Snell children plus complex s/p Jones amplitude transport (Fresnel
    amplitude coefficients, TIR phase shifts, basis rotation)."""

    input_signature = frozenset(POL_FIELDS_2D) | {"wavelength"}
    output_signature = frozenset(POL_FIELDS_2D)
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset(POL_FIELDS_2D) | {"wavelength"}

    def __init__(self, base_reaction=default_reaction, **kw):
        super().__init__(**kw)
        self.reaction = jones_polarization_reaction(base_reaction)


# ======================================================================
# optical path length (wavefront / OPD objectives)
# ======================================================================

def optical_path_reaction(base_reaction=default_reaction):
    """Wrap a reaction with differentiable optical path length tracking.

    Beyond the reference (tfrt tracks only geometry): each ray carries

    * ``opl``   -- the accumulated optical path length ``sum(n_i * d_i)``
      over its completed legs (physical path weighted by the refractive
      index of the medium traveled), and
    * ``cur_n`` -- the refractive index of the medium the ray is CURRENTLY
      traveling in (updated to the transmitted side's index on refraction,
      unchanged on reflection/TIR/mirror).

    At every optical interaction the just-finished leg (ray start to the
    projected hit point) adds ``cur_n * |leg|`` to ``opl``.  The final leg
    of a finished/stopped ray is NOT folded in (target hits don't react);
    use :func:`total_optical_path` which closes it with the carried
    ``cur_n``.  Seed with :func:`seed_optical_path`.

    OPL is THE wavefront quantity: by Fermat's principle a perfect imager
    equalizes the OPL of every ray from an object point to its image, so
    ``variance(total_optical_path)`` over a ray bundle is the (squared) RMS
    wavefront error -- a differentiable, diffraction-aware design objective
    (see examples/wavefront_lens.py).
    """

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        for f in ("opl", "cur_n"):
            if f not in rays.fields:
                raise KeyError(
                    f"optical_path_reaction: rays carry no {f!r} field; "
                    "seed the source rays with seed_optical_path()")
        d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))
        reflects = _effective_reflects(base_updates, reflects)
        # rays.p1 is the projected hit point here (the engine substitutes it
        # before calling the reaction), so this is the completed leg.  A
        # metasurface base reaction reports its imparted phase as optical
        # path in the reserved __opl_add__ update (phi lambda / 2 pi).
        leg = jnp.linalg.norm(rays.p1 - rays.p0, axis=-1)
        opl = (rays.fields["opl"] + rays.fields["cur_n"] * leg
               + base_updates.pop("__opl_add__", 0.0))
        # transmitted-side index n2: select_eta's convention is eta = n1/n2
        # with n1 = n_in on internal hits (nu > 0), so the far side is n_out
        # there and n_in otherwise
        n2 = jnp.where(nu > 0, n_out, n_in)
        cur_n = jnp.where(reflects, rays.fields["cur_n"], n2)
        return child_p0, child_p1, _merge_updates(
            base_updates, {"opl": opl, "cur_n": cur_n})

    return reaction


def seed_optical_path(rays: RaySet, n0=1.0) -> RaySet:
    """Attach the ``opl`` (= 0) and ``cur_n`` (= ``n0``, the index of the
    launch medium; scalar or per-ray) fields for
    :func:`optical_path_reaction`."""
    dtype = rays.p0.dtype
    n = rays.n_rays
    return (rays
            .with_field("opl", jnp.zeros((n,), dtype))
            .with_field("cur_n",
                        jnp.broadcast_to(jnp.asarray(n0, dtype), (n,))))


def total_optical_path(rays: RaySet):
    """Per-ray total OPL including the final (un-reacted) leg: the slot's
    current segment is the ray's last leg (landing point for finished rays),
    traveled in the ``cur_n`` medium."""
    leg = jnp.linalg.norm(rays.p1 - rays.p0, axis=-1)
    return rays.fields["opl"] + rays.fields["cur_n"] * leg


class OpticalPath(RayOperation):
    """Class-op wrapper for :func:`optical_path_reaction`: standard Snell
    children plus per-ray optical path length accumulation."""

    input_signature = frozenset({"opl", "cur_n", "wavelength"})
    output_signature = frozenset({"opl", "cur_n"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"opl", "cur_n", "wavelength"})

    def __init__(self, base_reaction=default_reaction, **kw):
        super().__init__(**kw)
        self.reaction = optical_path_reaction(base_reaction)


class OldestAncestor(RayOperation):
    """Tags source rays with their index at annotate time
    (operation.py:166-196)."""

    input_signature = frozenset({"oldest_ancestor"})
    output_signature = frozenset({"oldest_ancestor"})
    simple_ray_inheritance = frozenset({"oldest_ancestor"})

    def annotate(self, engine):
        system = engine.optical_system
        start = 0
        for entry in system._source_entries:
            entry._rays = annotate_oldest_ancestor(entry.rays, start)
            start += entry.rays.n_rays


# ======================================================================
# thin-film coated surfaces (multilayer AR / HR stacks)
# ======================================================================

def _coating_inputs(proj, rays, reflects, n_in, n_out, nu,
                    stacks, lens, lmax, coat_ids, dtype):
    """Per-ray characteristic-matrix inputs shared by the thin-film
    reactions: the coating id (-1 = bare), the sanitized incident /
    substrate indices of the hit side, and the (L, N) layer index /
    thickness tables in TRAVERSAL order (stacks are specified
    outer(mat_out) -> inner(mat_in); internal hits see them reversed
    within the valid prefix).  Returns
    ``(coat, n_inc, n_sub, layer_n, layer_d, layer_valid)``."""
    internal = nu > 0
    n_inc = jnp.where(internal, n_in, n_out)
    # the 2D one-sided mirror REFRACTS n_in == 0 internal hits with
    # eta = 1/n_out (n_in_safe discipline, geometry.select_eta); the
    # stack must see the same sanitized incident index on refracting
    # branches, while reflecting branches keep the 0 sentinel so
    # eta0 = 0 -> r = -1 -> R = 1 (ideal mirror)
    n_inc = jnp.where(~reflects & (n_inc == 0), jnp.ones_like(n_inc),
                      n_inc)
    n_sub = jnp.where(internal, n_out, n_in)
    wl = rays.wavelength

    # per-ray coating id from the per-kind tables (-1 = bare)
    coat = _per_surface_table(proj, coat_ids, rays.n_rays, -1)

    if lmax == 0:
        layer_n = jnp.ones((0, rays.n_rays), dtype)
        layer_d = jnp.zeros((0, rays.n_rays), dtype)
        layer_valid = None
        return coat, n_inc, n_sub, layer_n, layer_d, layer_valid

    # select-chain the per-stack layer tables into per-ray rows
    ray_len = jnp.zeros((rays.n_rays,), jnp.int32)
    for s, length in enumerate(lens):
        ray_len = jnp.where(coat == s, length, ray_len)
    rows_n, rows_d = [], []
    for j in range(lmax):
        nj = jnp.ones((rays.n_rays,), dtype)
        dj = jnp.zeros((rays.n_rays,), dtype)
        for s, stack in enumerate(stacks):
            if j >= len(stack):
                continue
            n_s, d_s = stack[j]
            n_val = n_s(wl) if callable(n_s) else n_s
            sel = coat == s
            nj = jnp.where(sel, jnp.asarray(n_val, dtype), nj)
            dj = jnp.where(sel, jnp.asarray(d_s, dtype), dj)
        rows_n.append(nj)
        rows_d.append(dj)
    layer_n = jnp.stack(rows_n)          # (L, N)
    layer_d = jnp.stack(rows_d)
    jidx = jnp.arange(lmax, dtype=jnp.int32)[:, None]
    # stacks are specified outer(mat_out)->inner(mat_in); internal
    # hits traverse them in reverse, within the valid prefix
    ridx = jnp.clip(ray_len[None, :] - 1 - jidx, 0, lmax - 1)
    eff = jnp.where(internal[None, :], ridx, jidx)
    layer_n = jnp.take_along_axis(layer_n, eff, axis=0)
    layer_d = jnp.take_along_axis(layer_d, eff, axis=0)
    layer_valid = jidx < ray_len[None, :]
    layer_n = jnp.where(layer_valid, layer_n, jnp.ones_like(layer_n))
    layer_d = jnp.where(layer_valid, layer_d, jnp.zeros_like(layer_d))
    return coat, n_inc, n_sub, layer_n, layer_d, layer_valid


def thin_film_intensity_reaction(stacks, coat_ids,
                                 base_reaction=default_reaction,
                                 field="intensity"):
    """Per-ray intensity transport through thin-film COATED surfaces.

    Beyond the reference (every tfrt interface is bare Fresnel): surfaces
    may carry dielectric multilayer stacks -- anti-reflection,
    high-reflection, beam-splitter coatings -- whose power coefficients come
    from the characteristic-matrix method (:mod:`ops.thinfilm`).  The
    continuing ray's ``fields[field]`` is multiplied by the power fraction
    of the branch it took: transmittance ``1 - R`` on refraction,
    reflectance ``R`` on reflection.  An UNCOATED surface (coat id -1, or a
    kind with no table) reduces to the bare interface: the empty stack's R
    is exactly the Fresnel reflectance, TIR and the n == 0 mirror sentinel
    give R == 1, so bare surfaces behave identically to
    :func:`fresnel_intensity_reaction`.

    Parameters
    ----------
    stacks : sequence of coating stacks
        Each stack is a sequence of ``(n, d)`` layers ordered from the
        mat_OUT side toward the mat_IN side (as deposited on the mat_in
        substrate); rays arriving from the mat_in side see the stack
        reversed automatically.  ``n``: a float/array refractive index or a
        callable ``n(wavelength)`` (any :mod:`ops.materials` curve).
        ``d``: physical thickness in the SAME units as the ray wavelengths
        (nm by convention).  ``d`` may be a traced scalar, so coating
        thicknesses can be co-optimized with the lens geometry -- build the
        reaction inside the loss function.
    coat_ids : dict of per-surface coating indices
        ``{"triangles": arr}`` (3D) or ``{"segments": arr, "arcs": arr}``
        (2D), each array aligned with the scene's merged surface set of
        that kind (index into ``stacks``; -1 = bare).

    Fully differentiable (complex-step-safe clamps at critical incidence
    and grazing angles).  Composes with the other field trackers via
    ``base_reaction``.
    """
    from tensorflowraytrace_tpu.ops import thinfilm

    stacks = [list(s) for s in stacks]
    lmax = max((len(s) for s in stacks), default=0)
    lens = [len(s) for s in stacks]

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        dtype = rays.p0.dtype
        eps = jnp.finfo(dtype).eps
        d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))
        reflects = _effective_reflects(base_updates, reflects)
        old = _chain_field(base_updates, rays, field,
                           "thin_film_intensity_reaction")
        coat, n_inc, n_sub, layer_n, layer_d, layer_valid = _coating_inputs(
            proj, rays, reflects, n_in, n_out, nu,
            stacks, lens, lmax, coat_ids, dtype)

        cos_inc = jnp.clip(cos_i, eps, 1.0)
        rs, rp = thinfilm.stack_r(n_inc, n_sub, cos_inc, rays.wavelength,
                                  layer_n, layer_d, layer_valid)
        R = jnp.clip(jnp.real(0.5 * (jnp.abs(rs) ** 2 + jnp.abs(rp) ** 2)),
                     0.0, 1.0).astype(dtype)
        factor = jnp.where(reflects, R, 1.0 - R)
        # diffraction-efficiency report from a grating/metasurface base
        # reaction (see fresnel_intensity_reaction)
        eta = base_updates.pop("__efficiency__", None)
        if eta is not None:
            factor = factor * eta
        return child_p0, child_p1, _merge_updates(
            base_updates, {field: old * factor.astype(old.dtype)})

    return reaction


class ThinFilmIntensity(RayOperation):
    """Class-op wrapper for :func:`thin_film_intensity_reaction`: standard
    Snell children plus coated-surface power transport."""

    input_signature = frozenset({"intensity", "wavelength"})
    output_signature = frozenset({"intensity"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"intensity", "wavelength"})

    def __init__(self, stacks, coat_ids, base_reaction=default_reaction,
                 field="intensity", **kw):
        super().__init__(**kw)
        self.reaction = thin_film_intensity_reaction(stacks, coat_ids,
                                                     base_reaction, field)


def thin_film_jones_reaction(stacks, coat_ids,
                             base_reaction=default_reaction):
    """Full polarization transport through thin-film COATED surfaces.

    The composition of :func:`jones_polarization_reaction` and
    :func:`thin_film_intensity_reaction` the matrices always allowed but
    round 4 left unmet: on COATED surfaces (coat id >= 0) the ray's Jones
    vector is multiplied by the stack's COMPLEX per-polarization amplitude
    coefficients from :func:`ops.thinfilm.stack_rt` -- ``(rs, rp)`` on the
    reflect branch, the power-normalized ``(ts, tp)`` on the refract branch
    -- so coatings diattenuate (|rs| != |rp|: a quarter-wave stack near
    Brewster is a polarizer) AND retard (arg rs != arg rp: coating-induced
    ellipticity), which a scalar intensity transport cannot express.  BARE
    surfaces (coat id -1) take exactly the bare-Fresnel path of
    ``jones_polarization_reaction`` -- same amplitudes, TIR phases, and
    mirror convention -- and a coated surface whose layers have zero
    thickness degenerates to the same thing (pinned by tests).

    Conventions:

    * The characteristic-matrix rp carries the opposite sign of the
      engine's Fresnel-convention rp (Verdet vs Fresnel reflected-p
      basis); the reflected rp is sign-flipped here (tp needs none) so
      the empty stack matches ``jones_polarization_reaction`` identically
      on every branch.
    * Mirror-substrate rows (n == 0 sentinel) take the exact
      perfect-conductor limit (``pec_substrate`` of stack_rt): the bare
      mirror reflects with r = -1 for BOTH components (the repo's pinned
      ideal-mirror convention) and a coating contributes its round-trip
      phase on top; these rows keep the matrix-convention rp sign so the
      zero-thickness limit still matches.
    * ``|Es|^2 + |Ep|^2`` tracks radiant power on every branch: an
      equal-power incoherent split reproduces
      ``thin_film_intensity_reaction``'s unpolarized factor exactly.

    Parameters are those of :func:`thin_film_intensity_reaction` (stacks
    ordered mat_out -> mat_in, per-kind coat-id tables, -1 = bare); seed
    rays with :func:`seed_polarization`, read back with
    :func:`stokes_parameters`.  Fully differentiable in layer thicknesses
    and indices (co-optimize coatings with geometry).
    """
    from tensorflowraytrace_tpu.ops import thinfilm

    stacks = [list(s) for s in stacks]
    lmax = max((len(s) for s in stacks), default=0)
    lens = [len(s) for s in stacks]

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        dtype = rays.p0.dtype
        eps = jnp.finfo(dtype).eps
        d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))
        reflects = _effective_reflects(base_updates, reflects)

        es_re, es_im, ep_re, ep_im, updates = _pol_basis_rotation(
            proj, rays, d, n, dtype)

        # bare-Fresnel path: EXACTLY jones_polarization_reaction's
        # amplitudes (complex r with TIR phases, mirror r = -1, real
        # power-normalized t)
        brs_re, brs_im, brp_re, brp_im, bts, btp = _bare_jones_coefs(
            dtype, cos_i, eta, radicand, tir, reflects)

        # stack path: complex amplitudes of the characteristic matrix
        coat, n_inc, n_sub, layer_n, layer_d, layer_valid = _coating_inputs(
            proj, rays, reflects, n_in, n_out, nu,
            stacks, lens, lmax, coat_ids, dtype)
        cos_inc = jnp.clip(cos_i, eps, 1.0)
        pec = n_sub == 0
        srs, srp, sts, stp = thinfilm.stack_rt(
            n_inc, n_sub, cos_inc, rays.wavelength,
            layer_n, layer_d, layer_valid, pec_substrate=pec)
        # Verdet -> Fresnel p-sign flip of the REFLECTED p amplitude on
        # dielectric rows (the transmitted p basis does not flip, so tp
        # matches as-is); PEC rows keep the matrix sign so the bare mirror
        # gives rp = -1 (see docstring)
        p_sign = jnp.where(pec, jnp.ones_like(cos_i), -jnp.ones_like(cos_i))
        srp = srp * jnp.asarray(p_sign, srp.dtype)

        coated = coat >= 0
        rs_re = jnp.where(coated, jnp.real(srs).astype(dtype), brs_re)
        rs_im = jnp.where(coated, jnp.imag(srs).astype(dtype), brs_im)
        rp_re = jnp.where(coated, jnp.real(srp).astype(dtype), brp_re)
        rp_im = jnp.where(coated, jnp.imag(srp).astype(dtype), brp_im)
        ts_re = jnp.where(coated, jnp.real(sts).astype(dtype), bts)
        ts_im = jnp.where(coated, jnp.imag(sts).astype(dtype),
                          jnp.zeros_like(bts))
        tp_re = jnp.where(coated, jnp.real(stp).astype(dtype), btp)
        tp_im = jnp.where(coated, jnp.imag(stp).astype(dtype),
                          jnp.zeros_like(btp))

        cs_re = jnp.where(reflects, rs_re, ts_re)
        cs_im = jnp.where(reflects, rs_im, ts_im)
        cp_re = jnp.where(reflects, rp_re, tp_re)
        cp_im = jnp.where(reflects, rp_im, tp_im)

        updates.update(
            es_re=(cs_re * es_re - cs_im * es_im).astype(dtype),
            es_im=(cs_re * es_im + cs_im * es_re).astype(dtype),
            ep_re=(cp_re * ep_re - cp_im * ep_im).astype(dtype),
            ep_im=(cp_re * ep_im + cp_im * ep_re).astype(dtype),
        )
        return child_p0, child_p1, _merge_updates(base_updates, updates)

    return reaction


class ThinFilmJones(RayOperation):
    """Class-op wrapper for :func:`thin_film_jones_reaction`: standard
    Snell children plus complex s/p Jones transport with coated surfaces
    applying their multilayer amplitude coefficients (diattenuation AND
    retardance); bare surfaces identical to :class:`JonesPolarization`."""

    input_signature = frozenset(POL_FIELDS_2D) | {"wavelength"}
    output_signature = frozenset(POL_FIELDS_2D)
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset(POL_FIELDS_2D) | {"wavelength"}

    def __init__(self, stacks, coat_ids, base_reaction=default_reaction,
                 **kw):
        super().__init__(**kw)
        self.reaction = thin_film_jones_reaction(stacks, coat_ids,
                                                 base_reaction)


# ======================================================================
# diffraction gratings (spectrometer / dispersive design)
# ======================================================================

def grating_reaction(gratings, grating_ids, base_reaction=default_reaction,
                     efficiencies=None):
    """Diffraction-grating surfaces: the vector grating equation as a
    reaction (beyond the reference, which has only Snell surfaces).

    For rays hitting a grating surface the child direction satisfies

        u_out_t = (n1 / n2) u_in_t  +  (m lambda / (n2 a)) g_t
        u_out   = u_out_t + sign(u_in . n) sqrt(1 - |u_out_t|^2) n   (transmission)
                = u_out_t - sign(u_in . n) sqrt(1 - |u_out_t|^2) n   (reflection)

    where ``u_t`` is the direction's tangential component, ``a`` the groove
    spacing, ``m`` the diffraction order, ``g_t`` the unit in-plane grating
    vector (perpendicular to the grooves), ``n1``/``n2`` the incident /
    far-side refractive indices (``n2 = n1`` for reflection gratings), and
    ``lambda`` the VACUUM wavelength in the same units as ``a`` (nm by
    convention).  Order m = 0 transmission reduces exactly to Snell
    refraction.  Evanescent orders (|u_out_t| > 1) fall back to the base
    reaction's child, as do non-grating surfaces.  The geometry is exact;
    the POWER into the followed order comes from ``efficiencies`` (the
    groove-profile electromagnetics are not solved -- supply measured or
    vendor curves).

    Parameters
    ----------
    gratings : sequence of (spacing, order, kind[, groove])
        ``spacing``: groove period (same units as wavelength; may be a
        traced scalar for spacing optimization).  ``order``: int m.
        ``kind``: "transmission" or "reflection".  ``groove`` (3D only): a
        3-vector whose tangent-plane projection is the grating vector
        direction (positive-m dispersion direction); in 2D the grating
        vector is the in-plane tangent ``rot90(normal)``.
    grating_ids : dict of per-surface tables
        ``{"triangles": arr}`` / ``{"segments": arr, "arcs": arr}``,
        aligned with the scene's merged surface sets; index into
        ``gratings``, -1 = ordinary surface.
    efficiencies : optional sequence aligned with ``gratings``
        Diffraction efficiency of the followed order, per grating: ``None``
        (unit power -- geometry only), a float, or a callable
        ``eta(order, wavelength, cos_i) -> (N,)`` (order is the grating's
        static m; wavelength / cos_i are per-ray) for measured or vendor
        efficiency curves.  Emitted as the reserved ``__efficiency__``
        update, which the intensity trackers
        (:func:`fresnel_intensity_reaction` /
        :func:`thin_film_intensity_reaction`) multiply into the followed
        branch's power exactly once -- so per-order traced powers sum to
        the table's sum (<= 1 for a physical table), and the spectrometer
        reports THROUGHPUT (see examples/spectrometer.py).  Traced values
        are supported: efficiency models can be fit to measurements.

    Fully differentiable in spacing, geometry, wavelength and efficiency
    (clamped sqrt at grazing emergence).

    Field trackers (intensity / OPL / absorption / Jones) compose as OUTER
    wrappers -- ``optical_path_reaction(base_reaction=grating_reaction(...))``
    -- and follow the diffracted child's actual branch: this reaction
    reports it via the reserved ``__reflects__`` update (a reflection
    grating keeps the ray in its medium even though the Snell prelude
    would have refracted).  The interface power factors the trackers apply
    are NOT diffraction efficiencies (unmodeled).
    """
    gratings = list(gratings)

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        if not gratings:
            return (child_p0, child_p1, base_updates) if base_updates else (
                child_p0, child_p1)
        dtype = rays.p0.dtype
        d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))
        internal = nu > 0
        n1 = jnp.where(internal, n_in, n_out)
        n2_far = jnp.where(internal, n_out, n_in)

        # per-ray grating id
        grat = _per_surface_table(proj, grating_ids, rays.n_rays, -1)

        # per-ray parameters via select chains
        spacing = jnp.ones((rays.n_rays,), dtype)
        order = jnp.zeros((rays.n_rays,), dtype)
        is_refl = jnp.zeros((rays.n_rays,), bool)
        if proj.dim == 3:
            groove = jnp.zeros((rays.n_rays, 3), dtype)
        for s, spec in enumerate(gratings):
            a_s, m_s, kind_s = spec[0], spec[1], spec[2]
            sel = grat == s
            spacing = jnp.where(sel, jnp.asarray(a_s, dtype), spacing)
            order = jnp.where(sel, jnp.asarray(m_s, dtype), order)
            if kind_s not in ("transmission", "reflection"):
                raise ValueError(
                    f"grating kind must be 'transmission' or 'reflection', "
                    f"got {kind_s!r}")
            is_refl = jnp.where(sel, kind_s == "reflection", is_refl)
            if proj.dim == 3:
                if len(spec) < 4:
                    raise ValueError(
                        "3D gratings need a groove vector: "
                        "(spacing, order, kind, groove)")
                g = jnp.asarray(spec[3], dtype)
                groove = jnp.where(sel[:, None], g[None, :], groove)

        # tangential grating vector direction
        if proj.dim == 3:
            g_t = groove - jnp.sum(groove * n, axis=-1, keepdims=True) * n
            g_len = jnp.linalg.norm(g_t, axis=-1, keepdims=True)
            g_t = g_t / jnp.maximum(g_len, jnp.finfo(dtype).tiny)
        else:
            g_t = jnp.stack([-n[:, 1], n[:, 0]], axis=1)

        n2 = jnp.where(is_refl, n1, n2_far)
        n2_safe = jnp.where(n2 != 0, n2, jnp.ones_like(n2))
        a_safe = jnp.maximum(spacing, jnp.finfo(dtype).tiny)
        shift = order * rays.wavelength / (n2_safe * a_safe)
        p0, p1, use = _tangential_child(
            rays, cfg, d, n, nu, n1, n2, is_refl, shift[:, None] * g_t,
            child_p0, child_p1, grat >= 0)
        # report the branch the child ACTUALLY took for outer field
        # trackers (reserved key; consumed by _effective_reflects, dropped
        # by the engine otherwise)
        base_updates["__reflects__"] = jnp.where(use, is_refl, reflects)
        if efficiencies is not None:
            eff = jnp.ones((rays.n_rays,), dtype)
            for s, e in enumerate(efficiencies):
                if e is None:
                    continue
                m_s = gratings[s][1]
                val = (e(m_s, rays.wavelength, cos_i) if callable(e)
                       else jnp.asarray(e, dtype))
                val = jnp.broadcast_to(jnp.asarray(val, dtype),
                                       (rays.n_rays,))
                eff = jnp.where(grat == s, val, eff)
            # chain multiplicatively over whatever an inner reaction
            # already emitted; the first OUTER intensity tracker pops and
            # applies it exactly once
            base_updates["__efficiency__"] = (
                base_updates.get("__efficiency__", 1.0)
                * jnp.where(use, eff, jnp.ones_like(eff)))
        return p0, p1, base_updates

    return reaction


class Grating(RayOperation):
    """Class-op wrapper for :func:`grating_reaction`: Snell children except
    on grating-marked surfaces, which diffract per the grating equation."""

    input_signature = frozenset({"wavelength"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"wavelength"})

    def __init__(self, gratings, grating_ids,
                 base_reaction=default_reaction, efficiencies=None, **kw):
        super().__init__(**kw)
        self.reaction = grating_reaction(gratings, grating_ids,
                                         base_reaction,
                                         efficiencies=efficiencies)


# ======================================================================
# absorbing media (Beer-Lambert bulk attenuation)
# ======================================================================

def absorption_reaction(alpha_tables, base_reaction=default_reaction,
                        field="intensity"):
    """Beer-Lambert bulk absorption: each completed leg multiplies the
    ray's ``fields[field]`` by ``exp(-alpha * leg_length)`` where ``alpha``
    is the absorption coefficient of the medium traveled (units 1/length in
    scene units).  Beyond the reference (tfrt media are lossless).

    The current medium's coefficient rides in a ``cur_alpha`` ray field
    (seed with :func:`seed_absorption`), updated on refraction to the far
    side's coefficient exactly like :func:`optical_path_reaction` updates
    ``cur_n`` -- reflection/TIR/mirrors keep the medium.  The final leg of
    a finished ray is closed by :func:`final_intensity`.

    Parameters
    ----------
    alpha_tables : dict of per-surface coefficient pairs
        ``{"triangles": (alpha_in, alpha_out)}`` /
        ``{"segments": (...), "arcs": (...)}`` -- per-surface arrays
        aligned with the scene's merged surface sets, giving the absorption
        coefficient of the mat_in / mat_out side medium.  Surfaces of a
        kind with no table contribute alpha = 0 (lossless).  Entries may be
        traced arrays (differentiable alphas).

    Composes with the other field trackers via ``base_reaction``; fully
    differentiable in alpha (e.g. fitting absorption to measurements, or
    optimizing guide geometry to minimize absorbed loss).
    """
    from tensorflowraytrace_tpu.ops import intersect as isect

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        if "cur_alpha" not in rays.fields:
            raise KeyError(
                "absorption_reaction: rays carry no 'cur_alpha' field; seed "
                "the source rays with seed_absorption()")
        dtype = rays.p0.dtype
        d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))
        reflects = _effective_reflects(base_updates, reflects)
        internal = nu > 0

        def side(tab, which):
            return jnp.asarray(tab[0] if which == "in" else tab[1], dtype)

        zero = jnp.zeros((rays.n_rays,), dtype)
        a_in, a_out = zero, zero
        if proj.dim == 3:
            tab = alpha_tables.get("triangles")
            if tab is not None:
                ti = side(tab, "in")
                idx = jnp.clip(proj.surf_idx, 0, ti.shape[0] - 1)
                a_in = ti[idx]
                a_out = side(tab, "out")[idx]
        else:
            for key, kind in (("segments", isect.KIND_SEGMENT),
                              ("arcs", isect.KIND_ARC)):
                tab = alpha_tables.get(key)
                if tab is None:
                    continue
                ti = side(tab, "in")
                to = side(tab, "out")
                idx = jnp.clip(proj.surf_idx, 0, ti.shape[0] - 1)
                sel = proj.kind == kind
                a_in = jnp.where(sel, ti[idx], a_in)
                a_out = jnp.where(sel, to[idx], a_out)

        leg = jnp.linalg.norm(rays.p1 - rays.p0, axis=-1)
        old = _chain_field(base_updates, rays, field, "absorption_reaction")
        attenuated = old * jnp.exp(-rays.fields["cur_alpha"] * leg).astype(
            old.dtype)
        # far-side medium on refraction (select_eta convention: internal
        # hits transmit into the mat_out side)
        a_far = jnp.where(internal, a_out, a_in)
        cur = jnp.where(reflects, rays.fields["cur_alpha"], a_far)
        return child_p0, child_p1, _merge_updates(
            base_updates, {field: attenuated, "cur_alpha": cur})

    return reaction


def seed_absorption(rays: RaySet, alpha0=0.0, field="intensity",
                    seed_field=True) -> RaySet:
    """Attach ``cur_alpha`` (= launch-medium absorption coefficient) and,
    unless the intensity field is already seeded, ``fields[field] = 1``."""
    dtype = rays.p0.dtype
    n = rays.n_rays
    out = rays.with_field(
        "cur_alpha", jnp.broadcast_to(jnp.asarray(alpha0, dtype), (n,)))
    if seed_field and field not in rays.fields:
        out = out.with_field(field, jnp.ones((n,), dtype))
    return out


def final_intensity(rays: RaySet, field="intensity"):
    """Close the last (non-reacting) leg of finished rays: the tracked
    intensity times the absorption of the final stretch ``p0 -> p1``."""
    leg = jnp.linalg.norm(rays.p1 - rays.p0, axis=-1)
    return rays.fields[field] * jnp.exp(-rays.fields["cur_alpha"] * leg)


class Absorption(RayOperation):
    """Class-op wrapper for :func:`absorption_reaction`."""

    input_signature = frozenset({"intensity", "cur_alpha", "wavelength"})
    output_signature = frozenset({"intensity", "cur_alpha"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"intensity", "cur_alpha",
                                        "wavelength"})

    def __init__(self, alpha_tables, base_reaction=default_reaction,
                 field="intensity", **kw):
        super().__init__(**kw)
        self.reaction = absorption_reaction(alpha_tables, base_reaction,
                                            field)


# ======================================================================
# metasurfaces (generalized law of refraction)
# ======================================================================

def metasurface_reaction(phases, meta_ids, base_reaction=default_reaction,
                         efficiencies=None):
    """Metasurface / phase-profile surfaces: the generalized law of
    refraction [Yu et al., Science 334, 333 (2011)] as a reaction.

    A surface marked in ``meta_ids`` imparts the tangential momentum of its
    phase profile ``phi(point, wavelength)``:

        k_out_t = k_in_t + grad_t(phi)
        u_out_t = (n1/n2) u_in_t + (lambda / (2 pi n2)) grad_t(phi)

    with the normal component rebuilt by a clamped sqrt (transmission or
    reflection kinds, like :func:`grating_reaction` -- a linear phase IS a
    grating; a constant phase reduces exactly to Snell).  The phase profile
    is any JAX-traceable scalar function of a single hit point ``(dim,)``
    and scalar vacuum wavelength; its spatial gradient is taken with
    ``jax.grad`` and projected into the tangent plane, so arbitrary
    profiles (hyperbolic metalens, polynomial correctors, freeform) are
    supported and their PARAMETERS are differentiable end-to-end -- build
    the reaction inside the loss to co-design phase profiles with glass.

    Parameters
    ----------
    phases : sequence of (phase_fn, kind)
        ``phase_fn(point, wavelength) -> phase`` in radians (traced
        scalars); ``kind``: "transmission" or "reflection".
    meta_ids : dict of per-surface tables
        ``{"triangles": arr}`` / ``{"segments": arr, "arcs": arr}``,
        index into ``phases``, -1 = ordinary surface.

    efficiencies : optional sequence aligned with ``phases``
        Power efficiency of the imparted kick, per profile: ``None``
        (unit), a float, or ``eta(wavelength, cos_i) -> (N,)`` (the
        nanostructure electromagnetics are not solved -- supply measured
        curves, e.g. a metalens's chromatic efficiency roll-off).  Same
        reserved ``__efficiency__`` mechanism as :func:`grating_reaction`.

    Evanescent kicks (|u_out_t| >= 1) fall back to the base reaction's
    child.  Field trackers compose as OUTER wrappers and follow the actual
    branch via the reserved ``__reflects__`` update (see
    :func:`grating_reaction`).
    """
    phases = list(phases)

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        if not phases:
            return (child_p0, child_p1, base_updates) if base_updates else (
                child_p0, child_p1)
        dtype = rays.p0.dtype
        d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))
        internal = nu > 0
        n1 = jnp.where(internal, n_in, n_out)
        n2_far = jnp.where(internal, n_out, n_in)

        meta = _per_surface_table(proj, meta_ids, rays.n_rays, -1)

        # phase gradient (and value) of every profile at every hit point,
        # selected by the per-ray meta id (profile count is small + static)
        point = rays.p1  # the engine substitutes the projected hit point
        grad_phi = jnp.zeros_like(point)
        phi = jnp.zeros((rays.n_rays,), dtype)
        is_refl = jnp.zeros((rays.n_rays,), bool)
        for s, (phase_fn, kind_s) in enumerate(phases):
            if kind_s not in ("transmission", "reflection"):
                raise ValueError(
                    f"metasurface kind must be 'transmission' or "
                    f"'reflection', got {kind_s!r}")
            vg = jax.vmap(jax.value_and_grad(phase_fn, argnums=0))
            val, g = vg(point, rays.wavelength)
            sel = (meta == s)[:, None]
            grad_phi = jnp.where(sel, jnp.asarray(g, dtype), grad_phi)
            phi = jnp.where(meta == s, jnp.asarray(val, dtype), phi)
            is_refl = jnp.where(meta == s, kind_s == "reflection", is_refl)

        g_t = grad_phi - jnp.sum(grad_phi * n, axis=-1, keepdims=True) * n
        n2 = jnp.where(is_refl, n1, n2_far)
        n2_safe = jnp.where(n2 != 0, n2, jnp.ones_like(n2))
        kick = rays.wavelength / (2.0 * jnp.pi * n2_safe)
        p0, p1, use = _tangential_child(
            rays, cfg, d, n, nu, n1, n2, is_refl, kick[:, None] * g_t,
            child_p0, child_p1, meta >= 0)
        base_updates["__reflects__"] = jnp.where(use, is_refl, reflects)
        # the imparted phase IS optical path (phi lambda / 2 pi): report it
        # so a composed OPL tracker keeps wavefront objectives / Huygens
        # PSFs correct through metasurfaces (reserved key; consumed by
        # optical_path_reaction, dropped by the engine otherwise)
        base_updates["__opl_add__"] = jnp.where(
            use, phi * rays.wavelength / (2.0 * jnp.pi),
            jnp.zeros_like(phi))
        if efficiencies is not None:
            eff = jnp.ones((rays.n_rays,), dtype)
            for s, e in enumerate(efficiencies):
                if e is None:
                    continue
                val = (e(rays.wavelength, cos_i) if callable(e)
                       else jnp.asarray(e, dtype))
                val = jnp.broadcast_to(jnp.asarray(val, dtype),
                                       (rays.n_rays,))
                eff = jnp.where(meta == s, val, eff)
            base_updates["__efficiency__"] = (
                base_updates.get("__efficiency__", 1.0)
                * jnp.where(use, eff, jnp.ones_like(eff)))
        return p0, p1, base_updates

    return reaction


def hyperbolic_metalens_phase(focal_length, design_wavelength, axis=0,
                              center=None):
    """The ideal metalens profile: ``phi(p) = -(2 pi / lambda_0)
    (sqrt(r^2 + f^2) - f)`` with ``r`` the in-plane distance from the lens
    center -- focuses a collimated design-wavelength beam to a perfect
    point at distance f [Khorasaninejad et al., Science 352, 1190 (2016)].
    ``axis``: the optical-axis coordinate index (excluded from r)."""

    def phase(point, wavelength):
        del wavelength  # static structure: momentum kick fixed at design
        c = (jnp.zeros_like(point) if center is None
             else jnp.asarray(center, point.dtype))
        rel = point - c
        r2 = jnp.sum(rel * rel) - rel[axis] * rel[axis]
        f = jnp.asarray(focal_length, point.dtype)
        return -2.0 * jnp.pi / design_wavelength * (
            jnp.sqrt(r2 + f * f) - f)

    return phase


class Metasurface(RayOperation):
    """Class-op wrapper for :func:`metasurface_reaction`."""

    input_signature = frozenset({"wavelength"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"wavelength"})

    def __init__(self, phases, meta_ids, base_reaction=default_reaction,
                 efficiencies=None, **kw):
        super().__init__(**kw)
        self.reaction = metasurface_reaction(phases, meta_ids, base_reaction,
                                             efficiencies=efficiencies)


# ======================================================================
# rough surfaces (Gaussian micro-facet scattering lobe)
# ======================================================================

def rough_surface_reaction(sigmas, rough_ids, key,
                           base_reaction=default_reaction):
    """Monte-Carlo surface roughness: children of marked surfaces are
    scattered in a Gaussian lobe around the specular/refracted direction
    (the small-slope micro-facet limit), for stray-light and diffuser
    modeling (beyond the reference, whose surfaces are perfectly smooth).

    Randomness is STATELESS and reproducible under jit/scan: each ray
    carries a ``scatter_ctr`` interaction counter (seed with
    :func:`seed_scatter`), and the per-ray, per-interaction stream is
    ``fold_in(key, slot + counter * stride)`` -- the same key always
    produces the same trace, a new key resamples the roughness, and
    vmapping over keys gives Monte-Carlo ensembles in one program.

    Parameters
    ----------
    sigmas : sequence of floats
        RMS scattering angle (radians) per roughness class; traced values
        supported (differentiable through the reparameterized Gaussian
        perturbation, so roughness can be FIT to measured scatter).
    rough_ids : dict of per-surface tables
        ``{"triangles": arr}`` / ``{"segments": arr, "arcs": arr}``, index
        into ``sigmas``, -1 = smooth.
    key : jax PRNG key
        Base key for the scatter stream.

    An unmarked surface reproduces the base child bit-exactly; sigma == 0
    on a marked surface reproduces it to rounding (the scattered branch
    stays selected so d(child)/d(sigma) is nonzero at sigma == 0 and a
    roughness fit can start from smooth).  Below-horizon draws of wide
    lobes at grazing incidence are folded back into the child's hemisphere
    (folded Gaussian), so scattered rays never pass through the surface.
    """

    sigmas = list(sigmas)

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        if "scatter_ctr" not in rays.fields:
            raise KeyError(
                "rough_surface_reaction: rays carry no 'scatter_ctr' "
                "field; seed the source rays with seed_scatter()")
        if not sigmas:
            return child_p0, child_p1, base_updates
        dtype = rays.p0.dtype
        n_rays = rays.n_rays
        rough = _per_surface_table(proj, rough_ids, n_rays, -1)
        sigma = jnp.zeros((n_rays,), dtype)
        for s, sg in enumerate(sigmas):
            sigma = jnp.where(rough == s, jnp.asarray(sg, dtype), sigma)

        ctr = rays.fields["scatter_ctr"]
        mix = (jnp.arange(n_rays, dtype=jnp.uint32)
               + ctr.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        keys = jax.vmap(jax.random.fold_in, (None, 0))(key, mix)
        dim = child_p0.shape[-1]
        g = jax.vmap(lambda k: jax.random.normal(k, (3,)))(keys)[:, :dim]
        g = g.astype(dtype)

        u = child_p1 - child_p0
        u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True),
                            jnp.finfo(dtype).tiny)
        if dim == 2:
            # rotate the child direction by a Gaussian angle
            ang = sigma * g[:, 0]
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            scattered = jnp.stack([ca * u[:, 0] - sa * u[:, 1],
                                   sa * u[:, 0] + ca * u[:, 1]], axis=1)
        else:
            # two Gaussian components in the transverse frame of u
            t1, t2 = geometry.transverse_basis(u)
            perturbed = (u + (sigma * g[:, 0])[:, None] * t1
                         + (sigma * g[:, 1])[:, None] * t2)
            scattered = perturbed / jnp.maximum(
                jnp.linalg.norm(perturbed, axis=-1, keepdims=True),
                jnp.finfo(dtype).tiny)

        # fold below-horizon draws back into the child's hemisphere: near
        # grazing, a wide lobe would otherwise send "reflected" rays
        # THROUGH the surface (and the composed trackers' medium
        # bookkeeping would be wrong for them).  Reflecting the normal
        # component keeps the folded-Gaussian density on the correct side.
        n_surf = _fresnel_prelude(proj, rays)[1]
        s_dot = jnp.sum(scattered * n_surf, axis=-1)
        u_dot = jnp.sum(u * n_surf, axis=-1)
        crossed = (s_dot * u_dot) < 0
        scattered = jnp.where(crossed[:, None],
                              scattered - 2.0 * s_dot[:, None] * n_surf,
                              scattered)

        length = jnp.asarray(cfg.new_ray_length, dtype)
        # no sigma != 0 gate: the scattered branch must stay selected at
        # sigma == 0 so d(child)/d(sigma) is the true linearization there
        # (a where-gate would zero it and strand a roughness FIT started
        # from smooth), and at sigma == 0 scattered == u to rounding
        use = rough >= 0
        p1 = jnp.where(use[:, None], child_p0 + length * scattered,
                       child_p1)
        return child_p0, p1, _merge_updates(
            base_updates, {"scatter_ctr": ctr + 1})

    return reaction


def seed_scatter(rays: RaySet) -> RaySet:
    """Attach the ``scatter_ctr`` interaction counter for
    :func:`rough_surface_reaction`."""
    return rays.with_field("scatter_ctr",
                           jnp.zeros((rays.n_rays,), jnp.int32))


class RoughSurface(RayOperation):
    """Class-op wrapper for :func:`rough_surface_reaction`."""

    input_signature = frozenset({"scatter_ctr", "wavelength"})
    output_signature = frozenset({"scatter_ctr"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"scatter_ctr", "wavelength"})

    def __init__(self, sigmas, rough_ids, key,
                 base_reaction=default_reaction, **kw):
        super().__init__(**kw)
        self.reaction = rough_surface_reaction(sigmas, rough_ids, key,
                                               base_reaction)


# ======================================================================
# surface absorbers (baffles, vanes, housing walls)
# ======================================================================

def surface_absorber_reaction(absorptivity_tables,
                              base_reaction=default_reaction,
                              field="intensity"):
    """Per-SURFACE absorptivity: each interaction with a marked surface
    multiplies the ray's ``fields[field]`` by ``1 - A`` (A = the surface's
    absorptivity), modeling black paint, baffles and housing walls in
    stray-light analyses -- the counterpart of :func:`absorption_reaction`
    (bulk media) for surface losses.  Unmarked kinds lose nothing.

    ``absorptivity_tables``: ``{"triangles": arr}`` / ``{"segments": arr,
    "arcs": arr}`` per-surface absorptivity in [0, 1] (traced values
    supported -- differentiable).  Composes with the other field trackers
    via ``base_reaction`` (multiplicative chaining on the shared field).
    """
    from tensorflowraytrace_tpu.ops import intersect as isect

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        dtype = rays.p0.dtype
        zero = jnp.zeros((rays.n_rays,), dtype)
        a = zero
        if proj.dim == 3:
            tab = absorptivity_tables.get("triangles")
            if tab is not None:
                tab = jnp.asarray(tab, dtype)
                idx = jnp.clip(proj.surf_idx, 0, tab.shape[0] - 1)
                a = tab[idx]
        else:
            for key, kind in (("segments", isect.KIND_SEGMENT),
                              ("arcs", isect.KIND_ARC)):
                tab = absorptivity_tables.get(key)
                if tab is None:
                    continue
                tab = jnp.asarray(tab, dtype)
                idx = jnp.clip(proj.surf_idx, 0, tab.shape[0] - 1)
                a = jnp.where(proj.kind == kind, tab[idx], a)
        old = _chain_field(base_updates, rays, field,
                           "surface_absorber_reaction")
        factor = jnp.clip(1.0 - a, 0.0, 1.0)
        return child_p0, child_p1, _merge_updates(
            base_updates, {field: old * factor.astype(old.dtype)})

    return reaction


class SurfaceAbsorber(RayOperation):
    """Class-op wrapper for :func:`surface_absorber_reaction`."""

    input_signature = frozenset({"intensity", "wavelength"})
    output_signature = frozenset({"intensity"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"intensity", "wavelength"})

    def __init__(self, absorptivity_tables, base_reaction=default_reaction,
                 field="intensity", **kw):
        super().__init__(**kw)
        self.reaction = surface_absorber_reaction(absorptivity_tables,
                                                  base_reaction, field)


# ======================================================================
# ghost-path (multi-branch) tracing for coated optics
# ======================================================================

def branch_override_reaction(schedule, base_reaction=default_reaction):
    """Deterministic ghost-path tracing: force the reflect/transmit branch
    per optical interaction (VERDICT r3 next-round #3; the reference's
    closest hook is GhostThrough, operation.py:311-333, which can only pass
    straight through).

    The fixed-slot engine follows exactly ONE child per interaction, so a
    partially reflective surface (bare Fresnel or a thin-film beam
    splitter) can weight both branches but never follow both.  This
    reaction closes that gap without changing the engine: a *branch
    schedule* assigns each interaction index a forced branch, and
    re-tracing the same rays under different schedules enumerates the
    ghost tree -- the standard stray-light analysis for coated optics
    (double-bounce lens ghosts are schedule ``[0, 1, 1, 0]``: transmit,
    reflect, reflect, transmit).

    Parameters
    ----------
    schedule : (K,) int sequence or array
        Per-interaction branch codes, indexed by the ray's own interaction
        counter (the ``branch_ctr`` field, seeded with
        :func:`seed_branch_counter`):

        * ``-1`` -- follow physics (the base reaction's child: Snell
          refract / TIR / mirror, or a grating's diffracted order),
        * ``0``  -- force TRANSMIT: the Snell-refracted direction.  Under
          TIR (no transmitted wave exists) the direction is the clamped
          near-tangential limit and carries zero power through the
          intensity trackers (T = 1 - R = 0); through an n == 0 mirror it
          continues straight (GhostThrough semantics), also at zero power,
        * ``1``  -- force REFLECT: the specular direction.

        Interactions beyond ``len(schedule)`` follow physics.  May be a
        traced array: vmapping one trace over a (P, K) batch of schedules
        follows P ghost paths in a single compiled program (see
        :func:`all_branch_schedules` and examples/ghost_analysis.py).

    Composes as a BASE reaction under the field trackers, which follow the
    forced branch through the reserved ``__reflects__`` update -- so
    ``thin_film_intensity_reaction(..., base_reaction=
    branch_override_reaction(sched))`` multiplies exactly the R's and T's
    of the forced path: the traced ghost power IS the product the analytic
    ghost formula predicts, and summing leaf powers over the full depth-K
    binary tree conserves energy for lossless stacks (see
    tests/test_ghost.py).
    """

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        if "branch_ctr" not in rays.fields:
            raise KeyError(
                "branch_override_reaction: rays carry no 'branch_ctr' "
                "field; seed the source rays with seed_branch_counter()")
        dtype = rays.p0.dtype
        eps = jnp.finfo(dtype).eps
        ctr = rays.fields["branch_ctr"]

        sched = jnp.asarray(schedule, jnp.int32).reshape(-1)
        # append a follow-physics sentinel so interactions past the
        # schedule's end gather -1 (clip keeps the gather in bounds)
        sched = jnp.concatenate(
            [sched, jnp.full((1,), -1, jnp.int32)])
        idx = jnp.clip(ctr.astype(jnp.int32), 0, sched.shape[0] - 1)
        force = sched[idx]

        d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))

        # oriented normal m faces the incoming ray (m . d = -cos_i); at
        # exactly-grazing nu == 0 pick +n (sign irrelevant: cos_i == 0)
        sgn = jnp.where(nu >= 0, jnp.ones_like(nu), -jnp.ones_like(nu))
        m = -sgn[:, None] * n

        refl_dir = d - 2.0 * nu[:, None] * n
        # forced transmit: vector Snell with the engine's clamped-radicand
        # discipline (TIR slots get the near-tangential limit -- zero power
        # via the trackers, finite gradients via the eps^2 floor)
        cos_t = jnp.sqrt(jnp.maximum(radicand, eps * eps))
        trans_dir = eta[:, None] * d + (eta * cos_i - cos_t)[:, None] * m
        # through a mirror sentinel (eta == 0) the "transmitted" direction
        # degenerates to ~0; continue straight instead (GhostThrough)
        trans_dir = jnp.where((eta == 0.0)[:, None], d, trans_dir)

        forced_dir = jnp.where((force == 1)[:, None], refl_dir, trans_dir)
        length = jnp.asarray(cfg.new_ray_length, dtype)
        use = force >= 0
        p0 = jnp.where(use[:, None], rays.p1, child_p0)
        p1 = jnp.where(use[:, None], rays.p1 + length * forced_dir,
                       child_p1)

        base_reflects = _effective_reflects(base_updates, reflects)
        base_updates["__reflects__"] = jnp.where(use, force == 1,
                                                 base_reflects)
        return p0, p1, _merge_updates(base_updates,
                                      {"branch_ctr": ctr + 1})

    return reaction


def seed_branch_counter(rays: RaySet) -> RaySet:
    """Attach the ``branch_ctr`` interaction counter for
    :func:`branch_override_reaction` (increments once per optical
    interaction, so schedules index surface encounters, not scan steps)."""
    return rays.with_field("branch_ctr",
                           jnp.zeros((rays.n_rays,), jnp.int32))


def all_branch_schedules(depth: int):
    """The (2**depth, depth) int32 array of every forced branch schedule of
    the given depth -- the full binary ghost tree.  Row bit j is the branch
    at interaction j (0 transmit, 1 reflect); feed rows to
    :func:`branch_override_reaction` (vmap over rows traces every path in
    one program).

    Leaves that exit the system after j < depth interactions are shared by
    ``2**(depth - j)`` rows; divide such a leaf's power by that
    multiplicity when summing the tree (or sum ``power / 2**(depth -
    branch_ctr)`` uniformly -- see tests/test_ghost.py's conservation
    check)."""
    idx = jnp.arange(1 << depth, dtype=jnp.uint32)
    bits = (idx[:, None] >> jnp.arange(depth, dtype=jnp.uint32)) & 1
    return bits.astype(jnp.int32)


class BranchOverride(RayOperation):
    """Class-op wrapper for :func:`branch_override_reaction`: children
    follow a forced reflect/transmit schedule for ghost-path enumeration."""

    input_signature = frozenset({"branch_ctr", "wavelength"})
    output_signature = frozenset({"branch_ctr"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"branch_ctr", "wavelength"})

    def __init__(self, schedule, base_reaction=default_reaction, **kw):
        super().__init__(**kw)
        self.reaction = branch_override_reaction(schedule, base_reaction)


def russian_roulette_reaction(key, base_reaction=default_reaction,
                              roulette_ids=None, defensive_floor=0.0):
    """Stochastic multi-branch tracing: sample reflect-vs-transmit with
    probability proportional to the branch's Fresnel power, compensating
    the weight so intensity estimates stay UNBIASED -- the production
    Monte-Carlo complement to :func:`branch_override_reaction`'s exact
    ghost-tree enumeration (2^K schedules): one stochastic trace of N rays
    explores the whole tree at O(N) cost, with variance instead of
    exponential path count.

    At each sampled interface the reaction draws u ~ U[0,1) from the same
    stateless per-ray counter stream the rough-surface reaction uses
    (``rr_ctr`` field, seed with :func:`seed_roulette`; same key -> same
    trace, vmap over keys -> ensembles) and reflects iff ``u < p`` with
    ``p = R_eff`` (the effective Fresnel reflectance: exactly 1 under
    TIR/mirror, so those stay deterministic).  It reports the sampled
    branch via ``__reflects__`` and the compensation ``1/p`` (reflect) or
    ``1/(1-p)`` (transmit) via ``__efficiency__`` -- the intensity tracker
    then multiplies ``R_eff / p`` or ``(1 - R_eff)/(1 - p)``, which is
    exactly 1 when sampling is power-proportional: the carried intensity
    stays 1 and the LANDED RAY COUNT distribution is the power
    distribution.  ``defensive_floor`` > 0 clamps p into
    [floor, 1 - floor] on partial interfaces (bounded weights, classic
    defensive sampling); weights then differ from 1 but the estimator
    remains unbiased (tests/test_roulette.py pins both properties against
    the deterministic branch-tree enumeration).

    ``roulette_ids``: optional per-surface tables (like ``grating_ids``);
    surfaces marked -1 follow the base reaction deterministically.  Omit to
    sample EVERY optical interface.  Bare-Fresnel reflectance only: for
    thin-film-coated surfaces the compensation must use the stack's R --
    enumerate those deterministically (branch_override) or extend via a
    custom reflectance model.  Beyond the reference (tfrt follows one
    branch, always).
    """

    def reaction(proj, rays, cfg):
        child_p0, child_p1, base_updates = _run_base(
            base_reaction, proj, rays, cfg)
        if "rr_ctr" not in rays.fields:
            raise KeyError(
                "russian_roulette_reaction: rays carry no 'rr_ctr' field; "
                "seed the source rays with seed_roulette()")
        dtype = rays.p0.dtype
        eps = jnp.finfo(dtype).eps
        n_rays = rays.n_rays
        ctr = rays.fields["rr_ctr"]

        d, n, nu, cos_i, n_in, n_out, eta, radicand, tir, reflects = (
            _fresnel_prelude(proj, rays))

        # effective reflectance, same clamp discipline as the intensity
        # tracker (R == 1 exactly under TIR / mirror)
        cos_t = jnp.sqrt(jnp.maximum(radicand, eps * eps))
        rs_d = jnp.maximum(eta * cos_i + cos_t, eps)
        rp_d = jnp.maximum(eta * cos_t + cos_i, eps)
        rs = (eta * cos_i - cos_t) / rs_d
        rp = (eta * cos_t - cos_i) / rp_d
        R = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)
        R_eff = jnp.where(reflects, jnp.ones_like(R), R)

        partial = (R_eff > 0.0) & (R_eff < 1.0)
        if defensive_floor:
            f = jnp.asarray(defensive_floor, dtype)
            p = jnp.where(partial, jnp.clip(R_eff, f, 1.0 - f), R_eff)
        else:
            p = R_eff

        mix = (jnp.arange(n_rays, dtype=jnp.uint32)
               + ctr.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
        keys = jax.vmap(jax.random.fold_in, (None, 0))(key, mix)
        u = jax.vmap(lambda k: jax.random.uniform(k, (), dtype))(keys)
        take_reflect = u < p

        # forced-branch geometry (same construction as branch_override)
        sgn = jnp.where(nu >= 0, jnp.ones_like(nu), -jnp.ones_like(nu))
        m = -sgn[:, None] * n
        refl_dir = d - 2.0 * nu[:, None] * n
        trans_dir = eta[:, None] * d + (eta * cos_i - cos_t)[:, None] * m
        trans_dir = jnp.where((eta == 0.0)[:, None], d, trans_dir)
        chosen = jnp.where(take_reflect[:, None], refl_dir, trans_dir)

        if roulette_ids is None:
            marked = jnp.ones((n_rays,), bool)
        else:
            marked = _per_surface_table(proj, roulette_ids, n_rays, -1) >= 0
        length = jnp.asarray(cfg.new_ray_length, dtype)
        p0 = jnp.where(marked[:, None], rays.p1, child_p0)
        p1 = jnp.where(marked[:, None], rays.p1 + length * chosen, child_p1)

        base_reflects = _effective_reflects(base_updates, reflects)
        base_updates["__reflects__"] = jnp.where(marked, take_reflect,
                                                 base_reflects)
        tiny = jnp.finfo(dtype).tiny
        comp = jnp.where(take_reflect,
                         1.0 / jnp.maximum(p, tiny),
                         1.0 / jnp.maximum(1.0 - p, tiny))
        base_updates["__efficiency__"] = (
            base_updates.get("__efficiency__", 1.0)
            * jnp.where(marked, comp, jnp.ones_like(comp)))
        return p0, p1, _merge_updates(base_updates, {"rr_ctr": ctr + 1})

    return reaction


def seed_roulette(rays: RaySet) -> RaySet:
    """Attach the ``rr_ctr`` interaction counter for
    :func:`russian_roulette_reaction`."""
    return rays.with_field("rr_ctr", jnp.zeros((rays.n_rays,), jnp.int32))


class RussianRoulette(RayOperation):
    """Class-op wrapper for :func:`russian_roulette_reaction`: stochastic
    power-proportional branch sampling for Monte-Carlo stray light."""

    input_signature = frozenset({"rr_ctr", "wavelength"})
    output_signature = frozenset({"rr_ctr"})
    optical_signature = frozenset({"mat_in", "mat_out"})
    material_signature = frozenset({"n"})
    simple_ray_inheritance = frozenset({"rr_ctr", "wavelength"})

    def __init__(self, key, base_reaction=default_reaction,
                 roulette_ids=None, defensive_floor=0.0, **kw):
        super().__init__(**kw)
        self.reaction = russian_roulette_reaction(
            key, base_reaction, roulette_ids, defensive_floor)
