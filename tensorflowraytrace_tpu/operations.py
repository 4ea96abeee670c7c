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
        child_p0, child_p1 = base_reaction(proj, rays, cfg)
        dtype = rays.p0.dtype
        d = rays.p1 - rays.p0
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                            jnp.finfo(dtype).tiny)
        if proj.dim == 3:
            n = proj.norm
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True),
                                jnp.finfo(dtype).tiny)
            nu = jnp.sum(n * d, axis=-1)
        else:
            n = jnp.stack([jnp.cos(proj.norm), jnp.sin(proj.norm)], axis=1)
            nu = jnp.sum(n * d, axis=-1)
        cos_i = jnp.abs(nu)

        # double-where NaN guard: non-reacting slots can carry non-finite
        # indices (the out-of-range material-id path deliberately produces
        # NaN n so the ray dies at the finite-child backstop -- a
        # forward-only guard).  The engine masks the forward factor by
        # jnp.where(reacts, ...), but the product's backward multiplies the
        # zeroed cotangent by the raw factor, and 0 * NaN = NaN would
        # contaminate the whole intensity gradient -- so sanitize the inputs
        # here, same discipline as snells_law_2D's safe_theta2.
        n_in = jnp.where(jnp.isfinite(proj.n_in), proj.n_in,
                         jnp.ones_like(proj.n_in))
        n_out = jnp.where(jnp.isfinite(proj.n_out), proj.n_out,
                          jnp.ones_like(proj.n_out))

        # same eta convention as every Snell form (ops/geometry.select_eta):
        # internal hits see n_in/n_out, external the inverse; mirror
        # sentinels propagate as eta == 0
        eta = geometry.select_eta(n_in, n_out, nu > 0)

        radicand = 1 - eta * eta * (1 - cos_i * cos_i)
        tir = radicand < 0
        cos_t = jnp.sqrt(jnp.maximum(radicand, jnp.finfo(dtype).eps ** 2))
        # rs/rp with n1/n2 expressed through eta = n1/n2
        rs_d = jnp.maximum(eta * cos_i + cos_t, jnp.finfo(dtype).eps)
        rp_d = jnp.maximum(eta * cos_t + cos_i, jnp.finfo(dtype).eps)
        rs = (eta * cos_i - cos_t) / rs_d
        rp = (eta * cos_t - cos_i) / rp_d
        reflectance = jnp.clip(0.5 * (rs * rs + rp * rp), 0.0, 1.0)

        # lossless on every branch the geometry REFLECTS: TIR, mirror
        # surfaces (n_in == 0, hit from either side), and the eta == 0 a
        # mat_out-mirror presents to an internal hit (2D genuinely reflects
        # there via the refract test's n != 0 term, geometry.py:601-653; in
        # 3D that configuration is out-of-contract -- "n_out should not be
        # zero", reference geometry.py:683 -- and treated as lossless too
        # rather than silently zeroing the ray's downstream power)
        reflects = tir | (n_in == 0) | (eta == 0.0)
        factor = jnp.where(reflects, jnp.ones_like(reflectance),
                           1.0 - reflectance)
        old = rays.fields.get(field)
        if old is None:
            raise KeyError(
                f"fresnel_intensity_reaction: rays carry no {field!r} field; "
                "seed it on the source rays (see docstring)")
        return child_p0, child_p1, {field: old * factor.astype(old.dtype)}

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
