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
