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
