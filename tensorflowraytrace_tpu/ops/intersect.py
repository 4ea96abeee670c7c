"""Nearest-hit ray/scene intersection.

This is the hot loop of the whole framework (reference call stack:
engine.py:687-749 / 767-866 for 2D, engine.py:1102-1166 for 3D -- dense N x M
meshgrid + inf-fill + argmin + gather).  The TPU-native design splits it in
two phases:

1. **Search** (``nearest_hit_*``): find, per ray, the index of the nearest
   valid surface.  Runs under ``lax.stop_gradient`` -- an argmin index is
   discrete, so no gradient information is lost.  Tiled over surfaces (and
   ray blocks) so the N x M intersection matrix is never materialized in HBM
   -- the reference's memory wall (SURVEY.md item 5).  A Pallas kernel
   (ops/pallas_kernels.py) implements the same contract for large problems.

2. **Refine** (``refine_*``): re-run the single chosen ray/surface
   intersection per ray -- O(N), fully differentiable.  Gradients flow
   through the gathered surface geometry exactly as they do through the
   reference's ``gather_nd`` of the dense result (engine.py:744-747), at a
   fraction of the backward-pass cost.

Validity pruning matches the reference exactly:
  segments: seg_u in [-size_eps, 1 + size_eps], ray_u >= ray_start_eps
            (engine.py:722-724)
  arcs:     u >= ray_start_eps, hit angle inside [angle_start, angle_end]
            (engine.py:803-829); +/- quadratic branches resolved by min u
  triangles: trig_u >= -size_eps, trig_v >= -size_eps,
             trig_u + trig_v <= 1 + size_eps, ray_u >= ray_start_eps
             (engine.py:1138-1141)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from tensorflowraytrace_tpu.ops import geometry
from tensorflowraytrace_tpu.models.surfaces import ArcSet, Scene2D, SegmentSet, TriangleSet

# Surface-kind codes for the combined 2D hit record.
KIND_SEGMENT = 0
KIND_ARC = 1

_DEF_SURF_CHUNK = 128
_DEF_RAY_BLOCK = 32768


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["valid", "idx", "ray_u", "kind", "branch"],
    meta_fields=[],
)
@dataclass
class HitRecord:
    """Per-ray nearest-hit search result (all leaves shape (N,)).

    valid  : found any valid intersection
    idx    : index of the winning surface in the merged set (garbage if ~valid)
    ray_u  : parameter along the ray of the winning hit (stop-grad; only used
             for comparisons, never for geometry)
    kind   : 2D only -- KIND_SEGMENT or KIND_ARC
    branch : 2D arcs only -- True where the quadratic minus-branch won
    """

    valid: jax.Array
    idx: jax.Array
    ray_u: jax.Array
    kind: jax.Array
    branch: jax.Array


def _inf(dtype):
    return jnp.asarray(jnp.inf, dtype=dtype)


def _chunked_search(p0, p1, surf_arrays, chunk_fn, n_surf, surf_chunk, ray_block):
    """Generic tiled nearest-hit search.

    ``chunk_fn(p0, p1, chunk) -> (u, valid, extra)`` computes, for a ray block
    (B, dim) against a surface chunk (C pytree), the (B, C) ray parameter,
    validity, and an optional (B, C) extra payload (e.g. arc branch choice).
    Returns per-ray (valid, idx, u, extra) with idx into the full surface set.
    """
    p0 = lax.stop_gradient(p0)
    p1 = lax.stop_gradient(p1)
    surf_arrays = lax.stop_gradient(surf_arrays)

    n_rays = p0.shape[0]
    n_chunks = -(-n_surf // surf_chunk)
    pad_surf = n_chunks * surf_chunk - n_surf

    def pad0(a):
        cfg = [(0, pad_surf)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg)

    surf_arrays = jax.tree.map(pad0, surf_arrays)
    # reshape to (n_chunks, surf_chunk, ...)
    chunked = jax.tree.map(
        lambda a: a.reshape((n_chunks, surf_chunk) + a.shape[1:]), surf_arrays
    )

    def per_block(args):
        bp0, bp1 = args
        b = bp0.shape[0]

        def scan_body(carry, chunk):
            best_u, best_idx, best_extra, any_valid, chunk_i = carry
            u, valid, extra = chunk_fn(bp0, bp1, chunk)  # (B, C)
            u = jnp.where(valid, u, _inf(u.dtype))
            c_arg = jnp.argmin(u, axis=1)                      # (B,)
            rows = jnp.arange(b)
            c_u = u[rows, c_arg]
            c_extra = extra[rows, c_arg] if extra is not None else None
            c_idx = (chunk_i * surf_chunk + c_arg).astype(jnp.int32)
            better = c_u < best_u
            best_u = jnp.where(better, c_u, best_u)
            best_idx = jnp.where(better, c_idx, best_idx)
            if extra is not None:
                best_extra = jnp.where(better, c_extra, best_extra)
            any_valid = any_valid | jnp.any(valid, axis=1)
            return (best_u, best_idx, best_extra, any_valid, chunk_i + 1), None

        init = (
            jnp.full((b,), jnp.inf, dtype=bp0.dtype),
            jnp.zeros((b,), dtype=jnp.int32),
            jnp.zeros((b,), dtype=bool),
            jnp.zeros((b,), dtype=bool),
            jnp.asarray(0, dtype=jnp.int32),
        )
        (best_u, best_idx, best_extra, any_valid, _), _ = lax.scan(
            scan_body, init, chunked
        )
        return best_u, best_idx, best_extra, any_valid

    if n_rays > ray_block:
        # Pad to a whole number of blocks so the memory ceiling holds for any
        # ray count (a non-divisible N used to silently fall back to one giant
        # block).  Padded rays are degenerate (p0 == p1 == 0) and their results
        # are sliced off below.
        nb = -(-n_rays // ray_block)
        pad_rays = nb * ray_block - n_rays
        padr = lambda a: jnp.pad(a, [(0, pad_rays)] + [(0, 0)] * (a.ndim - 1))
        rb = lambda a: padr(a).reshape((nb, ray_block) + a.shape[1:])
        best_u, best_idx, best_extra, any_valid = lax.map(
            per_block, (rb(p0), rb(p1))
        )
        flat = lambda a: a.reshape((nb * ray_block,) + a.shape[2:])[:n_rays]
        return flat(any_valid), flat(best_idx), flat(best_u), flat(best_extra)

    best_u, best_idx, best_extra, any_valid = per_block((p0, p1))
    return any_valid, best_idx, best_u, best_extra


# ======================================================================
# Triangles (3D)
# ======================================================================

def nearest_hit_triangles(
    p0, p1, tri: TriangleSet, intersect_eps, size_eps, ray_start_eps,
    surf_chunk=_DEF_SURF_CHUNK, ray_block=_DEF_RAY_BLOCK, use_pallas=False,
    cull=False,
) -> HitRecord:
    """Per-ray nearest triangle (search phase; non-differentiable)."""
    if use_pallas:
        from tensorflowraytrace_tpu.ops.pallas_kernels import nearest_hit_triangles_pallas

        valid, idx, ray_u = nearest_hit_triangles_pallas(
            p0, p1, tri, intersect_eps, size_eps, ray_start_eps, cull=cull
        )
        z = jnp.zeros_like(idx)
        return HitRecord(valid=valid, idx=idx, ray_u=ray_u,
                         kind=z, branch=jnp.zeros_like(valid))

    def chunk_fn(bp0, bp1, chunk):
        vp, v1, v2 = chunk
        r = lambda a: a[:, None]        # (B, 1)
        s = lambda a: a[None, :]        # (1, C)
        _, _, _, valid, ray_u, tu, tv = geometry.raw_line_triangle_intersect(
            r(bp0[:, 0]), r(bp0[:, 1]), r(bp0[:, 2]),
            r(bp1[:, 0]), r(bp1[:, 1]), r(bp1[:, 2]),
            s(vp[:, 0]), s(vp[:, 1]), s(vp[:, 2]),
            s(v1[:, 0]), s(v1[:, 1]), s(v1[:, 2]),
            s(v2[:, 0]), s(v2[:, 1]), s(v2[:, 2]),
            intersect_eps,
        )
        valid = valid & (tu >= -size_eps) & (tv >= -size_eps)
        valid = valid & (tu + tv <= 1 + size_eps) & (ray_u >= ray_start_eps)
        return ray_u, valid, None

    valid, idx, ray_u, _ = _chunked_search(
        p0, p1, (tri.vp, tri.v1, tri.v2), chunk_fn, tri.n_surfaces,
        surf_chunk, ray_block,
    )
    z = jnp.zeros_like(idx)
    return HitRecord(valid=valid, idx=idx, ray_u=ray_u, kind=z,
                     branch=jnp.zeros_like(valid))


def refine_triangle_hit(p0, p1, tri: TriangleSet, idx, intersect_eps):
    """Differentiable recompute of the chosen ray/triangle intersection.

    Returns ``(point (N,3), ray_u, trig_u, trig_v)``.  Gradients flow into the
    gathered triangle vertices (and back to mesh parameters) and the ray
    endpoints, mirroring the reference's gather-of-dense-result semantics.
    """
    idx = lax.stop_gradient(idx)
    return refine_triangle_hit_from(p0, p1, tri.vp[idx], tri.v1[idx],
                                    tri.v2[idx], intersect_eps)


def refine_triangle_hit_from(p0, p1, vp, v1, v2, intersect_eps):
    """Refine against already-gathered per-ray triangle vertices (used by the
    engine's fused-table gather; dynamic gathers are the dominant per-bounce
    cost on TPU, so they are done once for all surface data)."""
    x, y, z, _, ray_u, tu, tv = geometry.raw_line_triangle_intersect(
        p0[:, 0], p0[:, 1], p0[:, 2], p1[:, 0], p1[:, 1], p1[:, 2],
        vp[:, 0], vp[:, 1], vp[:, 2], v1[:, 0], v1[:, 1], v1[:, 2],
        v2[:, 0], v2[:, 1], v2[:, 2], intersect_eps,
    )
    return jnp.stack([x, y, z], axis=1), ray_u, tu, tv


# ======================================================================
# Segments (2D)
# ======================================================================

def nearest_hit_segments(
    p0, p1, seg: SegmentSet, intersect_eps, size_eps, ray_start_eps,
    surf_chunk=_DEF_SURF_CHUNK, ray_block=_DEF_RAY_BLOCK, use_pallas=False,
    cull=False,
) -> HitRecord:
    if use_pallas:
        from tensorflowraytrace_tpu.ops.pallas_kernels import nearest_hit_segments_pallas

        valid, idx, ray_u = nearest_hit_segments_pallas(
            p0, p1, seg, intersect_eps, size_eps, ray_start_eps, cull=cull
        )
        z = jnp.zeros_like(idx)
        return HitRecord(valid=valid, idx=idx, ray_u=ray_u, kind=z,
                         branch=jnp.zeros_like(valid))

    def chunk_fn(bp0, bp1, chunk):
        sp0, sp1 = chunk
        r = lambda a: a[:, None]
        s = lambda a: a[None, :]
        _, _, valid, ray_u, seg_u = geometry.raw_line_intersect(
            r(bp0[:, 0]), r(bp0[:, 1]), r(bp1[:, 0]), r(bp1[:, 1]),
            s(sp0[:, 0]), s(sp0[:, 1]), s(sp1[:, 0]), s(sp1[:, 1]),
            intersect_eps,
        )
        valid = valid & (seg_u >= -size_eps) & (seg_u <= 1 + size_eps)
        valid = valid & (ray_u >= ray_start_eps)
        return ray_u, valid, None

    valid, idx, ray_u, _ = _chunked_search(
        p0, p1, (seg.p0, seg.p1), chunk_fn, seg.n_surfaces, surf_chunk, ray_block
    )
    z = jnp.zeros_like(idx)
    return HitRecord(valid=valid, idx=idx, ray_u=ray_u, kind=z,
                     branch=jnp.zeros_like(valid))


def refine_segment_hit(p0, p1, seg: SegmentSet, idx, intersect_eps):
    """Differentiable recompute; returns ``(point (N,2), ray_u, seg_u, norm_angle)``."""
    idx = lax.stop_gradient(idx)
    return refine_segment_hit_from(p0, p1, seg.p0[idx], seg.p1[idx],
                                   intersect_eps)


def refine_segment_hit_from(p0, p1, sp0, sp1, intersect_eps):
    """Refine against already-gathered per-ray segment endpoints (used by the
    engine's fused-table gather; see refine_triangle_hit_from)."""
    x, y, _, ray_u, seg_u = geometry.raw_line_intersect(
        p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1],
        sp0[:, 0], sp0[:, 1], sp1[:, 0], sp1[:, 1], intersect_eps,
    )
    d = sp1 - sp0
    norm = jnp.arctan2(d[:, 1], d[:, 0]) + jnp.pi / 2
    return jnp.stack([x, y], axis=1), ray_u, seg_u, norm


# ======================================================================
# Arcs (2D)
# ======================================================================

def nearest_hit_arcs(
    p0, p1, arc: ArcSet, intersect_eps, size_eps, ray_start_eps,
    surf_chunk=_DEF_SURF_CHUNK, ray_block=_DEF_RAY_BLOCK, use_pallas=False,
    cull=False,
) -> HitRecord:
    if use_pallas:
        from tensorflowraytrace_tpu.ops.pallas_kernels import nearest_hit_arcs_pallas

        valid, idx, ray_u, branch = nearest_hit_arcs_pallas(
            p0, p1, arc, intersect_eps, ray_start_eps, cull=cull
        )
        return HitRecord(valid=valid, idx=idx, ray_u=ray_u,
                         kind=jnp.ones_like(idx), branch=branch)

    def chunk_fn(bp0, bp1, chunk):
        center, a1, a2, radius = chunk
        r = lambda a: a[:, None]
        s = lambda a: a[None, :]
        plus, minus = geometry.raw_line_circle_intersect(
            r(bp0[:, 0]), r(bp0[:, 1]), r(bp1[:, 0]), r(bp1[:, 1]),
            s(center[:, 0]), s(center[:, 1]), s(radius), intersect_eps,
        )
        a1b = s(a1)
        a2b = s(a2)
        pv = plus["valid"] & (plus["u"] >= ray_start_eps)
        mv = minus["valid"] & (minus["u"] >= ray_start_eps)
        pv = pv & geometry.angle_in_interval(plus["v"], a1b, a2b)
        mv = mv & geometry.angle_in_interval(minus["v"], a1b, a2b)

        pu = jnp.where(pv, plus["u"], _inf(plus["u"].dtype))
        mu = jnp.where(mv, minus["u"], _inf(minus["u"].dtype))
        choose_minus = mu < pu
        u = jnp.where(choose_minus, mu, pu)
        valid = pv | mv
        return u, valid, choose_minus

    valid, idx, ray_u, branch = _chunked_search(
        p0, p1, (arc.center, arc.angle_start, arc.angle_end, arc.radius),
        chunk_fn, arc.n_surfaces, surf_chunk, ray_block,
    )
    return HitRecord(valid=valid, idx=idx, ray_u=ray_u,
                     kind=jnp.ones_like(idx), branch=branch)


def refine_arc_hit(p0, p1, arc: ArcSet, idx, branch, intersect_eps):
    """Differentiable recompute for the chosen arc & quadratic branch.

    Returns ``(point (N,2), ray_u, arc_u, norm_angle)``; the norm follows
    the reference's convention: hit polar angle, +pi for negative radius,
    wrapped to [-pi, pi] (engine.py:666-670).
    """
    idx = lax.stop_gradient(idx)
    return refine_arc_hit_from(p0, p1, arc.center[idx], arc.radius[idx],
                               branch, intersect_eps)


def refine_arc_hit_from(p0, p1, center, radius, branch, intersect_eps):
    """Refine against already-gathered per-ray arc center/radius (used by the
    engine's fused-table gather)."""
    branch = lax.stop_gradient(branch)
    plus, minus = geometry.raw_line_circle_intersect(
        p0[:, 0], p0[:, 1], p1[:, 0], p1[:, 1],
        center[:, 0], center[:, 1], radius, intersect_eps,
    )
    pick = lambda key: jnp.where(branch, minus[key], plus[key])
    x = pick("x")
    y = pick("y")
    ray_u = pick("u")
    arc_u = pick("v")
    norm = jnp.where(radius < 0, arc_u + jnp.pi, arc_u)
    norm = jnp.mod(norm + jnp.pi, 2 * jnp.pi) - jnp.pi
    return jnp.stack([x, y], axis=1), ray_u, arc_u, norm


# ======================================================================
# Combined 2D search
# ======================================================================

def nearest_hit_2d(p0, p1, scene: Scene2D, intersect_eps, size_eps, ray_start_eps,
                   **kw) -> HitRecord:
    """Nearest hit across segments AND arcs; resolves the winner by smaller
    ray parameter (the reference's ``_seg_or_arc``, engine.py:626-657)."""
    seg_rec = None
    arc_rec = None
    if scene.segments is not None:
        seg_rec = nearest_hit_segments(
            p0, p1, scene.segments, intersect_eps, size_eps, ray_start_eps, **kw
        )
    if scene.arcs is not None:
        arc_rec = nearest_hit_arcs(
            p0, p1, scene.arcs, intersect_eps, size_eps, ray_start_eps, **kw
        )
    if arc_rec is None:
        return seg_rec
    if seg_rec is None:
        return arc_rec

    su = jnp.where(seg_rec.valid, seg_rec.ray_u, _inf(seg_rec.ray_u.dtype))
    au = jnp.where(arc_rec.valid, arc_rec.ray_u, _inf(arc_rec.ray_u.dtype))
    choose_seg = su < au
    return HitRecord(
        valid=seg_rec.valid | arc_rec.valid,
        idx=jnp.where(choose_seg, seg_rec.idx, arc_rec.idx),
        ray_u=jnp.where(choose_seg, su, au),
        kind=jnp.where(choose_seg, KIND_SEGMENT, KIND_ARC).astype(jnp.int32),
        branch=arc_rec.branch,
    )
