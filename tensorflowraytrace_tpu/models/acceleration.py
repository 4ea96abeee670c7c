"""Spatial acceleration for the nearest-hit search.

The reference has no acceleration structure at all -- it brute-forces the
dense N x M product (SURVEY.md section 3.1).  The tiled Pallas kernel already
removes the memory wall; this module removes redundant *compute* for
structured scenes via conservative chunk culling:

1. ``morton_sort_triangles`` reorders a TriangleSet by the Morton code of
   triangle centroids, so consecutive kernel chunks are spatially compact.
2. ``chunk_aabbs`` computes one axis-aligned bounding box per kernel chunk.
3. The culled kernel (ops/pallas_kernels.py, ``cull=True``) slab-tests every
   ray against the chunk AABB and skips the chunk's full Moller-Trumbore
   math when (a) no ray in the block touches the box, or (b) every ray's
   current-best hit is already closer than the box entry distance.

Culling is *exactly* conservative: results are bit-identical to the
brute-force kernel (tested), it only skips work that cannot produce a nearer
hit.  Wins are largest for elongated scenes with coherent rays (light
guides, lens stacks); worst case (random soup, incoherent rays) degrades to
brute force plus a ~3% slab-test overhead.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu.models.surfaces import SegmentSet, TriangleSet


def _morton_codes(points: np.ndarray, bits: int = 10) -> np.ndarray:
    """Interleaved-bit Morton codes for (N, 2) or (N, 3) points normalized
    to the bounding box."""
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    span = np.maximum(hi - lo, 1e-30)
    if points.shape[1] == 2:
        bits = 16
    q = np.clip(((points - lo) / span * ((1 << bits) - 1)).astype(np.uint64),
                0, (1 << bits) - 1)

    if points.shape[1] == 2:
        def spread2(x):
            # spread 16 bits to every 2nd bit position
            x = (x | (x << 8)) & np.uint64(0x00FF00FF)
            x = (x | (x << 4)) & np.uint64(0x0F0F0F0F)
            x = (x | (x << 2)) & np.uint64(0x33333333)
            x = (x | (x << 1)) & np.uint64(0x55555555)
            return x

        return spread2(q[:, 0]) | (spread2(q[:, 1]) << np.uint64(1))

    def spread(x):
        # spread 10 bits to every 3rd bit position
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def morton_codes_device(points, lo, hi, bits=10):
    """Device-side Morton codes for (N, 2) or (N, 3) points given a bounding
    box (jnp version of _morton_codes, used for per-bounce ray re-sorting)."""
    span = jnp.maximum(hi - lo, 1e-30)
    if points.shape[1] == 2:
        bits = 16
    q = jnp.clip(((points - lo) / span * ((1 << bits) - 1)).astype(jnp.uint32),
                 0, (1 << bits) - 1)

    if points.shape[1] == 2:
        def spread2(x):
            x = (x | (x << 8)) & jnp.uint32(0x00FF00FF)
            x = (x | (x << 4)) & jnp.uint32(0x0F0F0F0F)
            x = (x | (x << 2)) & jnp.uint32(0x33333333)
            x = (x | (x << 1)) & jnp.uint32(0x55555555)
            return x

        return spread2(q[:, 0]) | (spread2(q[:, 1]) << jnp.uint32(1))

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << jnp.uint32(1))
            | (spread(q[:, 2]) << jnp.uint32(2)))


def morton_sort_triangles(tri: TriangleSet):
    """Reorder a TriangleSet by centroid Morton code.

    Returns ``(sorted_set, permutation)`` where ``sorted[i] ==
    original[permutation[i]]``.  Hit indices from a trace over the sorted set
    refer to the sorted order; keep the permutation if you need to map back.
    """
    centroids = np.asarray((tri.vp + tri.v1 + tri.v2) / 3.0)
    perm = np.argsort(_morton_codes(centroids), kind="stable")
    permj = jnp.asarray(perm)
    take = lambda a: jnp.take(a, permj, axis=0)
    sorted_set = dataclasses.replace(
        tri,
        vp=take(tri.vp), v1=take(tri.v1), v2=take(tri.v2),
        norm=take(tri.norm), category=take(tri.category),
        mat_in=take(tri.mat_in), mat_out=take(tri.mat_out),
        fields={k: take(v) for k, v in tri.fields.items()},
    )
    return sorted_set, perm


def morton_sort_segments(seg: SegmentSet):
    """Reorder a SegmentSet by midpoint Morton code (2D analogue of
    ``morton_sort_triangles``).  Returns ``(sorted_set, permutation)``."""
    mid = np.asarray((seg.p0 + seg.p1) / 2.0)
    perm = np.argsort(_morton_codes(mid), kind="stable")
    permj = jnp.asarray(perm)
    take = lambda a: jnp.take(a, permj, axis=0)
    sorted_set = dataclasses.replace(
        seg,
        p0=take(seg.p0), p1=take(seg.p1),
        category=take(seg.category),
        mat_in=take(seg.mat_in), mat_out=take(seg.mat_out),
        fields={k: take(v) for k, v in seg.fields.items()},
    )
    return sorted_set, perm


def chunk_aabbs_2d(p0, p1, chunk_size: int):
    """Per-chunk 2D AABBs over segment endpoints, padded to whole chunks.

    Returns an (8, C) array: rows 0-1 = box min xy, rows 2-3 = box max xy,
    rows 4-7 = padding (sublane alignment, same layout contract as
    ``chunk_aabbs``)."""
    m = p0.shape[0]
    c = -(-m // chunk_size)
    pad = c * chunk_size - m

    def prep(a):
        return jnp.pad(a, ((0, pad), (0, 0)), mode="edge").reshape(
            c, chunk_size, 2)

    pts = jnp.stack([prep(p0), prep(p1)], axis=0)  # (2, C, B, 2)
    lo = jnp.min(pts, axis=(0, 2))  # (C, 2)
    hi = jnp.max(pts, axis=(0, 2))
    out = jnp.zeros((8, c), dtype=p0.dtype)
    out = out.at[0:2].set(lo.T).at[2:4].set(hi.T)
    return out


def chunk_aabbs(vp, v1, v2, chunk_size: int):
    """Per-chunk AABBs, padded to a whole number of chunks.

    Returns an (8, C) array: rows 0-2 = box min xyz, rows 3-5 = box max xyz,
    rows 6-7 = padding (the kernel wants a sublane-aligned block).  Padded
    chunks get an empty box at the origin; their triangles are degenerate and
    fail the intersection test anyway.
    """
    m = vp.shape[0]
    c = -(-m // chunk_size)
    pad = c * chunk_size - m

    def prep(a):
        # edge-pad so the last chunk's box is not inflated toward the origin
        return jnp.pad(a, ((0, pad), (0, 0)), mode="edge").reshape(
            c, chunk_size, 3)

    pts = jnp.stack([prep(vp), prep(v1), prep(v2)], axis=0)  # (3, C, B, 3)
    lo = jnp.min(pts, axis=(0, 2))  # (C, 3)
    hi = jnp.max(pts, axis=(0, 2))
    out = jnp.zeros((8, c), dtype=vp.dtype)
    out = out.at[0:3].set(lo.T).at[3:6].set(hi.T)
    return out


def arc_aabbs(center, angle_start, angle_end, radius):
    """Tight per-arc 2D AABBs, window-aware.

    An arc's extent is its two endpoints plus whichever axis extremes
    (+x/+y/-x/-y directions) fall inside the angular window -- the same
    ccw-interval semantics as geometry.angle_in_interval / the kernel's
    cross-product window test.  |radius| is used (negative radius only flips
    the norm, not the geometry).  Returns (lo (M,2), hi (M,2))."""
    r = jnp.abs(radius)[:, None]
    sweep = angle_end - angle_start
    sweep = jnp.where(sweep < 0, sweep + 2 * jnp.pi, sweep)

    def pt(theta):
        return center + r * jnp.stack(
            [jnp.cos(theta), jnp.sin(theta)], axis=-1)

    p_start = pt(angle_start)
    p_end = pt(angle_end)
    lo = jnp.minimum(p_start, p_end)
    hi = jnp.maximum(p_start, p_end)
    for e, d in ((0.0, (1.0, 0.0)), (jnp.pi / 2, (0.0, 1.0)),
                 (jnp.pi, (-1.0, 0.0)), (3 * jnp.pi / 2, (0.0, -1.0))):
        in_window = (jnp.mod(e - angle_start, 2 * jnp.pi) <= sweep)[:, None]
        ext = center + r * jnp.asarray(d, dtype=center.dtype)
        lo = jnp.where(in_window, jnp.minimum(lo, ext), lo)
        hi = jnp.where(in_window, jnp.maximum(hi, ext), hi)
    return lo, hi


def morton_sort_arcs(arc):
    """Reorder an ArcSet by AABB-center Morton code (2D analogue of
    ``morton_sort_triangles``).  Returns ``(sorted_set, permutation)``."""
    lo, hi = arc_aabbs(arc.center, arc.angle_start, arc.angle_end, arc.radius)
    mid = np.asarray((lo + hi) / 2.0)
    perm = np.argsort(_morton_codes(mid), kind="stable")
    permj = jnp.asarray(perm)
    take = lambda a: jnp.take(a, permj, axis=0)
    sorted_set = dataclasses.replace(
        arc,
        center=take(arc.center), angle_start=take(arc.angle_start),
        angle_end=take(arc.angle_end), radius=take(arc.radius),
        category=take(arc.category),
        mat_in=take(arc.mat_in), mat_out=take(arc.mat_out),
        fields={k: take(v) for k, v in arc.fields.items()},
    )
    return sorted_set, perm


def chunk_aabbs_arcs(center, angle_start, angle_end, radius, chunk_size: int):
    """Per-chunk 2D AABBs over window-aware arc boxes, padded to whole chunks
    (same (8, C) layout contract as ``chunk_aabbs_2d``)."""
    lo, hi = arc_aabbs(center, angle_start, angle_end, radius)
    m = lo.shape[0]
    c = -(-m // chunk_size)
    pad = c * chunk_size - m

    def prep(a):
        return jnp.pad(a, ((0, pad), (0, 0)), mode="edge").reshape(
            c, chunk_size, 2)

    clo = jnp.min(prep(lo), axis=1)   # (C, 2)
    chi = jnp.max(prep(hi), axis=1)
    out = jnp.zeros((8, c), dtype=lo.dtype)
    out = out.at[0:2].set(clo.T).at[2:4].set(chi.T)
    return out
