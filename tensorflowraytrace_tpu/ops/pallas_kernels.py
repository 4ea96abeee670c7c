"""Pallas TPU kernels for the N x M nearest-hit search.

This is the hand-written replacement for the reference's dense meshgrid +
argmin pipeline (engine.py:687-749 / 1102-1166), which materializes
~10 N x M float tensors in memory -- its memory wall (SURVEY.md section 5,
"N x M memory wall").  The kernel tiles rays (lanes) x surfaces (sublanes),
keeps the running (min ray_u, argmin index, any_valid) per ray in the output
block in VMEM, and never writes an N x M intermediate anywhere.

Contract (same as the XLA search phase in ops/intersect.py):
    (valid (N,), idx (N,) int32, ray_u (N,)) with idx = nearest surface per
    ray under the reference's validity pruning.  Non-differentiable by
    design -- gradients flow through the O(N) refine step instead
    (ops/intersect.py:refine_*), so no custom VJP is needed.

Grid: (ray_blocks, tri_blocks); the surface dimension iterates fastest and
accumulates into the same output block (revisited across j), initialized at
j == 0.  Epsilons are baked in as compile-time constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU tests use interpret)
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# Ray block on lanes, triangle block on sublanes.  512x256 measured best on
# v5e for the Moller-Trumbore kernel (512x512 is ~5% faster at large M but
# pads small scenes heavily).
DEFAULT_RAY_BLOCK = 512
# 512x512 blocks measured best on v5e: 41.6 G brute / 419 G culled on an
# elongated 16k-tri guide (vs 39.3/326 at 256); 1024-wide blocks exceed the
# 16 MB scoped-VMEM limit, and tb=1024 x rb=256 is slower (341 G)
DEFAULT_TRI_BLOCK = 512

_BIG = 3.0e38  # effectively-inf sentinel that survives float32


def _auto_interpret():
    plat = jax.devices()[0].platform
    return plat not in ("tpu", "axon")


def _vmem_spec(block, index_map):
    if _HAS_PLTPU:
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)
    return pl.BlockSpec(block, index_map)


def _clamp_block(block, size):
    """Shrink a tile-block to the 128-rounded problem size: a 242-surface
    scene under the default 512 block would pad to 512 and waste 2.1x of the
    per-pair work; clamping pads only to 256.  128 is the fp32 lane tile, so
    any multiple is a legal block."""
    return max(128, min(int(block), -(-int(size) // 128) * 128))


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg)


def _triangle_kernel(i_eps, s_eps, r_eps, rays_ref, tris_ref,
                     u_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        u_ref[...] = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
        idx_ref[...] = jnp.zeros(idx_ref.shape, idx_ref.dtype)

    r = rays_ref[...]          # (8, BN): rx1 ry1 rz1 rx2 ry2 rz2 pad pad
    t = tris_ref[...]          # (16, BM): xp yp zp x1 y1 z1 x2 y2 z2 pad...

    # Moller-Trumbore formulation: mathematically identical to the Cramer
    # expansion of geometry.py:300-311 (same determinant magnitude, same
    # (ray_u, trig_u, trig_v)) at roughly half the flops per pair.
    # ray rows broadcast over sublanes (1, BN); triangle cols (BM, 1).
    ox = r[0][None, :]
    oy = r[1][None, :]
    oz = r[2][None, :]
    dx = (r[3] - r[0])[None, :]
    dy = (r[4] - r[1])[None, :]
    dz = (r[5] - r[2])[None, :]

    v0x = t[0][:, None]
    v0y = t[1][:, None]
    v0z = t[2][:, None]
    e1x = (t[3] - t[0])[:, None]
    e1y = (t[4] - t[1])[:, None]
    e1z = (t[5] - t[2])[:, None]
    e2x = (t[6] - t[0])[:, None]
    e2y = (t[7] - t[1])[:, None]
    e2z = (t[8] - t[2])[:, None]

    # P = D x E2  (per pair)
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz

    ok = jnp.abs(det) >= i_eps
    inv = 1.0 / jnp.where(ok, det, jnp.ones_like(det))

    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    tu = (tx * px + ty * py + tz * pz) * inv

    # Q = T x E1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    tv = (dx * qx + dy * qy + dz * qz) * inv
    ray_u = (e2x * qx + e2y * qy + e2z * qz) * inv

    ok = ok & (tu >= -s_eps) & (tv >= -s_eps)
    ok = ok & (tu + tv <= 1 + s_eps) & (ray_u >= r_eps)

    u = jnp.where(ok, ray_u, _BIG)
    bu = jnp.min(u, axis=0)                          # (BN,)
    barg = jnp.argmin(u, axis=0).astype(jnp.int32)   # (BN,)
    gidx = j * tris_ref.shape[1] + barg

    better = bu < u_ref[0]
    u_ref[0] = jnp.where(better, bu, u_ref[0])
    idx_ref[0] = jnp.where(better, gidx, idx_ref[0])
    # validity is derived in the wrapper: any hit leaves u < _BIG


def _triangle_kernel_culled(i_eps, s_eps, r_eps, rays_ref, tris_ref, aabb_ref,
                            u_ref, idx_ref):
    """Brute kernel + conservative chunk culling (models/acceleration.py):
    slab-test the block's rays against the chunk AABB and skip the chunk's
    full intersection math when no ray can improve its current best hit.
    Exactly conservative: identical results to the brute kernel."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        u_ref[...] = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
        idx_ref[...] = jnp.zeros(idx_ref.shape, idx_ref.dtype)

    r = rays_ref[...]

    ox = r[0][None, :]
    oy = r[1][None, :]
    oz = r[2][None, :]
    dx = (r[3] - r[0])[None, :]
    dy = (r[4] - r[1])[None, :]
    dz = (r[5] - r[2])[None, :]

    # slab test against this chunk's AABB (scalars from the (8, C) table)
    tiny = 1e-30

    def axis_slab(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                              jnp.where(d < 0, -tiny, tiny), d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    # this chunk's AABB arrives as a (1, 8, 128) block selected by the index
    # map (lane-replicated so the block shape meets tiling constraints)
    ax0, bx0 = axis_slab(ox, dx, aabb_ref[0, 0, 0], aabb_ref[0, 3, 0])
    ay0, by0 = axis_slab(oy, dy, aabb_ref[0, 1, 0], aabb_ref[0, 4, 0])
    az0, bz0 = axis_slab(oz, dz, aabb_ref[0, 2, 0], aabb_ref[0, 5, 0])
    tmin = jnp.maximum(jnp.maximum(ax0, ay0), az0)
    tmax = jnp.minimum(jnp.minimum(bx0, by0), bz0)
    # small relative slack guards f32 rounding at box faces
    can_hit = (tmax * (1 + 1e-6) + 1e-6 >= jnp.maximum(tmin, r_eps))
    improving = tmin * (1 - 1e-6) - 1e-6 <= u_ref[0][None, :]
    need = jnp.any(can_hit & improving)

    @pl.when(need)
    def _():
        t = tris_ref[...]
        v0x = t[0][:, None]
        v0y = t[1][:, None]
        v0z = t[2][:, None]
        e1x = (t[3] - t[0])[:, None]
        e1y = (t[4] - t[1])[:, None]
        e1z = (t[5] - t[2])[:, None]
        e2x = (t[6] - t[0])[:, None]
        e2y = (t[7] - t[1])[:, None]
        e2z = (t[8] - t[2])[:, None]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz

        ok = jnp.abs(det) >= i_eps
        inv = 1.0 / jnp.where(ok, det, jnp.ones_like(det))

        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        tu = (tx * px + ty * py + tz * pz) * inv

        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        tv = (dx * qx + dy * qy + dz * qz) * inv
        ray_u = (e2x * qx + e2y * qy + e2z * qz) * inv

        ok = ok & (tu >= -s_eps) & (tv >= -s_eps)
        ok = ok & (tu + tv <= 1 + s_eps) & (ray_u >= r_eps)

        u = jnp.where(ok, ray_u, _BIG)
        bu = jnp.min(u, axis=0)
        barg = jnp.argmin(u, axis=0).astype(jnp.int32)
        gidx = j * tris_ref.shape[1] + barg

        better = bu < u_ref[0]
        u_ref[0] = jnp.where(better, bu, u_ref[0])
        idx_ref[0] = jnp.where(better, gidx, idx_ref[0])


@functools.partial(jax.jit, static_argnames=("i_eps", "s_eps", "r_eps",
                                             "ray_block", "tri_block",
                                             "interpret"))
def _nearest_hit_triangles_culled_impl(rays8, tris16, aabbs, i_eps, s_eps,
                                       r_eps, ray_block, tri_block, interpret):
    n = rays8.shape[1]
    m = tris16.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // tri_block) * tri_block
    rays8 = _pad_to(rays8, n_pad, 1)
    tris16 = _pad_to(tris16, m_pad, 1)
    grid = (n_pad // ray_block, m_pad // tri_block)
    assert aabbs.shape == (8, grid[1]), (aabbs.shape, grid)
    # (8, C) -> (C, 8, 128) lane-replicated so per-chunk blocks are tileable
    aabbs3 = jnp.broadcast_to(aabbs.T[:, :, None], aabbs.T.shape + (128,))

    kernel = functools.partial(_triangle_kernel_culled, i_eps, s_eps, r_eps)
    u, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((8, ray_block), lambda i, j: (0, i)),
            _vmem_spec((16, tri_block), lambda i, j: (0, j)),
            _vmem_spec((1, 8, 128), lambda i, j: (j, 0, 0)),
        ],
        out_specs=[
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, tris16, aabbs3)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n]


@functools.partial(jax.jit, static_argnames=("i_eps", "s_eps", "r_eps",
                                             "ray_block", "tri_block",
                                             "interpret"))
def _nearest_hit_triangles_impl(rays8, tris16, i_eps, s_eps, r_eps,
                                ray_block, tri_block, interpret):
    n = rays8.shape[1]
    m = tris16.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // tri_block) * tri_block
    rays8 = _pad_to(rays8, n_pad, 1)
    tris16 = _pad_to(tris16, m_pad, 1)
    grid = (n_pad // ray_block, m_pad // tri_block)

    kernel = functools.partial(_triangle_kernel, i_eps, s_eps, r_eps)
    u, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((8, ray_block), lambda i, j: (0, i)),
            _vmem_spec((16, tri_block), lambda i, j: (0, j)),
        ],
        out_specs=[
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, tris16)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n]


def nearest_hit_triangles_pallas(p0, p1, tri, intersect_eps, size_eps,
                                 ray_start_eps, ray_block=DEFAULT_RAY_BLOCK,
                                 tri_block=DEFAULT_TRI_BLOCK, interpret=None,
                                 cull=False):
    """Tiled nearest ray-triangle hit.  Returns (valid, idx, ray_u).

    ``cull=True`` adds conservative per-chunk AABB culling (see
    models/acceleration.py; sort the scene with morton_sort_triangles first
    for best effect).  ``cull="grid"`` selects the two-level kernel: a 1-D
    grid over ray blocks with fine 128-triangle chunks DMA'd from HBM behind
    the same conservative gate -- faster on structured scenes with coherent
    rays.  Results are identical in every mode.
    """
    if interpret is None:
        interpret = _auto_interpret()
    p0 = jax.lax.stop_gradient(p0)
    p1 = jax.lax.stop_gradient(p1)
    dtype = p0.dtype
    n = p0.shape[0]
    rays8 = jnp.zeros((8, n), dtype=dtype)
    rays8 = rays8.at[0:3].set(p0.T).at[3:6].set(p1.T)
    m = tri.n_surfaces
    vp = jax.lax.stop_gradient(tri.vp)
    v1 = jax.lax.stop_gradient(tri.v1)
    v2 = jax.lax.stop_gradient(tri.v2)
    tris16 = jnp.zeros((16, m), dtype=dtype)
    tris16 = tris16.at[0:3].set(vp.T).at[3:6].set(v1.T).at[6:9].set(v2.T)
    ray_block = _clamp_block(ray_block, n)
    tri_block = _clamp_block(tri_block, m)
    if cull == "grid":
        from tensorflowraytrace_tpu.models.acceleration import chunk_aabbs

        fine = min(FINE_CHUNK, max(128, m))
        rb = max(int(ray_block), TWOLEVEL_RAY_BLOCK)
        aabbs = chunk_aabbs(vp, v1, v2, fine).astype(dtype)
        # resolve the candidate cap HERE (not via the impl's None default):
        # the impl jit-caches on the static value, so a module-attr change
        # must reach it as a distinct argument
        return _nearest_hit_triangles_twolevel_impl(
            rays8, tris16, aabbs, float(intersect_eps), float(size_eps),
            float(ray_start_eps), rb, fine, bool(interpret),
            max_cand=int(TWOLEVEL_MAX_CAND),
        )
    if cull:
        from tensorflowraytrace_tpu.models.acceleration import chunk_aabbs

        aabbs = chunk_aabbs(vp, v1, v2, int(tri_block)).astype(dtype)
        return _nearest_hit_triangles_culled_impl(
            rays8, tris16, aabbs, float(intersect_eps), float(size_eps),
            float(ray_start_eps), int(ray_block), int(tri_block),
            bool(interpret),
        )
    return _nearest_hit_triangles_impl(
        rays8, tris16, float(intersect_eps), float(size_eps),
        float(ray_start_eps), int(ray_block), int(tri_block), bool(interpret),
    )


# ======================================================================
# 2D arcs
# ======================================================================

def _arc_kernel(i_eps, r_eps, rays_ref, arcs_ref, u_ref, idx_ref,
                branch_ref):
    """Nearest ray-arc hit.  Same math as geometry.raw_line_circle_intersect
    + the engine's +/- branch resolution and angular-window pruning
    (engine.py:767-866), with the atan2-based window test replaced by a
    transcendental-free cross-product formulation (precomputed window edge
    vectors ride in the arc table)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        u_ref[...] = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
        idx_ref[...] = jnp.zeros(idx_ref.shape, idx_ref.dtype)
        branch_ref[...] = jnp.zeros(branch_ref.shape, branch_ref.dtype)

    r = rays_ref[...]          # (8, BN): xs ys xe ye
    t = arcs_ref[...]          # (16, BM): xc yc rad sx sy ex ey big full

    xs = r[0][None, :]
    ys = r[1][None, :]
    dx0 = (r[2] - r[0])[None, :]
    dy0 = (r[3] - r[1])[None, :]

    xc = t[0][:, None]
    yc = t[1][:, None]
    rad_r = t[2][:, None]
    sx = t[3][:, None]
    sy = t[4][:, None]
    ex = t[5][:, None]
    ey = t[6][:, None]
    big = t[7][:, None] > 0.5   # sweep > pi
    full = t[8][:, None] > 0.5  # complete circle
    dead = t[9][:, None] > 0.5  # padding column: never hits

    inv_r = 1.0 / rad_r
    xr = (xs - xc) * inv_r
    yr = (ys - yc) * inv_r
    xd = dx0 * inv_r
    yd = dy0 * inv_r

    a = xd * xd + yd * yd
    b = 2.0 * (xr * xd + yr * yd)
    c = xr * xr + yr * yr - 1.0
    disc = b * b - 4.0 * a * c
    disc = jnp.where(jnp.abs(disc) < i_eps, jnp.zeros_like(disc), disc)

    ok = (disc >= 0) & (jnp.abs(a) >= i_eps)
    inv2a = 1.0 / jnp.where(jnp.abs(a) >= i_eps, 2.0 * a, jnp.ones_like(a))
    sq = jnp.sqrt(jnp.where(disc >= 0, disc, jnp.zeros_like(disc)))
    u_plus = (-b + sq) * inv2a
    u_minus = (-b - sq) * inv2a

    def branch_valid(u):
        x = xs + dx0 * u
        y = ys + dy0 * u
        px = x - xc
        py = y - yc
        c1 = sx * py - sy * px   # cross(window start, p)
        c2 = px * ey - py * ex   # cross(p, window end)
        narrow = (c1 >= 0) & (c2 >= 0)
        wide = jnp.logical_not((c1 < 0) & (c2 < 0))
        # boolean select: jnp.where on broadcast bool operands miscompiles in
        # Mosaic; (big & wide) | (~big & narrow) is equivalent
        sel = (big & wide) | (jnp.logical_not(big) & narrow)
        in_window = (sel | full) & jnp.logical_not(dead)
        return ok & (u >= r_eps) & in_window

    vp = branch_valid(u_plus)
    vm = branch_valid(u_minus)
    up = jnp.where(vp, u_plus, _BIG)
    um = jnp.where(vm, u_minus, _BIG)
    u = jnp.minimum(um, up)
    any_ok = vp | vm

    bu = jnp.min(u, axis=0)
    barg = jnp.argmin(u, axis=0).astype(jnp.int32)
    gidx = j * arcs_ref.shape[1] + barg
    # the winning hit is on the minus branch iff the global minus minimum
    # beats the global plus minimum (the winner attains the overall min)
    bbranch = (jnp.min(um, axis=0) < jnp.min(up, axis=0)).astype(jnp.int32)

    better = bu < u_ref[0]
    u_ref[0] = jnp.where(better, bu, u_ref[0])
    idx_ref[0] = jnp.where(better, gidx, idx_ref[0])
    branch_ref[0] = jnp.where(better, bbranch, branch_ref[0])


def _arc_kernel_culled(i_eps, r_eps, rays_ref, arcs_ref, aabb_ref,
                       u_ref, idx_ref, branch_ref):
    """Arc kernel + conservative 2D chunk culling: slab-test the block's rays
    against this chunk's window-aware arc AABB (models/acceleration.py
    chunk_aabbs_arcs) and skip the chunk's quadratic + window math when no
    ray can improve.  Exactly conservative: identical results to brute."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        u_ref[...] = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
        idx_ref[...] = jnp.zeros(idx_ref.shape, idx_ref.dtype)
        branch_ref[...] = jnp.zeros(branch_ref.shape, branch_ref.dtype)

    r = rays_ref[...]
    xs = r[0][None, :]
    ys = r[1][None, :]
    dx0 = (r[2] - r[0])[None, :]
    dy0 = (r[3] - r[1])[None, :]

    tiny = 1e-30

    def axis_slab(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                              jnp.where(d < 0, -tiny, tiny), d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    ax0, bx0 = axis_slab(xs, dx0, aabb_ref[0, 0, 0], aabb_ref[0, 2, 0])
    ay0, by0 = axis_slab(ys, dy0, aabb_ref[0, 1, 0], aabb_ref[0, 3, 0])
    tmin = jnp.maximum(ax0, ay0)
    tmax = jnp.minimum(bx0, by0)
    can_hit = (tmax * (1 + 1e-6) + 1e-6 >= jnp.maximum(tmin, r_eps))
    improving = tmin * (1 - 1e-6) - 1e-6 <= u_ref[0][None, :]
    need = jnp.any(can_hit & improving)

    @pl.when(need)
    def _():
        t = arcs_ref[...]
        xc = t[0][:, None]
        yc = t[1][:, None]
        rad_r = t[2][:, None]
        sx = t[3][:, None]
        sy = t[4][:, None]
        ex = t[5][:, None]
        ey = t[6][:, None]
        big = t[7][:, None] > 0.5
        full = t[8][:, None] > 0.5
        dead = t[9][:, None] > 0.5

        inv_r = 1.0 / rad_r
        xr = (xs - xc) * inv_r
        yr = (ys - yc) * inv_r
        xd = dx0 * inv_r
        yd = dy0 * inv_r

        a = xd * xd + yd * yd
        b = 2.0 * (xr * xd + yr * yd)
        c = xr * xr + yr * yr - 1.0
        disc = b * b - 4.0 * a * c
        disc = jnp.where(jnp.abs(disc) < i_eps, jnp.zeros_like(disc), disc)

        ok = (disc >= 0) & (jnp.abs(a) >= i_eps)
        inv2a = 1.0 / jnp.where(jnp.abs(a) >= i_eps, 2.0 * a, jnp.ones_like(a))
        sq = jnp.sqrt(jnp.where(disc >= 0, disc, jnp.zeros_like(disc)))
        u_plus = (-b + sq) * inv2a
        u_minus = (-b - sq) * inv2a

        def branch_valid(u):
            x = xs + dx0 * u
            y = ys + dy0 * u
            px = x - xc
            py = y - yc
            c1 = sx * py - sy * px
            c2 = px * ey - py * ex
            narrow = (c1 >= 0) & (c2 >= 0)
            wide = jnp.logical_not((c1 < 0) & (c2 < 0))
            sel = (big & wide) | (jnp.logical_not(big) & narrow)
            in_window = (sel | full) & jnp.logical_not(dead)
            return ok & (u >= r_eps) & in_window

        vp = branch_valid(u_plus)
        vm = branch_valid(u_minus)
        up = jnp.where(vp, u_plus, _BIG)
        um = jnp.where(vm, u_minus, _BIG)
        u = jnp.minimum(um, up)

        bu = jnp.min(u, axis=0)
        barg = jnp.argmin(u, axis=0).astype(jnp.int32)
        gidx = j * arcs_ref.shape[1] + barg
        bbranch = (jnp.min(um, axis=0) < jnp.min(up, axis=0)).astype(jnp.int32)

        better = bu < u_ref[0]
        u_ref[0] = jnp.where(better, bu, u_ref[0])
        idx_ref[0] = jnp.where(better, gidx, idx_ref[0])
        branch_ref[0] = jnp.where(better, bbranch, branch_ref[0])


@functools.partial(jax.jit, static_argnames=("i_eps", "r_eps", "ray_block",
                                             "arc_block", "interpret"))
def _nearest_hit_arcs_culled_impl(rays8, arcs16, aabbs, i_eps, r_eps,
                                  ray_block, arc_block, interpret):
    n = rays8.shape[1]
    m = arcs16.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // arc_block) * arc_block
    rays8 = _pad_to(rays8, n_pad, 1)
    arcs16 = _pad_to(arcs16, m_pad, 1)
    if m_pad > m:
        pad_cols = jnp.zeros((16, m_pad - m), dtype=arcs16.dtype)
        pad_cols = pad_cols.at[2].set(1.0)   # radius 1
        pad_cols = pad_cols.at[9].set(1.0)   # dead
        arcs16 = arcs16.at[:, m:].set(pad_cols)
    grid = (n_pad // ray_block, m_pad // arc_block)
    assert aabbs.shape == (8, grid[1]), (aabbs.shape, grid)
    aabbs3 = jnp.broadcast_to(aabbs.T[:, :, None], aabbs.T.shape + (128,))

    kernel = functools.partial(_arc_kernel_culled, i_eps, r_eps)
    u, idx, branch = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((8, ray_block), lambda i, j: (0, i)),
            _vmem_spec((16, arc_block), lambda i, j: (0, j)),
            _vmem_spec((1, 8, 128), lambda i, j: (j, 0, 0)),
        ],
        out_specs=[
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, arcs16, aabbs3)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n], branch[0, :n] > 0


@functools.partial(jax.jit, static_argnames=("i_eps", "r_eps", "ray_block",
                                             "arc_block", "interpret"))
def _nearest_hit_arcs_impl(rays8, arcs16, i_eps, r_eps, ray_block, arc_block,
                           interpret):
    n = rays8.shape[1]
    m = arcs16.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // arc_block) * arc_block
    rays8 = _pad_to(rays8, n_pad, 1)
    arcs16 = _pad_to(arcs16, m_pad, 1)
    # padded arcs get radius 1 (IEEE-safe quadratic) and the dead flag so
    # they can never produce a valid hit
    if m_pad > m:
        pad_cols = jnp.zeros((16, m_pad - m), dtype=arcs16.dtype)
        pad_cols = pad_cols.at[2].set(1.0)   # radius 1
        pad_cols = pad_cols.at[9].set(1.0)   # dead
        arcs16 = arcs16.at[:, m:].set(pad_cols)
    grid = (n_pad // ray_block, m_pad // arc_block)

    kernel = functools.partial(_arc_kernel, i_eps, r_eps)
    u, idx, branch = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((8, ray_block), lambda i, j: (0, i)),
            _vmem_spec((16, arc_block), lambda i, j: (0, j)),
        ],
        out_specs=[
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, arcs16)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n], branch[0, :n] > 0


def nearest_hit_arcs_pallas(p0, p1, arc, intersect_eps, ray_start_eps,
                            ray_block=DEFAULT_RAY_BLOCK,
                            arc_block=DEFAULT_TRI_BLOCK, interpret=None,
                            cull=False):
    """Tiled nearest ray-arc hit.  Returns (valid, idx, ray_u, branch) with
    branch True where the quadratic minus-branch won (matches the XLA
    search's HitRecord.branch).

    ``cull=True`` adds conservative per-chunk window-aware AABB culling
    (sort the scene with morton_sort_arcs first for best effect);
    ``cull="grid"`` selects the two-level candidate-gather kernel (fine
    chunks DMA'd behind the slab gate, mirroring the segment/triangle
    variants).  Results are identical in every mode."""
    if interpret is None:
        interpret = _auto_interpret()
    p0 = jax.lax.stop_gradient(p0)
    p1 = jax.lax.stop_gradient(p1)
    dtype = p0.dtype
    n = p0.shape[0]
    rays8 = jnp.zeros((8, n), dtype=dtype)
    rays8 = rays8.at[0:2].set(p0.T).at[2:4].set(p1.T)

    m = arc.n_surfaces
    center = jax.lax.stop_gradient(arc.center)
    a1 = jax.lax.stop_gradient(arc.angle_start)
    a2 = jax.lax.stop_gradient(arc.angle_end)
    radius = jax.lax.stop_gradient(arc.radius)
    sweep = a2 - a1
    sweep = jnp.where(sweep < 0, sweep + 2 * jnp.pi, sweep)
    arcs16 = jnp.zeros((16, m), dtype=dtype)
    arcs16 = (arcs16.at[0].set(center[:, 0]).at[1].set(center[:, 1])
              .at[2].set(radius)
              .at[3].set(jnp.cos(a1)).at[4].set(jnp.sin(a1))
              .at[5].set(jnp.cos(a2)).at[6].set(jnp.sin(a2))
              .at[7].set((sweep > jnp.pi).astype(dtype))
              .at[8].set((sweep >= 2 * jnp.pi - 1e-6).astype(dtype)))
    ray_block = _clamp_block(ray_block, n)
    arc_block = _clamp_block(arc_block, m)
    if cull == "grid":
        from tensorflowraytrace_tpu.models.acceleration import chunk_aabbs_arcs

        fine = min(FINE_CHUNK, max(128, m))
        rb = max(int(ray_block), TWOLEVEL_RAY_BLOCK)
        aabbs = chunk_aabbs_arcs(center, a1, a2, radius, fine).astype(dtype)
        return _nearest_hit_arcs_twolevel_impl(
            rays8, arcs16, aabbs, float(intersect_eps), float(ray_start_eps),
            rb, fine, bool(interpret), max_cand=int(TWOLEVEL_MAX_CAND),
        )
    if cull:
        from tensorflowraytrace_tpu.models.acceleration import chunk_aabbs_arcs

        aabbs = chunk_aabbs_arcs(center, a1, a2, radius,
                                 int(arc_block)).astype(dtype)
        return _nearest_hit_arcs_culled_impl(
            rays8, arcs16, aabbs, float(intersect_eps), float(ray_start_eps),
            int(ray_block), int(arc_block), bool(interpret),
        )
    return _nearest_hit_arcs_impl(
        rays8, arcs16, float(intersect_eps), float(ray_start_eps),
        int(ray_block), int(arc_block), bool(interpret),
    )


# ======================================================================
# 2D segments
# ======================================================================

def _segment_kernel(i_eps, s_eps, r_eps, rays_ref, segs_ref,
                    u_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        u_ref[...] = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
        idx_ref[...] = jnp.zeros(idx_ref.shape, idx_ref.dtype)

    r = rays_ref[...]          # (8, BN): x1s y1s x1e y1e
    t = segs_ref[...]          # (8, BM): x2s y2s x2e y2e

    x1s = r[0][None, :]
    y1s = r[1][None, :]
    dx1 = (r[2] - r[0])[None, :]
    dy1 = (r[3] - r[1])[None, :]

    x2s = t[0][:, None]
    y2s = t[1][:, None]
    dx2 = (t[2] - t[0])[:, None]
    dy2 = (t[3] - t[1])[:, None]

    den = dx1 * dy2 - dy1 * dx2
    ok = jnp.abs(den) >= i_eps
    inv = 1.0 / jnp.where(ok, den, jnp.ones_like(den))
    ray_u = (dx2 * (y1s - y2s) - dy2 * (x1s - x2s)) * inv
    seg_u = (dy1 * (x2s - x1s) - dx1 * (y2s - y1s)) * inv

    ok = ok & (seg_u >= -s_eps) & (seg_u <= 1 + s_eps) & (ray_u >= r_eps)

    u = jnp.where(ok, ray_u, _BIG)
    bu = jnp.min(u, axis=0)
    barg = jnp.argmin(u, axis=0).astype(jnp.int32)
    gidx = j * segs_ref.shape[1] + barg

    better = bu < u_ref[0]
    u_ref[0] = jnp.where(better, bu, u_ref[0])
    idx_ref[0] = jnp.where(better, gidx, idx_ref[0])


def _segment_kernel_culled(i_eps, s_eps, r_eps, rays_ref, segs_ref, aabb_ref,
                           u_ref, idx_ref):
    """Segment kernel + conservative 2D chunk culling: slab-test the block's
    rays against this chunk's AABB (models/acceleration.py chunk_aabbs_2d)
    and skip the chunk's intersection math when no ray can improve.  Exactly
    conservative: identical results to the brute kernel."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        u_ref[...] = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
        idx_ref[...] = jnp.zeros(idx_ref.shape, idx_ref.dtype)

    r = rays_ref[...]
    x1s = r[0][None, :]
    y1s = r[1][None, :]
    dx1 = (r[2] - r[0])[None, :]
    dy1 = (r[3] - r[1])[None, :]

    tiny = 1e-30

    def axis_slab(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                              jnp.where(d < 0, -tiny, tiny), d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    # this chunk's AABB arrives as a (1, 8, 128) lane-replicated block
    ax0, bx0 = axis_slab(x1s, dx1, aabb_ref[0, 0, 0], aabb_ref[0, 2, 0])
    ay0, by0 = axis_slab(y1s, dy1, aabb_ref[0, 1, 0], aabb_ref[0, 3, 0])
    tmin = jnp.maximum(ax0, ay0)
    tmax = jnp.minimum(bx0, by0)
    can_hit = (tmax * (1 + 1e-6) + 1e-6 >= jnp.maximum(tmin, r_eps))
    improving = tmin * (1 - 1e-6) - 1e-6 <= u_ref[0][None, :]
    need = jnp.any(can_hit & improving)

    @pl.when(need)
    def _():
        t = segs_ref[...]
        x2s = t[0][:, None]
        y2s = t[1][:, None]
        dx2 = (t[2] - t[0])[:, None]
        dy2 = (t[3] - t[1])[:, None]

        den = dx1 * dy2 - dy1 * dx2
        ok = jnp.abs(den) >= i_eps
        inv = 1.0 / jnp.where(ok, den, jnp.ones_like(den))
        ray_u = (dx2 * (y1s - y2s) - dy2 * (x1s - x2s)) * inv
        seg_u = (dy1 * (x2s - x1s) - dx1 * (y2s - y1s)) * inv

        ok = ok & (seg_u >= -s_eps) & (seg_u <= 1 + s_eps) & (ray_u >= r_eps)

        u = jnp.where(ok, ray_u, _BIG)
        bu = jnp.min(u, axis=0)
        barg = jnp.argmin(u, axis=0).astype(jnp.int32)
        gidx = j * segs_ref.shape[1] + barg

        better = bu < u_ref[0]
        u_ref[0] = jnp.where(better, bu, u_ref[0])
        idx_ref[0] = jnp.where(better, gidx, idx_ref[0])


@functools.partial(jax.jit, static_argnames=("i_eps", "s_eps", "r_eps",
                                             "ray_block", "seg_block",
                                             "interpret"))
def _nearest_hit_segments_culled_impl(rays8, segs8, aabbs, i_eps, s_eps,
                                      r_eps, ray_block, seg_block, interpret):
    n = rays8.shape[1]
    m = segs8.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // seg_block) * seg_block
    rays8 = _pad_to(rays8, n_pad, 1)
    segs8 = _pad_to(segs8, m_pad, 1)
    grid = (n_pad // ray_block, m_pad // seg_block)
    assert aabbs.shape == (8, grid[1]), (aabbs.shape, grid)
    aabbs3 = jnp.broadcast_to(aabbs.T[:, :, None], aabbs.T.shape + (128,))

    kernel = functools.partial(_segment_kernel_culled, i_eps, s_eps, r_eps)
    u, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((8, ray_block), lambda i, j: (0, i)),
            _vmem_spec((8, seg_block), lambda i, j: (0, j)),
            _vmem_spec((1, 8, 128), lambda i, j: (j, 0, 0)),
        ],
        out_specs=[
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, segs8, aabbs3)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n]


@functools.partial(jax.jit, static_argnames=("i_eps", "s_eps", "r_eps",
                                             "ray_block", "seg_block",
                                             "interpret"))
def _nearest_hit_segments_impl(rays8, segs8, i_eps, s_eps, r_eps,
                               ray_block, seg_block, interpret):
    n = rays8.shape[1]
    m = segs8.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // seg_block) * seg_block
    rays8 = _pad_to(rays8, n_pad, 1)
    segs8 = _pad_to(segs8, m_pad, 1)
    grid = (n_pad // ray_block, m_pad // seg_block)

    kernel = functools.partial(_segment_kernel, i_eps, s_eps, r_eps)
    u, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _vmem_spec((8, ray_block), lambda i, j: (0, i)),
            _vmem_spec((8, seg_block), lambda i, j: (0, j)),
        ],
        out_specs=[
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
            _vmem_spec((1, ray_block), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, segs8)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n]


def nearest_hit_segments_pallas(p0, p1, seg, intersect_eps, size_eps,
                                ray_start_eps, ray_block=DEFAULT_RAY_BLOCK,
                                seg_block=DEFAULT_TRI_BLOCK, interpret=None,
                                cull=False):
    """Tiled nearest ray-segment hit.  Returns (valid, idx, ray_u).

    ``cull=True`` adds conservative per-chunk 2D AABB culling (sort the
    scene with morton_sort_segments first for best effect); ``cull="grid"``
    selects the two-level candidate-gather kernel (fine 256-seg chunks DMA'd
    behind a slab gate).  Results are identical in every mode."""
    if interpret is None:
        interpret = _auto_interpret()
    p0 = jax.lax.stop_gradient(p0)
    p1 = jax.lax.stop_gradient(p1)
    dtype = p0.dtype
    n = p0.shape[0]
    rays8 = jnp.zeros((8, n), dtype=dtype)
    rays8 = rays8.at[0:2].set(p0.T).at[2:4].set(p1.T)
    m = seg.n_surfaces
    sp0 = jax.lax.stop_gradient(seg.p0)
    sp1 = jax.lax.stop_gradient(seg.p1)
    segs8 = jnp.zeros((8, m), dtype=dtype)
    segs8 = segs8.at[0:2].set(sp0.T).at[2:4].set(sp1.T)
    ray_block = _clamp_block(ray_block, n)
    seg_block = _clamp_block(seg_block, m)
    if cull == "grid":
        from tensorflowraytrace_tpu.models.acceleration import chunk_aabbs_2d

        fine = min(FINE_CHUNK, max(128, m))
        rb = max(int(ray_block), TWOLEVEL_RAY_BLOCK)
        aabbs = chunk_aabbs_2d(sp0, sp1, fine).astype(dtype)
        return _nearest_hit_segments_twolevel_impl(
            rays8, segs8, aabbs, float(intersect_eps), float(size_eps),
            float(ray_start_eps), rb, fine, bool(interpret),
            max_cand=int(TWOLEVEL_MAX_CAND),
        )
    if cull:
        from tensorflowraytrace_tpu.models.acceleration import chunk_aabbs_2d

        aabbs = chunk_aabbs_2d(sp0, sp1, int(seg_block)).astype(dtype)
        return _nearest_hit_segments_culled_impl(
            rays8, segs8, aabbs, float(intersect_eps), float(size_eps),
            float(ray_start_eps), int(ray_block), int(seg_block),
            bool(interpret),
        )
    return _nearest_hit_segments_impl(
        rays8, segs8, float(intersect_eps), float(size_eps),
        float(ray_start_eps), int(ray_block), int(seg_block), bool(interpret),
    )


# ======================================================================
# two-level triangle search: 1-D grid over ray blocks, fine chunks DMA'd
# from HBM on demand behind a conservative slab gate
# ======================================================================
#
# The block-cull kernel above ties the cull granularity to the compute tile
# (512 triangles) and still pays the grid-step + chunk DMA for every culled
# step.  This kernel runs ONE grid program per ray block and loops over FINE
# chunks (128 triangles) inside the kernel: each chunk's AABB is slab-tested
# against the block (using the per-ray running best, so chunks behind the
# rays' current hits are pruned) and only surviving chunks are DMA'd
# HBM -> VMEM (double-buffered) and intersected.  Fine granularity cuts the
# computed pairs; the gate cuts the DMA; the 1-D grid cuts the step count
# 32x.  Exactly conservative: bit-identical results to the brute kernel.

# v5e-measured best on the 16k-tri guide scene: rb=1024 x fine=256 -> 828 G
# equiv (sweep: 512x128 -> 649, 1024x128 -> 792, 2048x256 -> 791)
FINE_CHUNK = 256
TWOLEVEL_RAY_BLOCK = 1024
# candidate-list cap: blocks needing more chunks than this fall back to a
# full in-kernel sweep (still gated per chunk by the improving test).  Keeps
# the scalar-prefetch table within the 1 MB SMEM budget.
TWOLEVEL_MAX_CAND = 32
# the scalar-prefetched candidate table lives in SMEM (~1 MB on v5e):
# blocks * max_cand * 4 B must fit, so two-level calls slab the ray axis to
# keep the table within this fixed entry budget (128K entries = 512 KB);
# at the default max_cand=32 that is 4096 ray blocks per pallas_call
SMEM_CAND_ENTRIES = 4096 * 32


def _slab_ray_axis(impl, rays8, ray_block, *rest, max_cand=None):
    """Split a two-level call along the ray axis when the scalar-prefetched
    SMEM candidate table would overflow (blocks * max_cand * 4 B against a
    ~1 MB budget; measured: a 33M-ray call fails AOT compile with 'would
    exceed memory (space=smem)').  Returns None when no slabbing is needed.
    The block budget scales inversely with max_cand (512 KB table).
    """
    n = rays8.shape[1]
    if max_cand is None:
        max_cand = TWOLEVEL_MAX_CAND
    max_blocks = SMEM_CAND_ENTRIES // max(max_cand, 1)
    max_rays = max_blocks * ray_block
    if n <= max_rays:
        return None
    parts = [impl(rays8[:, s:s + max_rays], *rest)
             for s in range(0, n, max_rays)]
    return tuple(jnp.concatenate(xs) for xs in zip(*parts))


def _twolevel_triangle_kernel(i_eps, s_eps, r_eps, n_chunks, max_cand,
                              counts_ref, cand_ref,
                              rays_ref, aabb_ref, tris_hbm,
                              u_ref, idx_ref, scratch, sems):
    i = pl.program_id(0)
    cnt = counts_ref[i]
    # cnt == n_chunks marks candidate-list overflow: sweep every chunk.
    # cand_ref is the flattened (nb * max_cand,) candidate table -- SMEM
    # pads 2-D minor dims to 128 lanes, so 2-D would cost 4x the budget.
    full_sweep = cnt == n_chunks

    def chunk_id(k):
        kk = jnp.minimum(k, max_cand - 1)
        return jnp.where(full_sweep, k, cand_ref[i * max_cand + kk])

    r = rays_ref[...]          # (8, BN) VMEM
    ox = r[0][None, :]
    oy = r[1][None, :]
    oz = r[2][None, :]
    dx = (r[3] - r[0])[None, :]
    dy = (r[4] - r[1])[None, :]
    dz = (r[5] - r[2])[None, :]

    tiny = 1e-30

    def axis_slab(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                              jnp.where(d < 0, -tiny, tiny), d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    def improving_any(c, best_u):
        # can chunk c still contain a hit nearer than some ray's best?
        ax0, bx0 = axis_slab(ox, dx, aabb_ref[0, c], aabb_ref[3, c])
        ay0, by0 = axis_slab(oy, dy, aabb_ref[1, c], aabb_ref[4, c])
        az0, bz0 = axis_slab(oz, dz, aabb_ref[2, c], aabb_ref[5, c])
        tmin = jnp.maximum(jnp.maximum(ax0, ay0), az0)
        tmax = jnp.minimum(jnp.minimum(bx0, by0), bz0)
        can_hit = (tmax * (1 + 1e-6) + 1e-6 >= jnp.maximum(tmin, r_eps))
        improving = tmin * (1 - 1e-6) - 1e-6 <= best_u
        return jnp.any(can_hit & improving)

    def dma(c, slot):
        return pltpu.make_async_copy(tris_hbm.at[c], scratch.at[slot],
                                     sems.at[slot])

    best_u = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
    best_idx = jnp.zeros(idx_ref.shape, idx_ref.dtype)

    @pl.when(cnt > 0)
    def _():
        dma(chunk_id(0), 0).start()

    def body(k, carry):
        best_u, best_idx = carry
        c = chunk_id(k)

        # stage candidate k+1 while k is being consumed
        @pl.when(k + 1 < cnt)
        def _():
            dma(chunk_id(k + 1), (k + 1) % 2).start()

        dma(c, k % 2).wait()

        def with_chunk(args):
            best_u, best_idx = args
            t = scratch[k % 2]
            v0x = t[0][:, None]
            v0y = t[1][:, None]
            v0z = t[2][:, None]
            e1x = (t[3] - t[0])[:, None]
            e1y = (t[4] - t[1])[:, None]
            e1z = (t[5] - t[2])[:, None]
            e2x = (t[6] - t[0])[:, None]
            e2y = (t[7] - t[1])[:, None]
            e2z = (t[8] - t[2])[:, None]

            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz

            ok = jnp.abs(det) >= i_eps
            inv = 1.0 / jnp.where(ok, det, jnp.ones_like(det))

            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            tu = (tx * px + ty * py + tz * pz) * inv

            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            tv = (dx * qx + dy * qy + dz * qz) * inv
            ray_u = (e2x * qx + e2y * qy + e2z * qz) * inv

            ok = ok & (tu >= -s_eps) & (tv >= -s_eps)
            ok = ok & (tu + tv <= 1 + s_eps) & (ray_u >= r_eps)

            u = jnp.where(ok, ray_u, _BIG)
            bu = jnp.min(u, axis=0)[None, :]
            barg = jnp.argmin(u, axis=0).astype(jnp.int32)[None, :]
            gidx = c * t.shape[1] + barg
            better = bu < best_u
            return (jnp.where(better, bu, best_u),
                    jnp.where(better, gidx, best_idx))

        # the dynamic improving-gate: skip the math (not the DMA, which is
        # already overlapped) for chunks behind every ray's current best
        best_u, best_idx = jax.lax.cond(
            improving_any(c, best_u[0][None, :]), with_chunk,
            lambda args: args, (best_u, best_idx))
        return best_u, best_idx

    best_u, best_idx = jax.lax.fori_loop(0, cnt, body, (best_u, best_idx))
    u_ref[...] = best_u
    idx_ref[...] = best_idx


def _cand_chunk_group(n_pad, n_chunks):
    """Chunk-axis group size for the candidate precompute's slab test.

    The per-ray x per-chunk test materializes an (nb, Cg, B) f32
    intermediate (XLA fuses the 3-axis min/max reduce but not the
    any-over-rays): at full slab scale (4.2M rays) with 1537 chunks
    (393k triangles / 256) that is 25.8 GB and the compile OOMs HBM
    (measured, examples/caustic_render.py at mesh_steps=256).  Grouping
    the chunk axis bounds the intermediate at ~CAND_GROUP_BYTES; small
    scenes keep a single group (identical program to the ungrouped
    original).  tests/test_pallas.py shrinks the budget to force multiple
    groups at CI scale and pins equality."""
    per_col = max(n_pad, 1) * 4 * 4   # f32 x ~4 live temps per column
    return max(16, min(n_chunks, CAND_GROUP_BYTES // per_col))


CAND_GROUP_BYTES = 4 << 30


def _twolevel_candidates(rays8, aabbs, r_eps, ray_block, max_cand=None):
    """Static geometric candidate chunks per ray block, vectorized in XLA:
    chunk c is a candidate for block b iff ANY of b's rays' slab test can hit
    c's AABB with t >= r_eps (the same conservative test the kernel applies,
    with best = inf).  Returns (counts (nb,) int32, cand (nb, C) int32) with
    each row's candidate chunk ids (ascending = morton order) packed first."""
    if max_cand is None:
        max_cand = TWOLEVEL_MAX_CAND
    n_pad = rays8.shape[1]
    nb = n_pad // ray_block
    o = rays8[0:3].reshape(3, nb, 1, ray_block)
    e = rays8[3:6].reshape(3, nb, 1, ray_block)
    d = e - o
    tiny = 1e-30
    inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                          jnp.where(d < 0, -tiny, tiny), d)

    def group_need(ab):
        lo = ab[0:3][:, None, :, None]   # (3, 1, Cg, 1)
        hi = ab[3:6][:, None, :, None]
        t1 = (lo - o) * inv              # (3, nb, Cg, B)
        t2 = (hi - o) * inv
        tmin = jnp.max(jnp.minimum(t1, t2), axis=0)   # (nb, Cg, B)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=0)
        can_hit = (tmax * (1 + 1e-6) + 1e-6 >= jnp.maximum(tmin, r_eps))
        return jnp.any(can_hit, axis=-1)              # (nb, Cg)

    cg = _cand_chunk_group(n_pad, aabbs.shape[1])
    need = jnp.concatenate(
        [group_need(aabbs[:, c0:c0 + cg])
         for c0 in range(0, aabbs.shape[1], cg)], axis=1)
    n_chunks = need.shape[1]
    counts = jnp.sum(need, axis=1).astype(jnp.int32)
    # stable argsort of ~need packs candidate ids first, in ascending order
    cand = jnp.argsort(~need, axis=1, stable=True).astype(jnp.int32)
    if n_chunks > max_cand:
        # cap the SMEM table; overflowing blocks sweep all chunks in-kernel
        # (signalled by counts == n_chunks), gated per chunk as usual
        cand = cand[:, :max_cand]
        counts = jnp.where(counts > max_cand, n_chunks, counts)
    return counts, cand.reshape(-1)


@functools.partial(jax.jit, static_argnames=("i_eps", "s_eps", "r_eps",
                                             "ray_block", "fine_chunk",
                                             "interpret", "max_cand"))
def _nearest_hit_triangles_twolevel_impl(rays8, tris16, aabbs, i_eps, s_eps,
                                         r_eps, ray_block, fine_chunk,
                                         interpret, max_cand=None):
    if max_cand is None:
        max_cand = TWOLEVEL_MAX_CAND
    slabbed = _slab_ray_axis(
        lambda r8, *a: _nearest_hit_triangles_twolevel_impl(r8, *a),
        rays8, ray_block, tris16, aabbs, i_eps, s_eps, r_eps, ray_block,
        fine_chunk, interpret, max_cand, max_cand=max_cand)
    if slabbed is not None:
        return slabbed
    n = rays8.shape[1]

    m = tris16.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // fine_chunk) * fine_chunk
    rays8 = _pad_to(rays8, n_pad, 1)
    tris16 = _pad_to(tris16, m_pad, 1)
    n_chunks = m_pad // fine_chunk
    assert aabbs.shape == (8, n_chunks), (aabbs.shape, n_chunks)
    # (16, m_pad) -> (n_chunks, 16, F): one contiguous block per DMA
    tris_chunked = jnp.transpose(
        tris16.reshape(16, n_chunks, fine_chunk), (1, 0, 2))
    max_cand = min(max_cand, n_chunks)
    counts, cand = _twolevel_candidates(rays8, aabbs, r_eps, ray_block,
                                        max_cand)

    grid = (n_pad // ray_block,)
    kernel = functools.partial(_twolevel_triangle_kernel, i_eps, s_eps, r_eps,
                               n_chunks, max_cand)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # aabbs, whole
            pl.BlockSpec(memory_space=pl.ANY),    # tris stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((1, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, fine_chunk), rays8.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    u, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(counts, cand, rays8, aabbs, tris_chunked)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n]


# ======================================================================
# two-level segment search (2D analogue of the triangle kernel above)
# ======================================================================

def _twolevel_segment_kernel(i_eps, s_eps, r_eps, n_chunks, max_cand,
                             counts_ref, cand_ref,
                             rays_ref, aabb_ref, segs_hbm,
                             u_ref, idx_ref, scratch, sems):
    i = pl.program_id(0)
    cnt = counts_ref[i]
    full_sweep = cnt == n_chunks

    def chunk_id(k):
        kk = jnp.minimum(k, max_cand - 1)
        return jnp.where(full_sweep, k, cand_ref[i * max_cand + kk])

    r = rays_ref[...]
    x1s = r[0][None, :]
    y1s = r[1][None, :]
    dx1 = (r[2] - r[0])[None, :]
    dy1 = (r[3] - r[1])[None, :]

    tiny = 1e-30

    def axis_slab(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                              jnp.where(d < 0, -tiny, tiny), d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    def improving_any(c, best_u):
        ax0, bx0 = axis_slab(x1s, dx1, aabb_ref[0, c], aabb_ref[2, c])
        ay0, by0 = axis_slab(y1s, dy1, aabb_ref[1, c], aabb_ref[3, c])
        tmin = jnp.maximum(ax0, ay0)
        tmax = jnp.minimum(bx0, by0)
        can_hit = (tmax * (1 + 1e-6) + 1e-6 >= jnp.maximum(tmin, r_eps))
        improving = tmin * (1 - 1e-6) - 1e-6 <= best_u
        return jnp.any(can_hit & improving)

    def dma(c, slot):
        return pltpu.make_async_copy(segs_hbm.at[c], scratch.at[slot],
                                     sems.at[slot])

    best_u = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
    best_idx = jnp.zeros(idx_ref.shape, idx_ref.dtype)

    @pl.when(cnt > 0)
    def _():
        dma(chunk_id(0), 0).start()

    def body(k, carry):
        best_u, best_idx = carry
        c = chunk_id(k)

        @pl.when(k + 1 < cnt)
        def _():
            dma(chunk_id(k + 1), (k + 1) % 2).start()

        dma(c, k % 2).wait()

        def with_chunk(args):
            best_u, best_idx = args
            t = scratch[k % 2]
            x2s = t[0][:, None]
            y2s = t[1][:, None]
            dx2 = (t[2] - t[0])[:, None]
            dy2 = (t[3] - t[1])[:, None]

            den = dx1 * dy2 - dy1 * dx2
            ok = jnp.abs(den) >= i_eps
            inv = 1.0 / jnp.where(ok, den, jnp.ones_like(den))
            ray_u = (dx2 * (y1s - y2s) - dy2 * (x1s - x2s)) * inv
            seg_u = (dy1 * (x2s - x1s) - dx1 * (y2s - y1s)) * inv

            ok = ok & (seg_u >= -s_eps) & (seg_u <= 1 + s_eps)
            ok = ok & (ray_u >= r_eps)

            u = jnp.where(ok, ray_u, _BIG)
            bu = jnp.min(u, axis=0)[None, :]
            barg = jnp.argmin(u, axis=0).astype(jnp.int32)[None, :]
            gidx = c * t.shape[1] + barg
            better = bu < best_u
            return (jnp.where(better, bu, best_u),
                    jnp.where(better, gidx, best_idx))

        best_u, best_idx = jax.lax.cond(
            improving_any(c, best_u[0][None, :]), with_chunk,
            lambda args: args, (best_u, best_idx))
        return best_u, best_idx

    best_u, best_idx = jax.lax.fori_loop(0, cnt, body, (best_u, best_idx))
    u_ref[...] = best_u
    idx_ref[...] = best_idx


def _twolevel_arc_kernel(i_eps, r_eps, n_chunks, max_cand,
                         counts_ref, cand_ref,
                         rays_ref, aabb_ref, arcs_hbm,
                         u_ref, idx_ref, branch_ref, scratch, sems):
    """Two-level arc search: 1-D grid over ray blocks, fine arc chunks DMA'd
    from HBM behind the conservative slab gate (same scheme as
    _twolevel_segment_kernel; chunk AABBs are window-aware,
    models/acceleration.py chunk_aabbs_arcs).  Exactly conservative."""
    i = pl.program_id(0)
    cnt = counts_ref[i]
    full_sweep = cnt == n_chunks

    def chunk_id(k):
        kk = jnp.minimum(k, max_cand - 1)
        return jnp.where(full_sweep, k, cand_ref[i * max_cand + kk])

    r = rays_ref[...]
    xs = r[0][None, :]
    ys = r[1][None, :]
    dx0 = (r[2] - r[0])[None, :]
    dy0 = (r[3] - r[1])[None, :]

    tiny = 1e-30

    def axis_slab(o, d, lo, hi):
        inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                              jnp.where(d < 0, -tiny, tiny), d)
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    def improving_any(c, best_u):
        ax0, bx0 = axis_slab(xs, dx0, aabb_ref[0, c], aabb_ref[2, c])
        ay0, by0 = axis_slab(ys, dy0, aabb_ref[1, c], aabb_ref[3, c])
        tmin = jnp.maximum(ax0, ay0)
        tmax = jnp.minimum(bx0, by0)
        can_hit = (tmax * (1 + 1e-6) + 1e-6 >= jnp.maximum(tmin, r_eps))
        improving = tmin * (1 - 1e-6) - 1e-6 <= best_u
        return jnp.any(can_hit & improving)

    def dma(c, slot):
        return pltpu.make_async_copy(arcs_hbm.at[c], scratch.at[slot],
                                     sems.at[slot])

    best_u = jnp.full(u_ref.shape, _BIG, u_ref.dtype)
    best_idx = jnp.zeros(idx_ref.shape, idx_ref.dtype)
    best_branch = jnp.zeros(branch_ref.shape, branch_ref.dtype)

    @pl.when(cnt > 0)
    def _():
        dma(chunk_id(0), 0).start()

    def body(k, carry):
        best_u, best_idx, best_branch = carry
        c = chunk_id(k)

        @pl.when(k + 1 < cnt)
        def _():
            dma(chunk_id(k + 1), (k + 1) % 2).start()

        dma(c, k % 2).wait()

        def with_chunk(args):
            best_u, best_idx, best_branch = args
            t = scratch[k % 2]
            xc = t[0][:, None]
            yc = t[1][:, None]
            rad_r = t[2][:, None]
            sx = t[3][:, None]
            sy = t[4][:, None]
            ex = t[5][:, None]
            ey = t[6][:, None]
            big_w = t[7][:, None] > 0.5
            full = t[8][:, None] > 0.5
            dead = t[9][:, None] > 0.5

            inv_r = 1.0 / rad_r
            xr = (xs - xc) * inv_r
            yr = (ys - yc) * inv_r
            xd = dx0 * inv_r
            yd = dy0 * inv_r

            a = xd * xd + yd * yd
            b = 2.0 * (xr * xd + yr * yd)
            cc = xr * xr + yr * yr - 1.0
            disc = b * b - 4.0 * a * cc
            disc = jnp.where(jnp.abs(disc) < i_eps, jnp.zeros_like(disc), disc)

            ok = (disc >= 0) & (jnp.abs(a) >= i_eps)
            inv2a = 1.0 / jnp.where(jnp.abs(a) >= i_eps, 2.0 * a,
                                    jnp.ones_like(a))
            sq = jnp.sqrt(jnp.where(disc >= 0, disc, jnp.zeros_like(disc)))
            u_plus = (-b + sq) * inv2a
            u_minus = (-b - sq) * inv2a

            def branch_valid(u):
                x = xs + dx0 * u
                y = ys + dy0 * u
                px = x - xc
                py = y - yc
                c1 = sx * py - sy * px
                c2 = px * ey - py * ex
                narrow = (c1 >= 0) & (c2 >= 0)
                wide = jnp.logical_not((c1 < 0) & (c2 < 0))
                sel = (big_w & wide) | (jnp.logical_not(big_w) & narrow)
                in_window = (sel | full) & jnp.logical_not(dead)
                return ok & (u >= r_eps) & in_window

            up = jnp.where(branch_valid(u_plus), u_plus, _BIG)
            um = jnp.where(branch_valid(u_minus), u_minus, _BIG)
            u = jnp.minimum(um, up)

            bu = jnp.min(u, axis=0)[None, :]
            barg = jnp.argmin(u, axis=0).astype(jnp.int32)[None, :]
            gidx = c * t.shape[1] + barg
            bbranch = (jnp.min(um, axis=0)
                       < jnp.min(up, axis=0)).astype(jnp.int32)[None, :]
            better = bu < best_u
            return (jnp.where(better, bu, best_u),
                    jnp.where(better, gidx, best_idx),
                    jnp.where(better, bbranch, best_branch))

        return jax.lax.cond(
            improving_any(c, best_u[0][None, :]), with_chunk,
            lambda args: args, (best_u, best_idx, best_branch))

    best_u, best_idx, best_branch = jax.lax.fori_loop(
        0, cnt, body, (best_u, best_idx, best_branch))
    u_ref[...] = best_u
    idx_ref[...] = best_idx
    branch_ref[...] = best_branch


def _twolevel_candidates_2d(rays8, aabbs, r_eps, ray_block, max_cand=None):
    """2D analogue of _twolevel_candidates (rows 0-1 lo, 2-3 hi)."""
    if max_cand is None:
        max_cand = TWOLEVEL_MAX_CAND
    n_pad = rays8.shape[1]
    nb = n_pad // ray_block
    o = rays8[0:2].reshape(2, nb, 1, ray_block)
    e = rays8[2:4].reshape(2, nb, 1, ray_block)
    d = e - o
    tiny = 1e-30
    inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                          jnp.where(d < 0, -tiny, tiny), d)

    def group_need(ab):
        lo = ab[0:2][:, None, :, None]
        hi = ab[2:4][:, None, :, None]
        t1 = (lo - o) * inv
        t2 = (hi - o) * inv
        tmin = jnp.max(jnp.minimum(t1, t2), axis=0)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=0)
        can_hit = (tmax * (1 + 1e-6) + 1e-6 >= jnp.maximum(tmin, r_eps))
        return jnp.any(can_hit, axis=-1)

    cg = _cand_chunk_group(n_pad, aabbs.shape[1])
    need = jnp.concatenate(
        [group_need(aabbs[:, c0:c0 + cg])
         for c0 in range(0, aabbs.shape[1], cg)], axis=1)
    n_chunks = need.shape[1]
    counts = jnp.sum(need, axis=1).astype(jnp.int32)
    cand = jnp.argsort(~need, axis=1, stable=True).astype(jnp.int32)
    if n_chunks > max_cand:
        cand = cand[:, :max_cand]
        counts = jnp.where(counts > max_cand, n_chunks, counts)
    return counts, cand.reshape(-1)


@functools.partial(jax.jit, static_argnames=("i_eps", "s_eps", "r_eps",
                                             "ray_block", "fine_chunk",
                                             "interpret", "max_cand"))
def _nearest_hit_segments_twolevel_impl(rays8, segs8, aabbs, i_eps, s_eps,
                                        r_eps, ray_block, fine_chunk,
                                        interpret, max_cand=None):
    if max_cand is None:
        max_cand = TWOLEVEL_MAX_CAND
    slabbed = _slab_ray_axis(
        lambda r8, *a: _nearest_hit_segments_twolevel_impl(r8, *a),
        rays8, ray_block, segs8, aabbs, i_eps, s_eps, r_eps, ray_block,
        fine_chunk, interpret, max_cand, max_cand=max_cand)
    if slabbed is not None:
        return slabbed
    n = rays8.shape[1]

    m = segs8.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // fine_chunk) * fine_chunk
    rays8 = _pad_to(rays8, n_pad, 1)
    segs8 = _pad_to(segs8, m_pad, 1)
    n_chunks = m_pad // fine_chunk
    assert aabbs.shape[1] == n_chunks, (aabbs.shape, n_chunks)
    segs_chunked = jnp.transpose(
        segs8.reshape(8, n_chunks, fine_chunk), (1, 0, 2))
    max_cand = min(max_cand, n_chunks)
    counts, cand = _twolevel_candidates_2d(rays8, aabbs, r_eps, ray_block,
                                           max_cand)

    grid = (n_pad // ray_block,)
    kernel = functools.partial(_twolevel_segment_kernel, i_eps, s_eps, r_eps,
                               n_chunks, max_cand)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 8, fine_chunk), rays8.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    u, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(counts, cand, rays8, aabbs, segs_chunked)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n]


@functools.partial(jax.jit, static_argnames=("i_eps", "r_eps", "ray_block",
                                             "fine_chunk", "interpret",
                                             "max_cand"))
def _nearest_hit_arcs_twolevel_impl(rays8, arcs16, aabbs, i_eps, r_eps,
                                    ray_block, fine_chunk, interpret,
                                    max_cand=None):
    if max_cand is None:
        max_cand = TWOLEVEL_MAX_CAND
    slabbed = _slab_ray_axis(
        lambda r8, *a: _nearest_hit_arcs_twolevel_impl(r8, *a),
        rays8, ray_block, arcs16, aabbs, i_eps, r_eps, ray_block,
        fine_chunk, interpret, max_cand, max_cand=max_cand)
    if slabbed is not None:
        return slabbed
    n = rays8.shape[1]

    m = arcs16.shape[1]
    n_pad = -(-n // ray_block) * ray_block
    m_pad = -(-m // fine_chunk) * fine_chunk
    rays8 = _pad_to(rays8, n_pad, 1)
    arcs16 = _pad_to(arcs16, m_pad, 1)
    if m_pad > m:
        pad_cols = jnp.zeros((16, m_pad - m), dtype=arcs16.dtype)
        pad_cols = pad_cols.at[2].set(1.0)   # radius 1
        pad_cols = pad_cols.at[9].set(1.0)   # dead
        arcs16 = arcs16.at[:, m:].set(pad_cols)
    n_chunks = m_pad // fine_chunk
    assert aabbs.shape[1] == n_chunks, (aabbs.shape, n_chunks)
    arcs_chunked = jnp.transpose(
        arcs16.reshape(16, n_chunks, fine_chunk), (1, 0, 2))
    max_cand = min(max_cand, n_chunks)
    counts, cand = _twolevel_candidates_2d(rays8, aabbs, r_eps, ray_block,
                                           max_cand)

    grid = (n_pad // ray_block,)
    kernel = functools.partial(_twolevel_arc_kernel, i_eps, r_eps,
                               n_chunks, max_cand)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ray_block), lambda i, counts, cand: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 16, fine_chunk), rays8.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    u, idx, branch = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), rays8.dtype),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(counts, cand, rays8, aabbs, arcs_chunked)
    return u[0, :n] < _BIG * 0.5, idx[0, :n], u[0, :n], branch[0, :n] > 0


# ======================================================================
# MXU segment-sum: the backward of the engine's fused table gather
# ======================================================================
#
# The VJP of ``rows = table[idx]`` is a scatter-add of N cotangent rows
# into the (M, k) table.  XLA's TPU scatter serializes row updates
# (collisions), costing ~8 ms per million rays REGARDLESS of M -- it was
# the single largest backward cost of a guide training step.  The sum is
# better expressed as a matmul: onehot(idx) (BM, BN) contracted with the
# cotangent block (k, BN) on the MXU, accumulated across ray blocks.
#
# Naive flops are 2 N m k, so the matmul only wins for small m.  The
# kernel is two-level (r3): the table axis is tiled (SEGSUM_M_TILE rows),
# each ray block computes its idx min/max once, and only tiles
# intersecting [min, max] run their matmul -- so it handles any m and is
# never slower than the old single-tile kernel.  BUT measured on v5e the
# range gating does not rescue large tables in the engine's backward: the
# cotangent/idx stream arrives in ray-SLOT order (project_3d's Morton
# resort is inverted before the table gather), so per-block idx ranges
# span nearly the whole table and flops stay ~2 N m k.  Measured ON CHIP
# at the engine's exact VJP shapes (1M rays, k=13, slot-order uniform
# idx; examples/tpu_physics_bench.py segsum, v5e):
#   m=256: kernel 4.1 ms | m=512: 6.2 ms | m=1024: 10.6 ms | m=2048: 19.2 ms
#   scatter: 8.1 ms FLAT (serialized over N, independent of m)
# so the on-chip crossover sits between 512 and 1024 and SEGSUM_MAX_M
# pins the engine's fast path at 512 (the r3 CPU-reasoned 1024 retune
# was one step too high: scatter wins 1.31x there on real hardware).
# The 16k-triangle guide keeps the scatter backward -- which
# is only ~10% of its 2.56 s training step; recovering it would need the
# gather performed in resorted order (one extra (k,N) permutation gather
# per bounce), evaluated and not worth it (docs/notes.md).

SEGSUM_MAX_M = 512      # measured on-chip kernel-vs-scatter crossover
SEGSUM_RAY_BLOCK = 1024
SEGSUM_M_TILE = 512


def _segsum_kernel(m_pad, bm, ct_ref, idx_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    idx = idx_ref[...]                      # (1, BN) int32
    ct = ct_ref[...]                        # (k, BN)
    lo = jnp.min(idx)
    hi = jnp.max(idx)

    def tile(t, carry):
        t0 = t * bm

        @pl.when((hi >= t0) & (lo < t0 + bm))
        def _():
            rows = (jax.lax.broadcasted_iota(jnp.int32, (bm, idx.shape[1]), 0)
                    + t0)
            onehot = (rows == idx).astype(ct.dtype)     # (BM, BN)
            # contract the ray-block dim of both operands on the MXU
            part = jax.lax.dot_general(
                onehot, ct, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                               # (BM, k)
            out_ref[pl.dslice(t0, bm), :] += part.astype(out_ref.dtype)

        return carry

    jax.lax.fori_loop(0, m_pad // bm, tile, 0)


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def segment_sum_pallas(ct, idx, m, interpret=None):
    """``out[j] = sum over i with idx[i] == j of ct[:, i]`` -- i.e. the
    transpose-scatter-add, as range-gated MXU matmuls.  ``ct`` is (k, N)
    (lane-contiguous cotangents), ``idx`` (N,) int32 in [0, m); returns
    (m, k).  Handles tables up to SEGSUM_MAX_M rows; per-ray-block idx
    range gating keeps the cost ~m-independent for coherent rays.
    """
    if interpret is None:
        interpret = _auto_interpret()
    k, n = ct.shape
    bn = SEGSUM_RAY_BLOCK
    n_pad = -(-n // bn) * bn
    ct = _pad_to(ct, n_pad, 1)              # zero cotangents add nothing
    idx = _pad_to(idx.astype(jnp.int32)[None, :], n_pad, 1)
    bm = min(SEGSUM_M_TILE, -(-m // 8) * 8)
    m_pad = -(-m // bm) * bm

    out = pl.pallas_call(
        functools.partial(_segsum_kernel, m_pad, bm),
        grid=(n_pad // bn,),
        in_specs=[
            _vmem_spec((k, bn), lambda i: (0, i)),
            _vmem_spec((1, bn), lambda i: (0, i)),
        ],
        out_specs=_vmem_spec((m_pad, k), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m_pad, k), ct.dtype),
        interpret=interpret,
    )(ct, idx)
    return out[:m]
