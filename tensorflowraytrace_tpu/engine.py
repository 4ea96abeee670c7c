"""The trace engine: multi-bounce optical ray tracing as a ``lax.scan``.

Reference counterpart: ``OpticalEngine`` (/root/reference/tfrt/engine.py:1170-2331),
whose ``ray_trace`` is a Python loop of ``single_pass`` calls, each of which
intersects, classifies rays into four compacted lists with ``tf.boolean_mask``
(dynamic shapes), runs RayOperation hooks, and amalgamates the children.

TPU-native redesign:

* **Fixed ray slots.** Rays never compact.  A ray's ``state`` code records
  whether it is still bouncing (ACTIVE) or has terminated (FINISHED on a
  target, STOPPED on a stop, DEAD on a miss) -- replacing the four history
  lists (engine.py:1596-1677).  When an ACTIVE ray reacts with an OPTICAL
  surface, the *child ray replaces the parent in its slot*, which makes the
  reference's "simple ray inheritance" of extra fields (engine.py:2242-2281)
  automatic.
* **lax.scan over a fixed bounce budget** with optional per-bounce history
  (stacked ys) for drawing / debugging -- replacing the Python loop + early
  exit (engine.py:2311-2330).  All shapes static; XLA compiles one step.
* **Reactions are pure functions** ``reaction(projection, ctx) -> (p0, p1)``
  replacing the RayOperation main hook (operation.py:154-158).  The standard
  Snell reaction and the GhostThrough test reaction are provided in
  ``operations.py``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

from tensorflowraytrace_tpu.config import (
    ACTIVE, DEAD, FINISHED, OPTICAL, STOP, STOPPED, default_epsilon,
)
from tensorflowraytrace_tpu.models.rays import RaySet
from tensorflowraytrace_tpu.models.surfaces import Scene2D, Scene3D, compute_face_normals
from tensorflowraytrace_tpu.ops import intersect as isect
from tensorflowraytrace_tpu.ops.geometry import snell_3d_vec, snells_law_2D
from tensorflowraytrace_tpu.ops.materials import material_index_lookup


@dataclass(frozen=True)
class TraceConfig:
    """Static trace configuration (the analog of the OpticalEngine compile
    flags, engine.py:1216-1316).  Hashable -> safe as a jit static arg."""

    max_bounces: int = 25
    new_ray_length: float = 1.0
    # None -> dead rays keep their direction-vector length; otherwise the
    # reference's dead_ray_length stretch factor (engine.py:1611-1619)
    dead_ray_length: Optional[float] = None
    keep_history: bool = False
    # "index": per-surface int indices into the material list (dispersion);
    # "value": per-surface n_in / n_out floats in surface.fields
    refractive_index_type: str = "index"
    use_pallas: bool = False
    # conservative AABB chunk culling in the pallas search (exact results;
    # morton-sort the scene for best effect -- models/acceleration.py).
    # True = block culling; "grid" = two-level candidate-gather kernel
    # (triangles, segments AND arcs: fine chunks DMA'd from HBM behind a
    # slab gate) -- fastest on structured scenes, never slower than block
    # culling in our measurements
    cull: object = False
    surf_chunk: int = 128
    ray_block: int = 32768
    # None -> derived from dtype (config.default_epsilon)
    intersect_epsilon: Optional[float] = None
    size_epsilon: Optional[float] = None
    ray_start_epsilon: Optional[float] = None
    # rematerialize each bounce in the backward pass: O(1) residual memory in
    # the bounce count instead of O(max_bounces) -- essential for
    # differentiating 50-bounce light guides at large ray counts
    # (SURVEY.md hard part 6)
    remat: bool = False
    # False -> inference fast path: hit points come straight from the search
    # kernel's ray parameter (p0 + u*(p1-p0), the same value the refine
    # computes) and the per-surface gather shrinks to norm/category/materials.
    # Numerically equivalent forward results; NO gradients reach the surface
    # geometry, so keep True for optimization.
    differentiable: bool = True
    # with cull: re-sort rays by origin Morton code before each search so ray
    # blocks stay spatially coherent across bounces (slots scatter after the
    # first bounce, which otherwise defeats block-level culling).  Exact
    # results; costs one argsort + gather/scatter per bounce.  Measured win
    # for 3D scenes (>=4k surfaces); measured LOSS for 2D scenes (the argsort
    # outweighs the cheap 2D kernel) -- leave False for 2D.
    resort_rays: bool = False
    # stop bouncing once no ray is ACTIVE (the reference's early exit,
    # engine.py:2324-2330) via lax.while_loop.  INFERENCE ONLY: while_loop
    # is not reverse-mode differentiable, and it is incompatible with
    # keep_history (no stacked ys).  Folds still work.
    early_exit: bool = False

    def epsilons(self, dtype):
        e = default_epsilon(dtype)
        return (
            e if self.intersect_epsilon is None else self.intersect_epsilon,
            e if self.size_epsilon is None else self.size_epsilon,
            e if self.ray_start_epsilon is None else self.ray_start_epsilon,
        )

    @staticmethod
    def recommended(scene, max_bounces=25, **overrides):
        """A TraceConfig with the measured-best acceleration settings for
        ``scene`` on the current platform:

        * pallas kernels + conservative chunk culling on TPU (exact
          results); 3D scenes and large 2D scenes use the two-level
          candidate-gather kernel (``cull="grid"``: fine chunks DMA'd
          behind a slab gate; covers triangles, segments and arcs --
          measured 1.0-2.0x over block culling, never slower);
        * per-bounce ray re-sorting only for LARGE 3D scenes (>= ~2k
          triangles) -- on smaller scenes or in 2D the per-bounce argsort
          costs more than the skipped chunks save (docs/notes.md numbers);
        * remat for deep traces (bounce budget > 16) so backward-pass
          residual memory stays O(1) in the bounce count.

        Remember to ``morton_sort_triangles`` / ``morton_sort_segments`` the
        scene once at build time so culling has compact chunks to skip.
        Any field can be overridden by keyword.
        """
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        is_3d = isinstance(scene, Scene3D)
        n_surf = (scene.triangles.n_surfaces if is_3d else
                  sum(s.n_surfaces for s in (scene.segments, scene.arcs)
                      if s is not None))
        cfg = dict(
            max_bounces=max_bounces,
            use_pallas=on_tpu,
            # two-level kernel for 3D and for LARGE 2D scenes (segments
            # and arcs; small 2D scenes are latency-bound -- block culling
            # suffices)
            cull=(("grid" if (is_3d or n_surf >= 1024) else True)
                  if on_tpu else False),
            resort_rays=on_tpu and is_3d and n_surf >= 2048,
            remat=max_bounces > 16,
        )
        cfg.update(overrides)
        return TraceConfig(**cfg)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["hit_valid", "point", "norm", "n_in", "n_out", "category",
                 "surf_idx", "kind", "extras"],
    meta_fields=["dim"],
)
@dataclass
class Projection:
    """Per-ray gathered hit data handed to reactions (the static-shape
    equivalent of the reference's projection result dict,
    engine.py:1544-1580)."""

    hit_valid: jax.Array          # (N,) bool
    point: jax.Array              # (N, dim) hit point (= projected ray end)
    norm: jax.Array               # (N,) angle in 2D / (N, 3) vector in 3D
    n_in: jax.Array               # (N,)
    n_out: jax.Array              # (N,)
    category: jax.Array           # (N,) OPTICAL / STOP / TARGET
    surf_idx: jax.Array           # (N,) index into the merged surface set
    kind: jax.Array               # (N,) 2D only: KIND_SEGMENT / KIND_ARC
    extras: Dict[str, jax.Array]  # e.g. trig_u / trig_v / seg_u / arc_u
    dim: int = 3


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rays", "history_p0", "history_p1", "history_state",
                 "history_alive", "fold", "n_bounces"],
    meta_fields=[],
)
@dataclass
class TraceResult:
    """Final ray slots + optional per-bounce history.

    ``history_*`` (if kept) have leading axis = bounce index; ``history_alive``
    marks slots that were still bouncing when that entry was recorded, so a
    ray appears "live" exactly once per bounce until it terminates --
    reconstructing the reference's ray-history lists (engine.py:1379-1403).

    ``fold`` holds the in-scan accumulator when ``trace`` was given a
    ``fold_fn`` -- per-bounce reductions (running losses, path lengths,
    bounce counts) at O(1) memory in the bounce count, so deep traces never
    need ``keep_history`` (SURVEY.md hard part 6).
    """

    rays: RaySet
    history_p0: Optional[jax.Array]
    history_p1: Optional[jax.Array]
    history_state: Optional[jax.Array]
    history_alive: Optional[jax.Array]
    fold: object = None
    n_bounces: int = 0

    @property
    def finished_rays(self):
        return self.rays.finished

    @property
    def active_rays(self):
        return self.rays.active

    @property
    def stopped_rays(self):
        return self.rays.stopped

    @property
    def dead_rays(self):
        return self.rays.dead


# ======================================================================
# 3D
# ======================================================================

def _annotation_cols(surface, dtype, value_mode):
    """Annotation columns for the fused per-bounce surface-table gather:
    either per-surface (category, n_in, n_out) floats ("value" mode) or ONE
    column with category<<20 | mat_in<<10 | mat_out packed into the f32
    mantissa (exact below 2^24; ids are range-checked at scene build).
    Shared by project_2d and project_3d -- the bit layout must stay in one
    place."""
    if value_mode:
        return [surface.category.astype(dtype)[:, None],
                surface.fields["n_in"][:, None],
                surface.fields["n_out"][:, None]]
    packed = (surface.category.astype(jnp.int32) * (1 << 20)
              + surface.mat_in * (1 << 10) + surface.mat_out)
    return [packed.astype(dtype)[:, None]]


def _unpack_annotation(rows, o, value_mode, materials, wavelength):
    """Inverse of :func:`_annotation_cols` on the TRANSPOSED (k, N) gathered
    rows; returns per-ray ``(category, n_in, n_out)``."""
    if value_mode:
        return rows[o].astype(jnp.int32), rows[o + 1], rows[o + 2]
    code = rows[o].astype(jnp.int32)
    category = code >> 20
    n_in = material_index_lookup(materials, wavelength, (code >> 10) & 0x3FF)
    n_out = material_index_lookup(materials, wavelength, code & 0x3FF)
    return category, n_in, n_out


@jax.custom_vjp
def _gather_rows_t(table, idx):
    """``table[idx].T`` with a TPU-fast backward.

    The VJP of a row gather is a scatter-add of N cotangent rows into the
    (M, k) table; XLA's TPU scatter serializes row updates at a flat
    ~8 ms per million rays per bounce.  For tables up to SEGSUM_MAX_M rows
    the sum runs as range-gated MXU matmuls instead
    (pallas_kernels.segment_sum_pallas, ~1 ms at m=256); above that the
    scatter measurably wins, because this cotangent stream is in ray-SLOT
    order (any resort was inverted before the gather) so the kernel's
    range gating cannot skip table tiles -- see the measured crossover
    table at the kernel definition."""
    return table[idx].T


def _gather_rows_t_fwd(table, idx):
    return table[idx].T, (idx, table.shape[0])


def _gather_rows_t_bwd(res, ct):
    idx, m = res
    from tensorflowraytrace_tpu.ops import pallas_kernels as pk

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if on_tpu and m <= pk.SEGSUM_MAX_M:
        dtable = pk.segment_sum_pallas(ct, idx, m)
    else:
        dtable = jnp.zeros((m, ct.shape[0]), ct.dtype).at[idx].add(ct.T)
    return dtable, None


_gather_rows_t.defvjp(_gather_rows_t_fwd, _gather_rows_t_bwd)


def _tag_hit(hit):
    """Name the (N,)-sized search results as checkpoint residuals.

    Under ``cfg.remat`` the bounce body is rematerialized in the backward
    pass -- which would re-run the N x M nearest-hit search (the expensive
    half of each bounce) a second time.  The search is non-differentiable
    (its gradients flow through the O(N) refine instead), so saving its tiny
    per-ray output lets the backward recompute only the cheap elementwise
    work: ``trace`` pairs this with a ``save_only_these_names`` policy.
    A no-op when no checkpoint is active.
    """
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(hit, "trace_hit")


def project_3d(rays: RaySet, scene: Scene3D, materials, cfg: TraceConfig) -> Projection:
    """One intersection + gather pass (the analog of process_projection_3D,
    engine.py:1988-2191, without the boolean_mask compaction).

    All per-surface data (vertices, normal, category, material ids) is packed
    into one (M, 16) table and gathered with a SINGLE dynamic-gather per
    bounce: separate gathers were the dominant per-bounce cost on TPU
    (dynamic gather is scalar-unit bound, ~halving full-engine throughput).
    """
    i_eps, s_eps, r_eps = cfg.epsilons(rays.p0.dtype)
    tri = scene.triangles
    search_p0, search_p1 = rays.p0, rays.p1
    if cfg.cull:
        # park terminated rays far outside every chunk AABB so their slab
        # tests fail; once a whole ray block has terminated, the culled
        # kernel skips every chunk for it -- deep traces get cheaper as
        # rays die off
        inactive = (rays.state != ACTIVE)[:, None]
        park0 = jnp.full_like(rays.p0, 1e30)
        park1 = park0 * (1 + 1e-6)
        search_p0 = jnp.where(inactive, park0, rays.p0)
        search_p1 = jnp.where(inactive, park1, rays.p1)

    order = None
    if cfg.cull and cfg.resort_rays:
        # spatial re-sort: keep ray blocks coherent so block-level culling
        # keeps working after the first bounce (parked rays sort last)
        from tensorflowraytrace_tpu.models.acceleration import morton_codes_device

        sg = jax.lax.stop_gradient
        lo = jnp.minimum(jnp.min(sg(tri.vp), axis=0), jnp.min(sg(tri.v2), axis=0))
        hi = jnp.maximum(jnp.max(sg(tri.vp), axis=0), jnp.max(sg(tri.v2), axis=0))
        codes = morton_codes_device(sg(search_p0), lo, hi)
        order = jnp.argsort(codes)
        search_p0 = search_p0[order]
        search_p1 = search_p1[order]

    hit = isect.nearest_hit_triangles(
        search_p0, search_p1, tri, i_eps, s_eps, r_eps,
        surf_chunk=cfg.surf_chunk, ray_block=cfg.ray_block,
        use_pallas=cfg.use_pallas, cull=cfg.cull,
    )
    if order is not None:
        # scatter results back to slot order
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        hit = dataclasses.replace(
            hit, valid=hit.valid[inv], idx=hit.idx[inv], ray_u=hit.ray_u[inv],
            kind=hit.kind[inv], branch=hit.branch[inv],
        )
    hit = _tag_hit(hit)

    dtype = rays.p0.dtype
    value_mode = cfg.refractive_index_type == "value"
    # One fused table gather per bounce; int ids pack into one f32 column
    # (exact below 2^24).  Measured on v5e: gathering the 3 norm columns is
    # FASTER than recomputing normals from the gathered vertices (cross +
    # normalize costs more than the extra gather width), so norms are always
    # gathered despite the norm_derived flag.
    gather_norm = True
    cols = []
    if cfg.differentiable:
        cols += [tri.vp, tri.v1, tri.v2]
    if gather_norm:
        cols += [tri.norm]
    if not value_mode and not materials:
        raise ValueError("trace: refractive_index_type='index' needs materials")
    cols += _annotation_cols(tri, dtype, value_mode)
    table = jnp.concatenate(cols, axis=1)
    # one gather + one explicit transpose: the gathered (N, k) rows are
    # row-major (lanes on the k-sized dim, heavy lane waste on TPU); a single
    # relayout makes every downstream column a contiguous (N,) array
    rows = _gather_rows_t(table, hit.idx)          # ONE gather per bounce

    o = 9 if cfg.differentiable else 0
    if gather_norm:
        norm = rows[o:o + 3].T
        o += 3
    category, n_in, n_out = _unpack_annotation(rows, o, value_mode, materials,
                                               rays.wavelength)

    extras = {}
    if cfg.differentiable:
        vp = rows[0:3].T
        v1 = rows[3:6].T
        v2 = rows[6:9].T
        if not gather_norm:
            norm = compute_face_normals(vp, v1, v2)
        point, ray_u, tu, tv = isect.refine_triangle_hit_from(
            rays.p0, rays.p1, vp, v1, v2, i_eps
        )
        extras = {"ray_u": ray_u, "trig_u": tu, "trig_v": tv}
    else:
        # the search's ray parameter IS the refine's (same algebra); no
        # surface-geometry gradient flows on this path
        point = rays.p0 + hit.ray_u[:, None] * (rays.p1 - rays.p0)
        extras = {"ray_u": hit.ray_u}
    return Projection(
        hit_valid=hit.valid, point=point, norm=norm, n_in=n_in, n_out=n_out,
        category=category, surf_idx=hit.idx, kind=hit.kind,
        extras=extras, dim=3,
    )


# ======================================================================
# 2D
# ======================================================================

def project_2d(rays: RaySet, scene: Scene2D, materials, cfg: TraceConfig) -> Projection:
    """One 2D intersection + gather pass (process_projection_2D,
    engine.py:1544-1986); segment-vs-arc resolution happens inside
    ``nearest_hit_2d``."""
    i_eps, s_eps, r_eps = cfg.epsilons(rays.p0.dtype)
    search_p0, search_p1 = rays.p0, rays.p1
    if cfg.cull:
        # park terminated rays so whole-block slab tests fail (see project_3d)
        inactive = (rays.state != ACTIVE)[:, None]
        park0 = jnp.full_like(rays.p0, 1e30)
        park1 = park0 * (1 + 1e-6)
        search_p0 = jnp.where(inactive, park0, rays.p0)
        search_p1 = jnp.where(inactive, park1, rays.p1)

    order = None
    if cfg.cull and cfg.resort_rays and scene.segments is not None:
        from tensorflowraytrace_tpu.models.acceleration import morton_codes_device

        sg = jax.lax.stop_gradient
        seg = scene.segments
        lo = jnp.minimum(jnp.min(sg(seg.p0), axis=0), jnp.min(sg(seg.p1), axis=0))
        hi = jnp.maximum(jnp.max(sg(seg.p0), axis=0), jnp.max(sg(seg.p1), axis=0))
        codes = morton_codes_device(sg(search_p0), lo, hi)
        order = jnp.argsort(codes)
        search_p0 = search_p0[order]
        search_p1 = search_p1[order]

    hit = isect.nearest_hit_2d(
        search_p0, search_p1, scene, i_eps, s_eps, r_eps,
        surf_chunk=cfg.surf_chunk, ray_block=cfg.ray_block,
        use_pallas=cfg.use_pallas,
        # conservative 2D chunk culling (segments AND arcs; arcs use
        # window-aware chunk AABBs).  cull is exact: results match brute.
        cull=cfg.cull,
    )
    if order is not None:
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        hit = dataclasses.replace(
            hit, valid=hit.valid[inv], idx=hit.idx[inv], ray_u=hit.ray_u[inv],
            kind=hit.kind[inv], branch=hit.branch[inv],
        )
    hit = _tag_hit(hit)

    n = rays.n_rays
    dtype = rays.p0.dtype
    point = rays.p1
    norm = jnp.zeros((n,), dtype=dtype)
    n_in = jnp.zeros((n,), dtype=dtype)
    n_out = jnp.ones((n,), dtype=dtype)
    category = jnp.zeros((n,), dtype=jnp.int32)
    extras = {"ray_u": hit.ray_u}

    # One fused table gather per surface kind (same design as project_3d:
    # geometry columns + one packed-or-value annotation column; separate
    # per-ray gathers measured ~9 ms each per bounce at 1M rays on v5e,
    # the fused row gather ~2 ms total)
    value_mode = cfg.refractive_index_type == "value"
    if not value_mode and not materials:
        raise ValueError("trace: refractive_index_type='index' needs materials")

    if scene.segments is not None:
        seg = scene.segments
        table = jnp.concatenate(
            [seg.p0, seg.p1] + _annotation_cols(seg, dtype, value_mode), axis=1)
        # one gather + one explicit transpose: the gathered (N, k) rows are
        # row-major (lanes on the k-sized dim, ~64x lane waste on TPU); a
        # single relayout makes every downstream column a contiguous (N,)
        rows = _gather_rows_t(table, hit.idx)
        s_point, _, seg_u, s_norm = isect.refine_segment_hit_from(
            rays.p0, rays.p1, rows[0:2].T, rows[2:4].T, i_eps
        )
        s_cat, s_nin, s_nout = _unpack_annotation(rows, 4, value_mode,
                                                  materials, rays.wavelength)
        is_seg = (hit.kind == isect.KIND_SEGMENT)
        point = jnp.where(is_seg[:, None], s_point, point)
        norm = jnp.where(is_seg, s_norm, norm)
        n_in = jnp.where(is_seg, s_nin, n_in)
        n_out = jnp.where(is_seg, s_nout, n_out)
        category = jnp.where(is_seg, s_cat, category)
        extras["seg_u"] = seg_u

    if scene.arcs is not None:
        arc = scene.arcs
        table = jnp.concatenate(
            [arc.center, arc.radius[:, None]]
            + _annotation_cols(arc, dtype, value_mode), axis=1)
        rows = _gather_rows_t(table, hit.idx)          # see segments note
        a_point, _, arc_u, a_norm = isect.refine_arc_hit_from(
            rays.p0, rays.p1, rows[0:2].T, rows[2], hit.branch, i_eps
        )
        a_cat, a_nin, a_nout = _unpack_annotation(rows, 3, value_mode,
                                                  materials, rays.wavelength)
        is_arc = (hit.kind == isect.KIND_ARC)
        point = jnp.where(is_arc[:, None], a_point, point)
        norm = jnp.where(is_arc, a_norm, norm)
        n_in = jnp.where(is_arc, a_nin, n_in)
        n_out = jnp.where(is_arc, a_nout, n_out)
        category = jnp.where(is_arc, a_cat, category)
        extras["arc_u"] = arc_u

    return Projection(
        hit_valid=hit.valid, point=point, norm=norm, n_in=n_in, n_out=n_out,
        category=category, surf_idx=hit.idx, kind=hit.kind, extras=extras, dim=2,
    )


# ======================================================================
# the bounce step + trace loop
# ======================================================================

def default_reaction(proj: Projection, rays: RaySet, cfg: TraceConfig):
    """StandardReaction: Snell's law refraction / reflection / TIR
    (operation.py:200-307)."""
    length = jnp.asarray(cfg.new_ray_length, dtype=rays.p0.dtype)
    if proj.dim == 3:
        return snell_3d_vec(rays.p0, proj.point, proj.norm, proj.n_in,
                            proj.n_out, length)
    xs, ys, xe, ye = snells_law_2D(
        rays.p0[:, 0], rays.p0[:, 1], proj.point[:, 0], proj.point[:, 1],
        proj.norm, proj.n_in, proj.n_out, length,
    )
    return jnp.stack([xs, ys], axis=1), jnp.stack([xe, ye], axis=1)


def single_pass(rays: RaySet, scene, materials, cfg: TraceConfig,
                reaction: Callable = default_reaction):
    """One bounce: project, classify, react.  Returns (new_rays, record)
    where record = (p0, p1_projected, state, alive) describes the parent rays
    as they ended this pass (for history)."""
    if isinstance(scene, Scene3D):
        proj = project_3d(rays, scene, materials, cfg)
    else:
        proj = project_2d(rays, scene, materials, cfg)

    active = rays.state == ACTIVE
    # finite-hit guard: a grazing hit with |det| barely over epsilon can put
    # the refined point at u ~ 1e30+, which overflows f32 on the NEXT bounce
    # (inf - inf -> NaN in the reflection).  Treat such hits as misses -- the
    # ray dies with finite coordinates.  Measured: ~2 rays per million on a
    # random-soup guide scene; zero effect on all other rays.
    finite_hit = jnp.all(jnp.isfinite(proj.point), axis=-1)
    valid_hit = active & proj.hit_valid & finite_hit

    # project endpoints onto the hit (engine.py:2052-2060)
    p1 = jnp.where(valid_hit[:, None], proj.point, rays.p1)

    # classify (engine.py:2068-2111)
    hit_state = jnp.where(
        proj.category == OPTICAL, ACTIVE,
        jnp.where(proj.category == STOP, STOPPED, FINISHED),
    )
    new_state = jnp.where(
        active, jnp.where(proj.hit_valid & finite_hit, hit_state, DEAD),
        rays.state,
    )

    # dead-ray visualization stretch (engine.py:2036-2046)
    if cfg.dead_ray_length is not None:
        became_dead = active & ~(proj.hit_valid & finite_hit)
        stretch = rays.p0 + cfg.dead_ray_length * (p1 - rays.p0)
        p1 = jnp.where(became_dead[:, None], stretch, p1)

    # reaction: child replaces parent in-slot where the ray keeps bouncing.
    # A reaction may return (p0, p1) or (p0, p1, field_updates): the third
    # element is a dict of per-ray arrays merged into ``rays.fields`` for
    # reacting slots only -- the static-shape analog of the reference ops'
    # freedom to rewrite arbitrary ray fields in op.main (operation.py:55-68);
    # used e.g. by operations.fresnel_intensity_reaction.
    out = reaction(proj, dataclasses.replace(rays, p1=p1), cfg)
    if len(out) == 3:
        child_p0, child_p1, field_updates = out
    else:
        child_p0, child_p1 = out
        field_updates = None
    reacts = valid_hit & (proj.category == OPTICAL)
    # numeric backstop (same spirit as finite_hit above): if a degenerate
    # reaction produced non-finite child coordinates, kill the ray cleanly
    # instead of letting NaN/inf propagate through later bounces
    child_ok = (jnp.all(jnp.isfinite(child_p0), axis=-1)
                & jnp.all(jnp.isfinite(child_p1), axis=-1))
    new_state = jnp.where(reacts & ~child_ok, DEAD, new_state)
    reacts = reacts & child_ok
    out_p0 = jnp.where(reacts[:, None], child_p0, rays.p0)
    out_p1 = jnp.where(reacts[:, None], child_p1, p1)

    new_fields = rays.fields
    if field_updates:
        new_fields = dict(rays.fields)
        for k, v in field_updates.items():
            if k.startswith("__"):
                # reserved reaction-protocol metadata (e.g. "__reflects__"
                # emitted by direction-modifying reactions for outer field
                # trackers to consume, operations._run_base) -- never a ray
                # field; drop whatever no outer wrapper claimed
                continue
            old = new_fields.get(k)
            if old is None:
                raise KeyError(
                    f"reaction updates ray field {k!r} but the rays do not "
                    "carry it; seed it via RaySet.make(fields={...}) or a "
                    "source extra_field so its shape/dtype are explicit")
            mask = reacts.reshape(reacts.shape + (1,) * (v.ndim - 1))
            new_fields[k] = jnp.where(mask, v.astype(old.dtype), old)

    new_rays = dataclasses.replace(rays, p0=out_p0, p1=out_p1,
                                   state=new_state, fields=new_fields)
    record = (rays.p0, p1, new_state, active)
    return new_rays, record


def trace(rays: RaySet, scene, materials=None, cfg: TraceConfig = TraceConfig(),
          reaction: Callable = default_reaction,
          fold_fn: Optional[Callable] = None,
          fold_init=None, fold_fields: bool = False) -> TraceResult:
    """Multi-bounce trace (ray_trace, engine.py:2311-2330) as a lax.scan.

    jit-friendly: wrap as ``jax.jit(trace, static_argnames=('cfg',))`` or
    close over cfg.  Differentiable end-to-end w.r.t. scene geometry and ray
    starts.

    ``fold_fn(acc, record) -> acc`` (with ``fold_init`` as the starting
    accumulator) runs inside the scan each bounce; ``record`` is the same
    ``(p0, p1_projected, state, was_active)`` tuple history entries hold.
    The final accumulator lands in ``TraceResult.fold``.  This gives
    per-bounce reductions (running losses, optical path length, bounce
    counts) at O(1) memory in the bounce count -- use it instead of
    ``keep_history`` for deep traces.  Composes with ``cfg.remat`` and is
    differentiable.  See ``path_length_fold`` / ``landing_sum_fold`` /
    ``landing_histogram_fold``.

    ``fold_fields=True`` appends the post-bounce ray ``fields`` dict as a
    fifth record element, so folds can reduce tracker-carried physics
    (e.g. intensity-weighted landing histograms) without keeping per-ray
    results.  History records are unchanged (fields would multiply the
    stacked history cost; folds reduce them instead).

    Scaling note: one dispatch holds every per-ray slot (plus per-bounce
    residuals under ``jax.grad``) in HBM at once -- measured single-chip
    ceiling ~16.8M rays x 4k tris (docs/notes.md).  Past that, stream ray
    super-blocks with :func:`trace_streamed` (fold losses only, O(block)
    memory, unbounded ray count).
    """
    materials = tuple(materials or ())

    if cfg.keep_history:
        n_rays = jax.tree.leaves(rays)[0].shape[0]
        dim = rays.p0.shape[-1]
        itemsize = jnp.dtype(rays.p0.dtype).itemsize
        hist_bytes = cfg.max_bounces * n_rays * (2 * dim * itemsize + 5)
        if hist_bytes > 16 << 30:
            raise ValueError(
                f"keep_history at {n_rays} rays x {cfg.max_bounces} bounces "
                f"would stack ~{hist_bytes / 2 ** 30:.0f} GiB of per-bounce "
                "history -- far past any chip's HBM.  Use a fold "
                "(fold_fn/fold_init, e.g. landing_sum_fold) for the "
                "reduction you need, and trace_streamed to stream ray "
                "super-blocks past the single-dispatch ceiling.")

    if cfg.early_exit:
        # the reference's early exit (engine.py:2324-2330): stop bouncing
        # once no slot is ACTIVE.  while_loop is forward-only -- use the
        # scan path for anything that needs gradients or history.
        if cfg.keep_history:
            raise ValueError("early_exit is incompatible with keep_history "
                             "(while_loop has no stacked outputs)")

        def w_cond(carry):
            rays_c, _, i = carry
            return (i < cfg.max_bounces) & jnp.any(rays_c.state == ACTIVE)

        def w_body(carry):
            rays_c, acc, i = carry
            new_rays, record = single_pass(rays_c, scene, materials, cfg,
                                           reaction)
            if fold_fn is not None:
                rec = record + (new_rays.fields,) if fold_fields else record
                acc = fold_fn(acc, rec)
            return new_rays, acc, i + 1

        final, acc, n_done = lax.while_loop(
            w_cond, w_body, (rays, fold_init, jnp.asarray(0, jnp.int32)))
        # n_bounces reports how deep the trace actually went (the loop's
        # early-exit observability win); on the scan path it is the static
        # cfg.max_bounces
        return TraceResult(
            rays=final, history_p0=None, history_p1=None, history_state=None,
            history_alive=None, fold=acc, n_bounces=n_done,
        )

    def body(carry, _):
        rays_c, acc = carry
        new_rays, record = single_pass(rays_c, scene, materials, cfg, reaction)
        if fold_fn is not None:
            rec = record + (new_rays.fields,) if fold_fields else record
            acc = fold_fn(acc, rec)
        ys = record if cfg.keep_history else None
        return (new_rays, acc), ys

    if cfg.remat:
        # rematerialize the bounce in backward EXCEPT the nearest-hit search:
        # its per-ray results are named residuals (see _tag_hit), so backward
        # keeps O(1)-in-bounces memory for the heavy intermediates but never
        # re-runs the N x M kernel.  Measured ~1.5x on deep guide training.
        body = jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names("trace_hit"),
        )

    (final, acc), ys = lax.scan(body, (rays, fold_init), xs=None,
                                length=cfg.max_bounces)
    if cfg.keep_history:
        h_p0, h_p1, h_state, h_alive = ys
    else:
        h_p0 = h_p1 = h_state = h_alive = None
    return TraceResult(
        rays=final, history_p0=h_p0, history_p1=h_p1, history_state=h_state,
        history_alive=h_alive, fold=acc, n_bounces=cfg.max_bounces,
    )


# ======================================================================
# in-scan fold helpers (history-free deep-trace reductions)
# ======================================================================

def newly_terminated(record, state_code):
    """Mask of slots whose ray reached ``state_code`` on THIS bounce.
    Tolerates both record arities (4-tuple, or 5 with ``fold_fields``)."""
    _, _, state, alive = record[:4]
    return alive & (state == state_code)


def path_length_fold(n_rays, dtype):
    """(init, fn): per-slot total optical path length -- the sum of segment
    lengths over every bounce the ray was alive.  Unrecoverable from final
    slots (each bounce overwrites p0/p1), so without this it would need the
    full history."""
    init = jnp.zeros((n_rays,), dtype=dtype)

    def fn(acc, record):
        p0, p1, state, alive = record[:4]
        seg = jnp.linalg.norm(p1 - p0, axis=-1)
        return acc + jnp.where(alive, seg, 0)

    return init, fn


def bounce_count_fold(n_rays):
    """(init, fn): per-slot number of bounces each ray survived."""
    init = jnp.zeros((n_rays,), dtype=jnp.int32)

    def fn(acc, record):
        _, _, _, alive = record[:4]
        return acc + alive.astype(jnp.int32)

    return init, fn


def landing_sum_fold(value_fn, dtype, state_code=FINISHED):
    """(init, fn): running scalar sum of ``value_fn(p1) -> (N,)`` over rays at
    the bounce they terminate with ``state_code`` -- e.g. a squared landing
    error summed over finished rays, evaluated in-scan so a 50-bounce guide
    loss never materializes history OR final-slot gathers."""
    init = jnp.zeros((), dtype=dtype)

    def fn(acc, record):
        _, p1, state, alive = record[:4]
        mask = alive & (state == state_code)
        return acc + jnp.sum(jnp.where(mask, value_fn(p1), 0))

    return init, fn


def landing_histogram_fold(value_range, x_bins, y_bins=None,
                           dtype=jnp.float32, axes=(0, 1),
                           state_code=FINISHED, weight_field=None):
    """(init, fn): a (y_bins, x_bins) landing-position histogram
    accumulated in-scan -- the irradiance / caustic image of every ray at
    the bounce it reaches ``state_code``, at O(bins) memory regardless of
    ray count or bounce depth.  Composes with :func:`trace_streamed`
    (merge="sum" stacks every block into the same image), so a 100M+ ray
    render is one pass (examples/caustic_render.py).

    ``axes``: which two components of the landing point to bin as (x, y)
    -- e.g. ``(0, 1)`` bins the (x, y) coordinates of landings on a
    z-normal 3D target plane.  ``weight_field``: name of a per-ray field
    (e.g. "intensity" under ``fresnel_intensity_reaction``) weighting each
    landing; requires ``trace(..., fold_fields=True)`` so the fold record
    carries the tracker fields.  Bins via ``analysis.histogram2d``
    (reference analyze.py:103-106): y on axis 0, out-of-range landings
    clamped into the edge bins; non-landing slots contribute weight 0.
    """
    from tensorflowraytrace_tpu.analysis import histogram2d

    y_bins = y_bins or x_bins
    init = jnp.zeros((y_bins, x_bins), dtype=dtype)
    ax, ay = axes

    def fn(acc, record):
        _, p1, state, alive = record[:4]
        mask = alive & (state == state_code)
        if weight_field is not None:
            if len(record) < 5:
                raise KeyError(
                    "landing_histogram_fold(weight_field=...) reduces a "
                    "tracker-carried ray field, so the fold record must "
                    "include fields: pass fold_fields=True to trace() / "
                    "trace_streamed()")
            w = record[4][weight_field].astype(acc.dtype)
        else:
            w = jnp.ones(p1.shape[:-1], acc.dtype)
        return acc + histogram2d(p1[..., ax], p1[..., ay], value_range,
                                 x_bins, y_bins, dtype=acc.dtype,
                                 weights=jnp.where(mask, w, 0))

    return init, fn


# ======================================================================
# streaming mega-batch tracing (past the single-dispatch HBM ceiling)
# ======================================================================

@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fold", "state_counts"],
    meta_fields=["n_blocks", "block_size", "n_rays"],
)
@dataclass
class StreamedResult:
    """Result of :func:`trace_streamed`: the merged fold accumulator plus
    cheap aggregate observability.  No per-ray arrays -- that is the point
    (a 100M-ray stream never materializes 100M final slots unless the fold
    itself is per-ray and merged with ``merge="concat"``).

    ``state_counts``: (4,) int32 ray counts indexed by the state codes
    [ACTIVE, FINISHED, STOPPED, DEAD] (padding slots already subtracted).
    """

    fold: object
    state_counts: jax.Array
    n_blocks: int = 1
    block_size: int = 0
    n_rays: int = 0

    @property
    def counts_by_name(self):
        c = self.state_counts
        return {"active": c[ACTIVE], "finished": c[FINISHED],
                "stopped": c[STOPPED], "dead": c[DEAD]}


def _state_counts(state):
    codes = jnp.asarray([ACTIVE, FINISHED, STOPPED, DEAD], state.dtype)
    return jnp.sum(state[None, :] == codes[:, None], axis=1,
                   dtype=jnp.int32)


def _pad_rays_dead(rays: RaySet, pad: int) -> RaySet:
    """Grow the ray axis by ``pad`` DEAD slots (edge-replicated coordinates
    keep every downstream normalization finite; DEAD state keeps them out of
    every fold, reaction, and classification)."""

    def edge_pad(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, mode="edge")

    padded = jax.tree.map(edge_pad, rays)
    state = jnp.concatenate(
        [rays.state, jnp.full((pad,), DEAD, rays.state.dtype)])
    return dataclasses.replace(padded, state=state)


def _map_in_dispatches(body, xs, bpd):
    """``lax.map(body, xs)`` split into host-side dispatches of at most
    ``bpd`` blocks each, concatenated back along the block axis.

    One jitted mapper serves every full dispatch (the ragged tail, if any,
    compiles once more).  This bounds the uninterrupted device time of any
    single XLA program -- the remote TPU runtime kills workers whose
    dispatch runs multi-minute (see trace_streamed's blocks_per_dispatch
    doc) -- at the cost of one tunnel round-trip per dispatch, which is
    noise next to the tens of seconds each dispatch computes."""
    n = jax.tree.leaves(xs)[0].shape[0]
    mapper = jax.jit(lambda chunk: lax.map(body, chunk))
    parts = [mapper(jax.tree.map(lambda a: a[d0:d0 + bpd], xs))
             for d0 in range(0, n, bpd)]
    return jax.tree.map(lambda *ps: jnp.concatenate(ps, axis=0), *parts)


def trace_streamed(rays, scene, materials=None,
                   cfg: TraceConfig = TraceConfig(),
                   reaction: Callable = default_reaction,
                   fold_fn: Callable = None, fold_init=None,
                   block_size: int = 1 << 20, n_blocks: Optional[int] = None,
                   merge="sum", remat_blocks: bool = True,
                   blocks_per_dispatch: Optional[int] = None,
                   fold_fields: bool = False) -> StreamedResult:
    """Trace an unbounded number of rays through ``lax.map`` over ray
    super-blocks, merging fold accumulators across blocks -- the streaming
    answer to the single-dispatch HBM ceiling (VERDICT r3 next-round #4:
    16.8M rays x 4k tris fits, 33.5M OOMs; this is O(block_size) in device
    memory for scalar folds, so the ray count is bounded by wall-clock, not
    HBM).

    Parameters
    ----------
    rays : RaySet | Callable[[int], RaySet]
        Either a concrete ray set (split into ``ceil(N / block_size)``
        blocks; a ragged tail is padded with DEAD slots that no fold or
        count ever sees), or a *block generator* ``rays(i) -> RaySet`` of
        exactly ``block_size`` rays -- e.g. sampling a source with
        ``jax.random.fold_in(key, i)`` -- in which case the input stream
        itself never materializes and ``n_blocks`` is required.
    fold_fn, fold_init : the in-scan fold (REQUIRED)
        Streaming only returns reductions; per-ray final slots of the whole
        stream are exactly what does not fit.  ``fold_init`` must be sized
        for ONE block (e.g. ``path_length_fold(block_size, dtype)``).
    merge : "sum" | "concat" | callable
        How to combine the (n_blocks, ...) stacked per-block accumulators:
        ``"sum"`` (right for scalar running losses / counts -- e.g.
        ``landing_sum_fold``), ``"concat"`` (per-ray accumulators: flattens
        the leading block axes and trims padding, giving (N, ...) leaves),
        or any callable on the stacked pytree.
    remat_blocks : bool
        ``jax.checkpoint`` each block's trace so reverse-mode memory stays
        O(block_size) + O(fold) instead of storing every block's residuals
        -- gradient-trained streaming losses at 100M+ rays.  Costs one
        extra forward per block in backward.
    blocks_per_dispatch : optional int
        Split the block map into HOST-side dispatches of at most this many
        blocks each (one compiled program serves every dispatch; a ragged
        tail compiles once more).  A deep many-block map fused into ONE
        XLA program runs minutes of uninterrupted device time, long enough
        to trip the TPU runtime's execution watchdog -- measured on the
        remote-attached v5e chip: 8 blocks x 4.2M rays x 24 bounces
        (~160 s) reproducibly kills the worker ("TPU worker process
        crashed"), while the same blocks run fine as separate dispatches
        (docs/notes.md).  Pick a value that keeps each dispatch well under
        a minute of device time.  Host-side only: leave ``None`` (the
        single ``lax.map`` program) when calling under ``jit``/``shard_map``
        (e.g. via ``parallel_trace_streamed``), and for gradient use --
        the host loop is not differentiable end-to-end; for watchdog-safe
        DIFFERENTIATED streams use :func:`streamed_value_and_grad`
        (host-side gradient accumulation, exactly equal results).

    Composes with sharding: see ``parallel.sharding.parallel_trace_streamed``
    (devices split the stream, each streams its shard in blocks, one psum
    merges -- N_chips x streaming).
    """
    if fold_fn is None:
        raise ValueError(
            "trace_streamed needs a fold (fold_fn/fold_init): streaming "
            "returns reductions only -- per-ray results of the full stream "
            "are exactly what exceeds HBM.  See landing_sum_fold / "
            "path_length_fold, or use plain trace() for sizes that fit.")
    materials = tuple(materials or ())

    if callable(rays):
        if n_blocks is None:
            raise ValueError("trace_streamed(rays=<callable>) needs n_blocks")
        pad = 0
        n_rays = n_blocks * block_size

        def get_block(i):
            return rays(i)

        xs = jnp.arange(n_blocks)
    else:
        n_rays = jax.tree.leaves(rays)[0].shape[0]
        n_blocks = -(-n_rays // block_size)
        pad = n_blocks * block_size - n_rays
        if pad:
            rays = _pad_rays_dead(rays, pad)
        stacked = jax.tree.map(
            lambda a: a.reshape((n_blocks, block_size) + a.shape[1:]), rays)

        def get_block(blk):
            return blk

        xs = stacked

    def body(x):
        blk = get_block(x)
        res = trace(blk, scene, materials, cfg, reaction,
                    fold_fn=fold_fn, fold_init=fold_init,
                    fold_fields=fold_fields)
        return res.fold, _state_counts(res.rays.state)

    if remat_blocks:
        body = jax.checkpoint(body)

    if blocks_per_dispatch is None:
        folds, counts = lax.map(body, xs)
    else:
        folds, counts = _map_in_dispatches(body, xs,
                                           int(blocks_per_dispatch))

    if merge == "sum":
        fold = jax.tree.map(lambda a: jnp.sum(a, axis=0), folds)
    elif merge == "concat":
        fold = jax.tree.map(
            lambda a: a.reshape((n_blocks * block_size,) + a.shape[2:])
            [:n_rays], folds)
    elif callable(merge):
        fold = merge(folds)
    else:
        raise ValueError(f"merge must be 'sum', 'concat' or a callable, "
                         f"got {merge!r}")

    state_counts = jnp.sum(counts, axis=0)
    if pad:
        # the padding slots are DEAD by construction; take them back out
        state_counts = state_counts - jnp.asarray(
            [0, 0, 0, pad], state_counts.dtype)
    return StreamedResult(fold=fold, state_counts=state_counts,
                          n_blocks=int(n_blocks), block_size=int(block_size),
                          n_rays=int(n_rays))


def streamed_value_and_grad(block_loss: Callable, n_blocks: int,
                            blocks_per_dispatch: int = 1,
                            remat_blocks: bool = True) -> Callable:
    """``value_and_grad`` of a block-decomposed streaming loss with
    HOST-side gradient accumulation -- differentiable streaming past the
    TPU runtime's execution watchdog.

    ``trace_streamed(remat_blocks=True)`` differentiates end-to-end only
    as ONE XLA program (``blocks_per_dispatch`` must stay ``None``), and a
    long differentiated stream trips the runtime watchdog: measured on the
    remote-attached v5e, a 16-block x 2.1M-ray x 24-bounce fwd+bwd map
    (~90 s device time) is reproducibly killed while 8 blocks (~45 s)
    survive.  But a streaming loss is a SUM over blocks, so its gradient
    is the sum of per-block gradients -- differentiation commutes with the
    host loop.  This helper jits one bounded chunk program (``lax.map`` of
    ``jax.value_and_grad`` over ``blocks_per_dispatch`` block indices,
    in-dispatch sums) and accumulates value and gradient across dispatches
    on the host: device time per program is bounded, total ray count is
    not, and the result is exactly the single-program gradient.

    Parameters
    ----------
    block_loss : callable ``(params, i, *aux) -> scalar``
        Loss contribution of block ``i`` (an int32 scalar): typically
        sample/slice the block's rays from ``i``, trace with a fold, and
        return the folded scalar.  Must be pure and jit-traceable.
        ``aux`` are extra NON-differentiated arguments passed through from
        the returned function's call (e.g. the step's PRNG key -- closing
        over a Python variable instead would bake its first value into the
        jitted chunk program).
    n_blocks : total number of blocks in the stream.
    blocks_per_dispatch : blocks fused per device program.  Size so one
        dispatch (forward + backward per block) stays well under a minute
        of device time; the ragged tail compiles once more.
    remat_blocks : wrap each block in ``jax.checkpoint`` so the backward
        holds one block's residuals at a time (the trace_streamed policy).

    Returns ``fn(params, *aux) -> (value, grad)`` with ``value`` the
    summed loss and ``grad`` matching ``jax.grad`` of the fused sum
    (tests/test_streamed.py pins the equality).  For multi-chip streams
    use :func:`parallel.sharding.parallel_streamed_value_and_grad` -- the
    same loop with the block index space sharded over the ray mesh and one
    psum of value/grad per dispatch.
    """

    if n_blocks <= 0:
        raise ValueError(
            f"streamed_value_and_grad: n_blocks must be positive, got "
            f"{n_blocks} (a rays // block computation may have rounded "
            "to zero -- clamp with max(1, ...))")

    def chunk(params, aux, idxs):
        def body(i):
            f = lambda p: block_loss(p, i, *aux)
            if remat_blocks:
                f = jax.checkpoint(f)
            return jax.value_and_grad(f)(params)

        vals, grads = lax.map(body, idxs)
        return jnp.sum(vals), jax.tree.map(lambda g: jnp.sum(g, axis=0),
                                           grads)

    jitted = jax.jit(chunk)
    bpd = int(blocks_per_dispatch)

    def run(params, *aux):
        value = None
        grad = None
        for d0 in range(0, n_blocks, bpd):
            idxs = jnp.arange(d0, min(d0 + bpd, n_blocks), dtype=jnp.int32)
            v, g = jitted(params, aux, idxs)
            value = v if value is None else value + v
            grad = g if grad is None else jax.tree.map(jnp.add, grad, g)
        return value, grad

    return run
