"""Production-scale caustic rendering: stream 100M+ rays into one image.

The classic swimming-pool caustic: collimated sunlight refracts through a
wavy water surface and focuses into bright filament networks on the pool
floor.  Each ray contributes one intensity-weighted landing to a fixed
(res x res) irradiance image -- `landing_histogram_fold` accumulates it
IN-SCAN (O(bins) memory however many rays or bounces), and
`trace_streamed` sums the per-block images, so the ray count is bounded
by patience, not HBM.  The Fresnel transmission loss at the surface rides
the "intensity" field (`fresnel_intensity_reaction`) and enters the image
through `weight_field` + `fold_fields=True`.

This is the rendering-flavored workload the reference cannot express at
all: tfrt's analyze.py histograms the *finished slots of one dispatch*
(reference analyze.py:103-106), capping an image at the rays that fit in
memory; here the image IS the accumulator.

On a v5e chip the defaults render a 512x512 image from 2^27 = 134M rays.
Under CI this runs at toy sizes (tests/test_examples.py).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    RaySet, Scene3D, TraceConfig, TriangleSet, landing_histogram_fold,
)
from tensorflowraytrace_tpu.engine import trace_streamed
from tensorflowraytrace_tpu.models import mesh as mt
from tensorflowraytrace_tpu.operations import fresnel_intensity_reaction
from tensorflowraytrace_tpu.ops import materials as mats

N_WATER = 4.0 / 3.0


def water_surface(mesh_steps, amp, dtype):
    """A wavy air->water interface: the hexagonal lattice mesh lifted by a
    sum of three plane waves (incommensurate directions, so the caustic
    network is aperiodic like real chop)."""
    m = mt.hexagonal_mesh(4.6, mesh_steps)
    x, y = m.points[:, 0], m.points[:, 1]
    z = (amp * np.sin(2.6 * x + 0.8 * y + 0.3)
         + 0.75 * amp * np.sin(1.1 * x - 3.1 * y + 1.7)
         + 0.55 * amp * np.sin(4.3 * x + 2.2 * y + 4.0))
    pts = np.stack([x, y, z], axis=1)
    f = m.faces
    return TriangleSet.make(pts[f[:, 0]], pts[f[:, 1]], pts[f[:, 2]],
                            mat_in=1, mat_out=0, dtype=dtype)


def pool_floor(half, depth, dtype):
    return TriangleSet.make(
        [[-half, -half, -depth], [half, half, -depth]],
        [[half, -half, -depth], [-half, half, -depth]],
        [[half, half, -depth], [-half, -half, -depth]], dtype=dtype)


def sun_block(key, block, half_src, dtype):
    """One block of collimated rays: uniform over the square aperture at
    z = +1, travelling straight down, unit intensity."""
    xy = jax.random.uniform(key, (block, 2), dtype, -half_src, half_src)
    p0 = jnp.concatenate([xy, jnp.ones((block, 1), dtype)], axis=1)
    p1 = p0 + jnp.asarray([0.0, 0.0, -1.0], dtype)
    r = RaySet.make(p0, p1, 550.0, dtype=dtype)
    return r.with_field("intensity", jnp.ones((block,), dtype))


def main(n_rays=1 << 27, block=1 << 22, res=512, mesh_steps=144,
         depth=3.0, amp=0.08, blocks_per_dispatch=None, save_png=True):
    dtype = jnp.float32
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if blocks_per_dispatch is None and on_tpu:
        blocks_per_dispatch = 4  # stay far under the runtime watchdog

    surface = water_surface(mesh_steps, amp, dtype)
    half = 3.6
    scene = Scene3D.build(optical=[surface],
                          targets=[pool_floor(half + 1.0, depth, dtype)])
    materials = (mats.vacuum, mats.build_constant_material(N_WATER))
    m = scene.triangles.n_surfaces
    cfg = TraceConfig(max_bounces=2, use_pallas=on_tpu,
                      cull="grid" if on_tpu else None,
                      resort_rays=on_tpu)

    half_src = 3.2
    key = jax.random.PRNGKey(20260818)
    gen = lambda i: sun_block(jax.random.fold_in(key, i), block, half_src,
                              dtype)

    extent = ((-half_src, half_src), (-half_src, half_src))
    init, fn = landing_histogram_fold(extent, res, dtype=jnp.float32,
                                      axes=(0, 1),
                                      weight_field="intensity")
    n_blocks = max(1, n_rays // block)

    t0 = time.time()
    res_s = trace_streamed(
        gen, scene, materials, cfg,
        reaction=fresnel_intensity_reaction(),
        fold_fn=fn, fold_init=init, fold_fields=True,
        block_size=block, n_blocks=n_blocks, remat_blocks=False,
        blocks_per_dispatch=blocks_per_dispatch)
    img = np.asarray(jax.block_until_ready(res_s.fold))
    dt = time.time() - t0
    n = n_blocks * block
    counts = res_s.counts_by_name
    print(f"caustic render: {m} triangles, {n:,} rays -> {res}x{res} image "
          f"in {dt:.2f}s ({n / dt / 1e6:.1f} M rays/s incl. compile)")
    print(f"  landed power {img.sum():,.0f} over "
          f"{int(counts['finished']):,} finished rays "
          f"(mean transmission {img.sum() / max(int(counts['finished']), 1):.4f})")

    # physical sanity: Fresnel transmission at near-normal incidence on
    # water is ~0.98, and caustic focusing conserves power (the histogram
    # just redistributes it), so mean landed weight must sit near T_normal
    t_normal = 1.0 - ((N_WATER - 1.0) / (N_WATER + 1.0)) ** 2
    mean_t = img.sum() / max(int(counts["finished"]), 1)
    assert abs(mean_t - t_normal) < 0.02, (mean_t, t_normal)

    if save_png:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axp = plt.subplots(figsize=(7, 7))
        # gamma-compress: caustic peaks are ~50x the mean irradiance
        axp.imshow(img ** 0.45, origin="lower", cmap="cividis",
                   extent=(-half_src, half_src, -half_src, half_src))
        axp.set_title(f"pool-floor caustics, {n:,} rays")
        axp.set_xlabel("x")
        axp.set_ylabel("y")
        fig.tight_layout()
        fig.savefig("caustic_render.png", dpi=140)
        print("saved caustic_render.png")
    print("OK")
    return img


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-rays", type=int, default=1 << 27)
    ap.add_argument("--block", type=int, default=1 << 22)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--mesh-steps", type=int, default=144)
    a = ap.parse_args()
    main(n_rays=a.n_rays, block=a.block, res=a.res, mesh_steps=a.mesh_steps)
