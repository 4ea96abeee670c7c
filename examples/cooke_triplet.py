"""Gradient-design a Cooke triplet with the ANALYTIC sequential tracer.

The classical lens-design workflow (reference anchor: the ordered
multi-surface optimization of /root/reference/dev/simple_3d_optimize.py,
but done the way every production lens-design code does it): a known
ordered stack of rotationally symmetric surfaces on a common axis, traced
sequentially and analytically (``trace_sequential``) -- no meshes, no
search, machine-precision hits, exact derivatives through the whole
prescription.

The Cooke triplet (crown - flint - crown, 1893) is the textbook minimal
anastigmat: six curvatures are enough degrees of freedom to correct the
five Seidel aberrations plus axial color.  Here all six curvatures are
optimized at THREE Fraunhofer lines (F 486.1 nm, d 587.6 nm, C 656.3 nm)
through REAL dispersive glass models (crown_glass / flint_glass,
ops/materials.py) over three field angles, with a centroid-relative RMS
spot objective on a fixed image plane -- polychromatic, multi-field spot
optimization, the classical inner loop.

On TPU this whole design step is a single fused XLA program: a lax.scan
over 6 surfaces of pure elementwise math on all rays x wavelengths x
fields at once, plus the backward pass.

Run:  python examples/cooke_triplet.py [--steps N]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tensorflowraytrace_tpu import (
    AsphereStack, collimated_bundle, trace_sequential,
)
from tensorflowraytrace_tpu.ops import materials as mats

MATERIALS = (mats.vacuum, mats.crown_glass, mats.flint_glass)
MAT_AFTER = [1, 0, 2, 0, 1, 0]      # crown | air | flint | air | crown | air

# axial layout (fixed; curvatures are the trainable prescription)
VERTEX_Z = [0.0, 0.55, 1.45, 1.85, 2.75, 3.15]
IMAGE_Z = 11.5
HALF_AP = 0.62                      # entrance bundle half-aperture
APERTURES = [1.0, 1.0, 0.75, 0.75, 1.0, 1.0]  # flint is the (smaller) stop

WAVELENGTHS = (486.1, 587.6, 656.3)            # F, d, C lines
FIELDS = (0.0, 0.03, 0.05)                     # radians off-axis

# a plausible symmetric-triplet start: positive crowns bracketing a
# negative flint (the optimizer does the real design work from here)
P_INIT = np.asarray([0.32, -0.04, -0.30, 0.30, 0.04, -0.32])


def build_stack(curvatures, dtype):
    return AsphereStack.make(
        vertex_z=jnp.asarray(VERTEX_Z, dtype), c=curvatures,
        aperture=jnp.asarray(APERTURES, dtype),
        mat_after=MAT_AFTER, dtype=dtype)


def make_bundles(n_rays, dtype):
    """All wavelengths x fields x pupil rays as ONE flat ray batch, plus
    a (n_bundles, n_rays) index map for per-bundle spot statistics."""
    ps, ds, wls = [], [], []
    for wl in WAVELENGTHS:
        for th in FIELDS:
            p, d = collimated_bundle(n_rays, HALF_AP, z_start=-1.0,
                                     field_angle=th, grid="hex", dtype=dtype)
            ps.append(p)
            ds.append(d)
            wls.append(jnp.full((n_rays,), wl, dtype))
    return (jnp.concatenate(ps), jnp.concatenate(ds), jnp.concatenate(wls),
            len(WAVELENGTHS) * len(FIELDS), n_rays)


def spot_loss(curvatures, bundles, dtype):
    """Mean centroid-relative squared transverse landing radius, per
    bundle (so focus position and distortion are free but blur is not),
    plus a vignetting penalty that keeps rays through the apertures."""
    p, d, wl, n_bundles, n_rays = bundles
    stack = build_stack(curvatures, dtype)
    res = trace_sequential(p, d, wl, stack, MATERIALS, image_z=IMAGE_Z)
    land = res.landing.reshape(n_bundles, n_rays, 2)
    alive = res.alive.reshape(n_bundles, n_rays)
    w = alive.astype(dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    centroid = jnp.sum(land * w[:, :, None], axis=1, keepdims=True) / \
        cnt[:, :, None]
    r2 = jnp.sum((land - centroid) ** 2, axis=2)
    spot = jnp.sum(jnp.where(alive, r2, 0.0)) / jnp.sum(cnt)
    lost = jnp.mean(1.0 - w)
    return spot + 10.0 * lost * lost, (spot, alive)


def rms_report(curvatures, bundles, dtype):
    """Per-(line, field) centroid-relative RMS spot radii, microns-ish
    (layout units x 1e3 for readability)."""
    p, d, wl, n_bundles, n_rays = bundles
    stack = build_stack(curvatures, dtype)
    res = trace_sequential(p, d, wl, stack, MATERIALS, image_z=IMAGE_Z)
    land = np.asarray(res.landing).reshape(n_bundles, n_rays, 2)
    alive = np.asarray(res.alive).reshape(n_bundles, n_rays)
    out = {}
    i = 0
    for wlv in WAVELENGTHS:
        for th in FIELDS:
            pts = land[i][alive[i]]
            c = pts.mean(0)
            out[(wlv, th)] = float(np.sqrt(((pts - c) ** 2).sum(1).mean()))
            i += 1
    return out


def main(steps=2000, n_rays=48, lr=2e-3, verbose=True):
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    bundles = make_bundles(n_rays, dtype)

    vag = jax.jit(jax.value_and_grad(
        lambda c: spot_loss(c, bundles, dtype)[0]))

    params = jnp.asarray(P_INIT, dtype)
    tx = optax.adam(optax.cosine_decay_schedule(lr, max(steps, 1),
                                                alpha=3e-2))
    state = tx.init(params)

    start = rms_report(params, bundles, dtype)
    rms0 = float(np.mean(list(start.values())))
    if verbose:
        print(f"start: mean RMS spot {rms0 * 1e3:.2f} mum "
              f"(per 1e-3 layout units)")
    v0 = None
    for i in range(steps):
        v, g = vag(params)
        if v0 is None:
            v0 = float(v)
        upd, state = tx.update(g, state)
        params = optax.apply_updates(params, upd)
        if verbose and steps > 1 and i % max(1, steps // 8) == 0:
            print(f"  step {i:5d}  loss {float(v):.3e}")

    final = rms_report(params, bundles, dtype)
    rms1 = float(np.mean(list(final.values())))
    if verbose:
        print(f"designed prescription (curvatures): "
              f"{np.round(np.asarray(params), 4)}")
        print("per-line, per-field RMS spots (x 1e-3 units):")
        for th in FIELDS:
            row = "  field {:4.2f}: ".format(th) + "  ".join(
                f"{wl:.0f}nm {final[(wl, th)] * 1e3:7.2f}"
                for wl in WAVELENGTHS)
            print(row)
        print(f"final: mean RMS spot {rms1 * 1e3:.2f} "
              f"(was {rms0 * 1e3:.2f}) -> {rms0 / max(rms1, 1e-12):.1f}x")
    if steps >= 200:
        assert rms1 < 0.5 * rms0, (rms0, rms1)
    return params, rms0, rms1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n_rays", type=int, default=48)
    args = ap.parse_args()
    main(steps=args.steps, n_rays=args.n_rays)
