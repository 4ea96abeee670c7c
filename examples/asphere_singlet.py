"""Design a biconvex ASPHERE singlet by gradient descent — and show why
aspheres exist: the same optimizer, the same 1500 steps, but freeing the
conic constant and one polynomial term per surface buys an order of
magnitude in spot size over the best possible all-spherical singlet.

Beyond the reference: tfrt's only trainable surfaces are per-vertex
freeform meshes (/root/reference/tfrt/boundaries.py:967-1112), which need
accumulator/smoother conditioning to optimize well.  The even-asphere
builders (``models.boundaries.ParametricAsphereSegment``) expose the
industry-standard few-parameter sag model

    sag(r) = c r^2 / (1 + sqrt(1 - (1+k) c^2 r^2)) + a4 r^4 + ...

so a whole lens is 6 trainable numbers and needs NO conditioning at all.

The demo designs the same f/1.5-ish singlet twice from the same start:

* SPHERE control: only the two curvatures free (k = a4 = 0) — this is the
  best a spherical singlet can do; it stalls on spherical aberration.
* ASPHERE: all six parameters free — the conic + r^4 terms cancel the
  spherical aberration and the spot collapses toward the polyline
  discretization floor.

Run:  python examples/asphere_singlet.py [--steps N]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tensorflowraytrace_tpu import RaySet, Scene2D, SegmentSet, TraceConfig, trace
from tensorflowraytrace_tpu.models.boundaries import ParametricAsphereSegment
from tensorflowraytrace_tpu.ops import materials as mats

N_GLASS = 1.5
SCREEN_X = 2.5          # fixed image plane; focusing there is the loss's job
X_FRONT, X_BACK = 0.0, 0.35
HALF_AP = 0.8           # ray bundle half-aperture (f/~1.5: strong aberration)
SURF_AP = 0.95          # surface half-aperture (everything hits glass)


def build_scene(params, front, back, dtype):
    """params = [c1, k1, a4_1, c2, k2, a4_2] -> 2-surface Scene2D."""
    screen = SegmentSet.make([[SCREEN_X, -3.0]], [[SCREEN_X, 3.0]],
                             dtype=dtype)
    return Scene2D.build(
        optical_segments=[front.build(params[:3]), back.build(params[3:])],
        target_segments=[screen])


def main(steps=1500, resolution=256, n_rays=160, lr=6e-3, verbose=True):
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    materials = (mats.vacuum, mats.build_constant_material(N_GLASS))
    cfg = TraceConfig(max_bounces=3)

    # glass sits on the +x side of the front surface and the -x side of the
    # back one (the entrance-surface material convention of
    # tests/test_asphere.py, mirrored for the exit)
    front = ParametricAsphereSegment(X_FRONT, SURF_AP, resolution=resolution,
                                     n_aspheric=1, mat_in=1, mat_out=0,
                                     dtype=dtype)
    back = ParametricAsphereSegment(X_BACK, SURF_AP, resolution=resolution,
                                    n_aspheric=1, mat_in=0, mat_out=1,
                                    dtype=dtype)

    ray_ys = jnp.linspace(-HALF_AP, HALF_AP, n_rays, dtype=dtype)
    p0 = jnp.stack([jnp.full((n_rays,), -1.0, dtype), ray_ys], axis=1)
    rays = RaySet.make(p0, p0 + jnp.asarray([1.0, 0.0], dtype), 550.0,
                       dtype=dtype)

    def spot_sq(params):
        res = trace(rays, build_scene(params, front, back, dtype),
                    materials, cfg)
        return jnp.mean(res.rays.p1[:, 1] ** 2)

    vag = jax.jit(jax.value_and_grad(spot_sq))

    # biconvex start, paraxially near the screen: 1/f ~ (n-1)(c1 - c2)
    p_init = jnp.asarray([0.42, 0.0, 0.0, -0.42, 0.0, 0.0], dtype)

    def design(mask, label):
        """Gradient-design with the given per-parameter freedom mask."""
        mask = jnp.asarray(mask, dtype)
        tx = optax.adam(optax.cosine_decay_schedule(lr, steps, alpha=1e-2))
        params, state = p_init, tx.init(p_init)
        for i in range(steps):
            v, g = vag(params)
            upd, state = tx.update(g * mask, state)
            params = optax.apply_updates(params, upd)
            if verbose and i % max(1, steps // 6) == 0:
                print(f"  [{label}] step {i:5d}  rms "
                      f"{float(jnp.sqrt(v)):.3e}")
        return params, float(jnp.sqrt(spot_sq(params)))

    rms0 = float(jnp.sqrt(spot_sq(p_init)))
    if verbose:
        print(f"start (symmetric biconvex spheres): rms {rms0:.3e}")

    _, rms_sphere = design([1, 0, 0, 1, 0, 0], "sphere ")
    p_asph, rms_asph = design([1, 1, 1, 1, 1, 1], "asphere")

    gain = rms_sphere / rms_asph
    if verbose:
        print(f"\nbest spherical singlet : rms {rms_sphere:.3e}")
        print(f"asphere singlet        : rms {rms_asph:.3e}")
        print(f"asphere advantage      : {gain:.1f}x")
        print(f"front (c,k,a4) = {np.asarray(p_asph[:3])}")
        print(f"back  (c,k,a4) = {np.asarray(p_asph[3:])}")

    # the sphere control must stall on spherical aberration; the asphere
    # must beat it by a wide margin (the asphere floor is the polyline
    # discretization, so the absolute bar scales with resolution: 7.1x at
    # the CI size resolution=64, 10.6x at resolution=96, more at default)
    assert rms_asph < rms_sphere / 3, (rms_asph, rms_sphere)
    assert rms_asph < rms0 / 5, (rms_asph, rms0)
    return rms_sphere, rms_asph


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--n-rays", type=int, default=160)
    args = ap.parse_args()
    main(steps=args.steps, resolution=args.resolution, n_rays=args.n_rays)
