"""Design a lens by maximizing the Strehl ratio of its diffraction PSF.

Beyond the reference (tfrt has only geometric spot losses): with the
Huygens-Fresnel PSF (`analysis.huygens_psf`) the merit function can be the
on-axis PSF peak itself -- the coherent sum of every ray's wavelet at the
focus.  Maximizing it drives all rays to arrive IN PHASE (equal OPL modulo
the wavelength): the physical-optics statement of perfect imaging.

A coherent peak is only informative within about a wave of the optimum, so
the optimization anneals the wavelength: it starts at a synthetic 100x
wavelength (where the sphere's tens-of-microns of spherical aberration are
sub-wave and the peak has gradient signal), then tightens 10x per stage
down to the real 550 nm.  Starting from a SPHERICAL surface (strong
spherical aberration, Strehl ~ 0), the vertex sags converge to a
diffraction-limited surface (Strehl > 0.8 at the design wavelength).

Run:  python examples/strehl_lens.py [--steps N]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tensorflowraytrace_tpu import RaySet, Scene2D, SegmentSet, TraceConfig, trace
from tensorflowraytrace_tpu.analysis import huygens_psf
from tensorflowraytrace_tpu.operations import (
    optical_path_reaction, seed_optical_path,
)
from tensorflowraytrace_tpu.ops import materials as mats

N_GLASS = 1.5
FOCUS = 3.0
HALF_AP = 0.6
X_LAUNCH = -2.0
LAM = 0.55e-3  # 550 nm in the example's mm-scale units


def sphere_x(y, f=FOCUS, n=N_GLASS):
    """Paraxial sphere: R = f (n - 1) / n focuses at f to first order but
    carries strong spherical aberration at this aperture."""
    r = f * (n - 1.0) / n
    return r - np.sqrt(np.maximum(r * r - y * y, 0.0))


def hyperbola_x(y, f=FOCUS, n=N_GLASS):
    a = 1.0 - 1.0 / n ** 2
    b = -2.0 * f * (1.0 - 1.0 / n)
    return (-b - np.sqrt(b * b - 4 * a * y ** 2)) / (2 * a)


def main(steps=300, n_segments=48, n_rays=128):
    dtype = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    materials = (mats.vacuum, mats.build_constant_material(N_GLASS))
    cfg = TraceConfig(max_bounces=2)
    reaction = optical_path_reaction()

    ys_v = jnp.linspace(-1.15 * HALF_AP, 1.15 * HALF_AP, n_segments + 1,
                        dtype=dtype)
    ray_ys = jnp.linspace(-HALF_AP, HALF_AP, n_rays, dtype=dtype)
    p0 = jnp.stack([jnp.full((n_rays,), X_LAUNCH, dtype), ray_ys], axis=1)
    rays = seed_optical_path(
        RaySet.make(p0, p0 + jnp.asarray([1.0, 0.0], dtype), 550.0,
                    dtype=dtype))
    target = SegmentSet.make([[FOCUS, -3.0]], [[FOCUS, 3.0]], dtype=dtype)
    grid = jnp.asarray([[FOCUS, 0.0]], dtype)

    def build(xs):
        verts = jnp.stack([xs, ys_v], axis=1)
        surf = SegmentSet.make(verts[:-1], verts[1:], mat_in=1, mat_out=0,
                               dtype=dtype)
        return Scene2D.build(optical_segments=[surf],
                             target_segments=[target])

    def strehl(xs, lam):
        res = trace(rays, build(xs), materials, cfg, reaction=reaction)
        # wavelets at each ray's final refraction point; rays that failed
        # to finish (missed the surface/target during a wild optimization
        # step) are masked out rather than contributing stale positions.
        # The ideal peak is (sum of amplitudes)^2.
        amp = (res.rays.state == 1).astype(xs.dtype)
        peak = huygens_psf(res.rays.p0, res.rays.fields["opl"], lam, grid,
                           amplitudes=amp, medium_n=N_GLASS)[0]
        return peak / jnp.maximum(jnp.sum(amp), 1.0) ** 2

    xs = jnp.asarray(sphere_x(np.asarray(ys_v)), dtype)
    s0 = float(strehl(xs, LAM))

    for stage, lam in enumerate([100 * LAM, 10 * LAM, LAM]):
        # the coherent peak only has signal within ~a wave: the step size
        # must stay well under the CURRENT stage's wavelength (a 2e-3 mm
        # step is ~2 waves of OPL at 550 nm and scrambles the phase)
        tx = optax.adam(0.2 * float(lam))
        state = tx.init(xs)
        vg = jax.jit(jax.value_and_grad(lambda q: -strehl(q, lam)))

        @jax.jit
        def step(q, st):
            v, g = vg(q)
            upd, st = tx.update(g, st, q)
            return optax.apply_updates(q, upd), st, -v

        for i in range(steps):
            xs, state, s = step(xs, state)
        print(f"  stage {stage} (lambda x{10 ** (2 - stage)}): "
              f"Strehl at this lambda = {float(s):.4f}")

    s1 = float(strehl(xs, LAM))
    # the analytic hyperbola is the physical optimum; polyline chords cost
    # a little wavefront error, so compare against ITS discretized Strehl
    s_hyp = float(strehl(jnp.asarray(hyperbola_x(np.asarray(ys_v)), dtype),
                         LAM))
    print(f"Strehl at 550 nm: spherical start {s0:.2e} -> optimized "
          f"{s1:.3f} (discretized analytic hyperbola: {s_hyp:.3f})")
    assert s1 > 0.8 * s_hyp and s1 > 0.5
    print("OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    a = ap.parse_args()
    main(steps=a.steps)
