"""Grating / metasurface diffraction-efficiency hook (VERDICT r3 #6).

The dispersive reactions are geometrically exact but don't solve the
groove/nanostructure electromagnetics; ``efficiencies`` supplies measured
per-order power which the intensity trackers consume exactly once via the
reserved ``__efficiency__`` update.  Pins:

* a multi-order split whose traced powers match the supplied table and sum
  to the table's sum (<= 1),
* callable eta(order, wavelength, cos_i) evaluated per-ray,
* composition: thin-film tracker over an efficient grating multiplies
  (1 - R_stack) * eta once -- and a second stacked tracker does NOT apply
  eta again,
* metasurface efficiency (scalar + callable),
* differentiability of a traced efficiency value.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.operations import (
    fresnel_intensity_reaction, grating_reaction, hyperbolic_metalens_phase,
    metasurface_reaction, optical_path_reaction, seed_optical_path,
    thin_film_intensity_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops import thinfilm

F64 = jnp.float64
LAM = 550.0
A = 2000.0  # groove spacing, nm


def grating_scene(dtype=F64):
    g = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=0, mat_out=0,
                        dtype=dtype)
    tgt = SegmentSet.make([[3.0, -80.0]], [[3.0, 80.0]], dtype=dtype)
    return Scene2D.build(optical_segments=[g], target_segments=[tgt])


def ray(dtype=F64, lam=LAM):
    r = RaySet.make(jnp.zeros((1, 2), dtype),
                    jnp.asarray([[1.0, 0.0]], dtype), lam, dtype=dtype)
    return r.with_field("intensity", jnp.ones(1, dtype))


CFG = TraceConfig(max_bounces=2)
IDS = {"segments": np.asarray([0, -1])}


def test_multi_order_split_matches_table():
    """Trace each order with its table efficiency: per-order power == eta_m
    (the vacuum grating has no Fresnel loss), orders sum to the table sum."""
    scene = grating_scene()
    table = {-1: 0.15, 0: 0.55, 1: 0.22}  # sums to 0.92 <= 1
    powers = {}
    for m, eta in table.items():
        rx = fresnel_intensity_reaction(
            base_reaction=grating_reaction(
                [(A, m, "transmission")], IDS, efficiencies=[eta]))
        res = trace(ray(), scene, (mats.vacuum,), CFG, reaction=rx)
        assert int(res.rays.state[0]) == FINISHED
        powers[m] = float(res.rays.fields["intensity"][0])
        np.testing.assert_allclose(powers[m], eta, rtol=1e-12)
    np.testing.assert_allclose(sum(powers.values()), sum(table.values()),
                               rtol=1e-12)
    assert sum(powers.values()) <= 1.0


def test_callable_efficiency_per_ray():
    """eta(order, wavelength, cos_i): a blaze-like curve evaluated per-ray
    at the actual wavelengths and incidence cosines."""
    scene = grating_scene()

    def eta(order, wavelength, cos_i):
        blaze = 600.0 * order
        return 0.8 * jnp.exp(-((wavelength - blaze) / 200.0) ** 2) * cos_i

    n = 5
    lams = np.linspace(480.0, 620.0, n)
    p0 = np.zeros((n, 2))
    p0[:, 1] = np.linspace(-1.0, 1.0, n)
    rays = RaySet.make(jnp.asarray(p0, F64),
                       jnp.asarray(p0 + [1.0, 0.0], F64),
                       jnp.asarray(lams, F64), dtype=F64).with_field(
        "intensity", jnp.ones(n, F64))
    rx = fresnel_intensity_reaction(
        base_reaction=grating_reaction(
            [(A, 1, "transmission")], IDS, efficiencies=[eta]))
    res = trace(rays, scene, (mats.vacuum,), CFG, reaction=rx)
    # normal incidence: cos_i == 1
    expect = 0.8 * np.exp(-((lams - 600.0) / 200.0) ** 2)
    np.testing.assert_allclose(np.asarray(res.rays.fields["intensity"]),
                               expect, rtol=1e-12)


def test_efficiency_applied_exactly_once_in_composed_stack():
    """OPL over thin-film over an efficient grating: the thin-film tracker
    (innermost intensity tracker) pops __efficiency__; power is
    (1 - R_stack) * eta, not (1 - R) * eta^2."""
    nf = 1.38
    n_glass = 1.52
    d_qw = float(thinfilm.quarter_wave_thickness(nf, LAM))
    # coated glass wall that is ALSO a transmission grating
    g = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1, mat_out=0,
                        dtype=F64)
    tgt = SegmentSet.make([[3.0, -80.0]], [[3.0, 80.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[g], target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))
    eta = 0.6
    rx = optical_path_reaction(
        base_reaction=thin_film_intensity_reaction(
            [[(nf, d_qw)]], {"segments": np.asarray([0, -1])},
            base_reaction=grating_reaction(
                [(A, 1, "transmission")], IDS, efficiencies=[eta])))
    rays = seed_optical_path(ray())
    res = trace(rays, scene, materials, CFG, reaction=rx)
    one = jnp.ones(1, F64)
    R = float(thinfilm.stack_R_unpolarized(
        one, n_glass * one, one, LAM * one,
        jnp.full((1, 1), nf, F64), jnp.full((1, 1), d_qw, F64))[0])
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]),
                               (1.0 - R) * eta, rtol=1e-12)


def test_metasurface_efficiency():
    scene = grating_scene()
    phase = hyperbolic_metalens_phase(2.0, LAM, axis=0, center=(1.0, 0.0))

    # scalar
    rx = fresnel_intensity_reaction(
        base_reaction=metasurface_reaction(
            [(phase, "transmission")], IDS, efficiencies=[0.7]))
    res = trace(ray(), scene, (mats.vacuum,), CFG, reaction=rx)
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]), 0.7,
                               rtol=1e-12)

    # callable eta(wavelength, cos_i): chromatic roll-off
    def eta(wavelength, cos_i):
        return 0.9 - 0.3 * jnp.abs(wavelength - LAM) / LAM * cos_i

    rxc = fresnel_intensity_reaction(
        base_reaction=metasurface_reaction(
            [(phase, "transmission")], IDS, efficiencies=[eta]))
    resc = trace(ray(lam=660.0), scene, (mats.vacuum,), CFG, reaction=rxc)
    np.testing.assert_allclose(float(resc.rays.fields["intensity"][0]),
                               0.9 - 0.3 * 110.0 / LAM, rtol=1e-12)


def test_traced_efficiency_is_differentiable():
    """Efficiency values may be traced: fit an efficiency to a measured
    power (gradient nonzero and finite)."""
    scene = grating_scene()

    def power(eta):
        rx = fresnel_intensity_reaction(
            base_reaction=grating_reaction(
                [(A, 1, "transmission")], IDS, efficiencies=[eta]))
        res = trace(ray(), scene, (mats.vacuum,), CFG, reaction=rx)
        return res.rays.fields["intensity"][0]

    g = jax.grad(power)(jnp.asarray(0.5, F64))
    np.testing.assert_allclose(float(g), 1.0, rtol=1e-12)


def test_unmarked_and_no_efficiency_unchanged():
    """efficiencies=None and unmarked surfaces keep the old geometry-only
    behavior bit-exactly."""
    scene = grating_scene()
    rx0 = fresnel_intensity_reaction(
        base_reaction=grating_reaction([(A, 1, "transmission")], IDS))
    rx1 = fresnel_intensity_reaction(
        base_reaction=grating_reaction([(A, 1, "transmission")], IDS,
                                       efficiencies=[None]))
    r0 = trace(ray(), scene, (mats.vacuum,), CFG, reaction=rx0)
    r1 = trace(ray(), scene, (mats.vacuum,), CFG, reaction=rx1)
    np.testing.assert_array_equal(np.asarray(r0.rays.p1),
                                  np.asarray(r1.rays.p1))
    np.testing.assert_array_equal(
        np.asarray(r0.rays.fields["intensity"]),
        np.asarray(r1.rays.fields["intensity"]))
