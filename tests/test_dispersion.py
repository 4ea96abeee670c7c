"""Chromatic dispersion through the full engine: a prism must separate
wavelengths, with shorter wavelengths bent more (higher n in normal
dispersion).  Exercises the index-mode material lookup end-to-end
(reference operation.py:260-272)."""

import math

import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace
from tensorflowraytrace_tpu.ops import materials as mats

PI = math.pi
F64 = jnp.float64


def test_material_curves_normal_dispersion():
    """n decreases with wavelength across the visible for the glasses."""
    wl = jnp.asarray([400.0, 550.0, 700.0], F64)
    for mat in (mats.acrylic, mats.crown_glass, mats.flint_glass,
                mats.fused_silica, mats.polycarbonate, mats.soda_lime):
        n = np.asarray(mat(wl))
        assert n[0] > n[1] > n[2], f"{mat.__name__}: {n}"
        assert 1.3 < n[1] < 1.8, f"{mat.__name__}: implausible n {n[1]}"


def test_material_index_lookup():
    wl = jnp.asarray([500.0, 600.0], F64)
    idx = jnp.asarray([1, 0], jnp.int32)
    n = mats.material_index_lookup([mats.vacuum, mats.acrylic], wl, idx)
    np.testing.assert_allclose(float(n[0]), float(mats.acrylic(wl[0])))
    np.testing.assert_allclose(float(n[1]), 1.0)


def test_material_index_lookup_matches_gather_all_curves():
    """The vectorized select-chain lookup equals an explicit stack+gather for
    every material id over the full curve list (the TPU fast path replaced a
    per-ray take_along_axis; semantics must be unchanged)."""
    curves = [mats.vacuum, mats.acrylic, mats.crown_glass, mats.flint_glass,
              mats.fused_silica, mats.polycarbonate, mats.reflective,
              mats.soda_lime, mats.build_constant_material(1.62)]
    rng = np.random.default_rng(7)
    wl = jnp.asarray(rng.uniform(380.0, 780.0, 257), F64)
    idx = jnp.asarray(rng.integers(0, len(curves), 257), jnp.int32)
    got = mats.material_index_lookup(curves, wl, idx)
    want = jnp.stack([m(wl) for m in curves], 0)[idx, jnp.arange(wl.shape[0])]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0)


def test_prism_separates_wavelengths():
    """Rays of different wavelengths through a tilted glass interface land at
    different heights, ordered by refractive index."""
    # tilted interface at 30 degrees from vertical, glass behind
    c, s = math.cos(PI / 3), math.sin(PI / 3)
    interface = SegmentSet.make([[-5 * c, -5 * s]], [[5 * c, 5 * s]],
                                mat_in=1, mat_out=0, dtype=F64)
    target = SegmentSet.make([[20.0, -50.0]], [[20.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[interface],
                          target_segments=[target])

    wavelengths = [400.0, 550.0, 700.0]
    n = len(wavelengths)
    rays = RaySet.make(
        jnp.tile(jnp.asarray([[-2.0, 1.0]], F64), (n, 1)),
        jnp.tile(jnp.asarray([[-1.0, 1.0]], F64), (n, 1)),
        jnp.asarray(wavelengths, F64), dtype=F64)

    res = trace(rays, scene, (mats.vacuum, mats.flint_glass),
                TraceConfig(max_bounces=2))
    assert bool(jnp.all(res.rays.state == FINISHED))
    y = np.asarray(res.rays.p1[:, 1])
    # all three wavelengths land at distinct heights, monotone in wavelength
    assert (np.diff(y) > 1e-4).all() or (np.diff(y) < -1e-4).all(), y
    # blue (400nm, highest n) is bent the most toward the interface normal
    n400 = float(mats.flint_glass(jnp.asarray(400.0, F64)))
    n700 = float(mats.flint_glass(jnp.asarray(700.0, F64)))
    assert n400 > n700


def test_material_index_lookup_out_of_range_is_nan():
    """Ids outside the material list must fail loud (NaN -> the ray dies at
    the engine's finite-child backstop), not silently act as materials[0]."""
    wl = jnp.asarray([550.0, 550.0, 550.0], F64)
    idx = jnp.asarray([0, 2, -1], jnp.int32)
    n = mats.material_index_lookup([mats.vacuum, mats.acrylic], wl, idx)
    assert float(n[0]) == 1.0
    assert np.isnan(float(n[1]))
    assert np.isnan(float(n[2]))
