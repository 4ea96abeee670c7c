"""float32 robustness of the new optical features.

TPU executes float32; the CPU test suite runs float64 for reference parity.
These tests re-run each new feature's core physics at float32 (on CPU) with
dtype-appropriate tolerances, so a TPU regression would be a backend bug,
not a precision surprise: thin-film stacks (complex64 path), gratings,
metasurfaces, absorption, rough scattering, and the Huygens PSF."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.analysis import huygens_psf
from tensorflowraytrace_tpu.operations import (
    absorption_reaction, final_intensity, grating_reaction,
    hyperbolic_metalens_phase, metasurface_reaction, optical_path_reaction,
    rough_surface_reaction, seed_absorption, seed_optical_path, seed_scatter,
    thin_film_intensity_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops import thinfilm

F32 = jnp.float32
N_GLASS = 1.52


def glass_wall(dtype=F32):
    entry = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=dtype)
    tgt = SegmentSet.make([[4.0, -50.0]], [[4.0, 50.0]], dtype=dtype)
    scene = Scene2D.build(optical_segments=[entry], target_segments=[tgt])
    return scene, (mats.vacuum, mats.build_constant_material(N_GLASS))


def ray(dtype=F32, fields=None):
    import dataclasses

    r = RaySet.make(jnp.zeros((1, 2), dtype),
                    jnp.asarray([[1.0, 0.0]], dtype), 550.0, dtype=dtype)
    if fields:
        r = dataclasses.replace(r, fields={**r.fields, **fields})
    return r


def test_thin_film_f32_complex64_path():
    """The characteristic-matrix stack runs in complex64 at f32 and stays
    within ~1e-5 of the analytic quarter-wave reflectance."""
    nf = 1.38
    d = float(thinfilm.quarter_wave_thickness(nf, 550.0))
    one = jnp.ones(1, F32)
    R = float(thinfilm.stack_R_unpolarized(
        one, N_GLASS * one, one, 550.0 * one,
        jnp.full((1, 1), nf, F32), jnp.full((1, 1), d, F32))[0])
    expect = ((N_GLASS - nf ** 2) / (N_GLASS + nf ** 2)) ** 2
    np.testing.assert_allclose(R, expect, atol=2e-5)

    scene, materials = glass_wall()
    rx = thin_film_intensity_reaction(
        [[(nf, d)]], {"segments": np.asarray([0, -1])})
    res = trace(ray(fields={"intensity": jnp.ones(1, F32)}), scene,
                materials, TraceConfig(max_bounces=2), reaction=rx)
    assert res.rays.fields["intensity"].dtype == F32
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]),
                               1.0 - expect, atol=3e-5)


def test_grating_and_metasurface_f32():
    gr = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=0, mat_out=0,
                         dtype=F32)
    tgt = SegmentSet.make([[3.0, -80.0]], [[3.0, 80.0]], dtype=F32)
    scene = Scene2D.build(optical_segments=[gr], target_segments=[tgt])
    a, m, lam = 2000.0, 1, 550.0
    rx = grating_reaction([(a, m, "transmission")],
                          {"segments": np.asarray([0, -1])})
    res = trace(ray(), scene, (mats.vacuum,), TraceConfig(max_bounces=2),
                reaction=rx)
    s = m * lam / a
    np.testing.assert_allclose(float(res.rays.p1[0, 1]),
                               -2.0 * s / math.sqrt(1 - s * s), rtol=1e-5)

    phase = hyperbolic_metalens_phase(2.0, lam, axis=0, center=(1.0, 0.0))
    rxm = metasurface_reaction([(phase, "transmission")],
                               {"segments": np.asarray([0, -1])})
    ys = np.linspace(-0.8, 0.8, 7)
    p0 = np.stack([np.zeros(7), ys], axis=1)
    rays = RaySet.make(jnp.asarray(p0, F32),
                       jnp.asarray(p0 + [1.0, 0.0], F32), lam, dtype=F32)
    det = SegmentSet.make([[3.0, -80.0]], [[3.0, 80.0]], dtype=F32)
    scene_m = Scene2D.build(optical_segments=[gr], target_segments=[det])
    resm = trace(rays, scene_m, (mats.vacuum,), TraceConfig(max_bounces=2),
                 reaction=rxm)
    assert bool(jnp.all(resm.rays.state == FINISHED))
    # f32 focus: ~1e-6-level angles over distance 2 -> few-micron spot
    np.testing.assert_allclose(np.asarray(resm.rays.p1[:, 1]), 0.0,
                               atol=5e-5)


def test_opl_absorption_rough_f32():
    scene, materials = glass_wall()
    rays = seed_optical_path(ray(fields={"intensity": jnp.ones(1, F32)}))
    rays = seed_absorption(rays, seed_field=False)
    rays = seed_scatter(rays)
    alpha = 0.25
    tables = {"segments": (np.asarray([alpha, 0.0], np.float32),
                           np.asarray([0.0, 0.0], np.float32))}
    rx = absorption_reaction(
        tables, base_reaction=optical_path_reaction(
            base_reaction=rough_surface_reaction(
                [0.0], {"segments": np.asarray([0, -1])},
                jax.random.PRNGKey(0))))
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=rx)
    assert int(res.rays.state[0]) == FINISHED
    for f in ("opl", "cur_n", "cur_alpha", "intensity"):
        assert res.rays.fields[f].dtype == F32
    # the opl field holds the path up to the final leg's START: the
    # 1-unit vacuum leg (the glass leg to the target is not folded in)
    np.testing.assert_allclose(float(res.rays.fields["opl"][0]), 1.0,
                               atol=2e-6)
    np.testing.assert_allclose(float(final_intensity(res.rays)[0]),
                               math.exp(-alpha * 3.0), rtol=1e-5)


def test_huygens_psf_f32():
    """Two-source fringes at f32: the peak and first-null contrast
    survive single precision (phases ~ 2 pi D / lam stay resolvable at
    this scene scale)."""
    s, D, lam = 0.2, 200.0, 0.55e-3
    sources = jnp.asarray([[0.0, -s / 2], [0.0, s / 2]], F32)
    opl = jnp.zeros(2, F32)
    ys = jnp.linspace(-0.6, 0.6, 801, dtype=F32)
    grid = jnp.stack([jnp.full_like(ys, D), ys], axis=1)
    psf = np.asarray(huygens_psf(sources, opl, lam, grid))
    assert psf.dtype == np.float32
    i0 = 400
    np.testing.assert_allclose(psf[i0], 4.0, rtol=1e-3)
    di = int(round(lam * D / s / 2 / (1.2 / 800)))
    assert psf[i0 + di] < 0.05 * psf[i0]
