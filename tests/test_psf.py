"""Huygens-Fresnel PSF tests: the coherent wavelet sum over traced rays
must reproduce scalar-diffraction physics -- two-source fringes, the
slit-diffraction width of a perfect (Fermat hyperbola) lens, Strehl loss
under defocus -- and stay differentiable for diffraction-aware objectives."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.analysis import huygens_psf, psf_from_result
from tensorflowraytrace_tpu.operations import (
    optical_path_reaction, seed_optical_path,
)
from tensorflowraytrace_tpu.ops import materials as mats

F64 = jnp.float64
LAM = 0.55e-3  # 550 nm in mm units (scene scale ~mm)


def test_two_wavelet_interference_fringes():
    """Two equal-OPL coherent sources separated by s produce cos^2 fringes
    on a far screen with period lam D / s."""
    s = 0.2
    D = 200.0
    sources = jnp.asarray([[0.0, -s / 2], [0.0, s / 2]], F64)
    opl = jnp.zeros(2, F64)
    ys = jnp.linspace(-1.5, 1.5, 2001, dtype=F64)
    grid = jnp.stack([jnp.full_like(ys, D), ys], axis=1)
    psf = np.asarray(huygens_psf(sources, opl, LAM, grid))
    period = LAM * D / s
    # central maximum at y=0, first minimum at period/2
    i0 = 1000
    np.testing.assert_allclose(psf[i0], 4.0, rtol=1e-6)  # coherent 2^2
    di = int(round(period / 2 / (3.0 / 2000)))
    assert psf[i0 + di] < 0.01 * psf[i0]
    # fringe period: next maximum one full period away
    assert psf[i0 + 2 * di] > 0.9 * psf[i0]


def hyperbola_x(y, f, n):
    a = 1.0 - 1.0 / n ** 2
    b = -2.0 * f * (1.0 - 1.0 / n)
    return (-b - np.sqrt(b * b - 4 * a * y ** 2)) / (2 * a)


def perfect_lens_result(f=20.0, n_glass=1.5, half_ap=1.0, n_rays=801):
    ys = np.linspace(-half_ap, half_ap, n_rays + 1)
    xs = hyperbola_x(ys, f, n_glass)
    surf = SegmentSet.make(np.stack([xs[:-1], ys[:-1]], axis=1),
                           np.stack([xs[1:], ys[1:]], axis=1),
                           mat_in=1, mat_out=0, dtype=F64)
    tgt = SegmentSet.make([[f - 1.0, -50.0]], [[f - 1.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[surf], target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))
    ry = np.linspace(-half_ap * 0.98, half_ap * 0.98, n_rays)
    p0 = np.stack([np.full(n_rays, -1.0), ry], axis=1)
    rays = seed_optical_path(
        RaySet.make(jnp.asarray(p0, F64),
                    jnp.asarray(p0 + [1.0, 0.0], F64), 550.0, dtype=F64))
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=optical_path_reaction())
    assert bool(jnp.all(res.rays.state == FINISHED))
    return res, f, n_glass, half_ap


def test_perfect_lens_diffraction_limited_psf():
    """The Fermat hyperbola focuses all rays with EQUAL OPL, so the Huygens
    PSF at the focus is diffraction-limited: a slit-aperture pattern whose
    first zero sits at lam f / (n D) from the axis (in-glass wavelength)."""
    res, f, n_glass, half_ap = perfect_lens_result()
    ys = np.linspace(-0.02, 0.02, 1601)
    grid = jnp.asarray(np.stack([np.full_like(ys, f), ys], axis=1), F64)
    psf = np.asarray(psf_from_result(res, grid, wavelength=LAM))
    i0 = 800
    assert np.argmax(psf) == i0
    # first zero of the slit pattern: y = lam f / (n D), D = full aperture
    y_zero = LAM * f / (n_glass * 2 * half_ap * 0.98)
    izero = i0 + int(round(y_zero / (0.04 / 1600)))
    window = psf[izero - 2: izero + 3]
    assert window.min() < 3e-3 * psf[i0]
    # and the pattern is symmetric
    np.testing.assert_allclose(psf[i0 + 100], psf[i0 - 100], rtol=1e-6)


def test_defocus_reduces_peak():
    """The on-axis peak (Strehl) drops away from the focal plane."""
    res, f, n_glass, _ = perfect_lens_result(n_rays=401)

    def peak(plane_x):
        grid = jnp.asarray([[plane_x, 0.0]], F64)
        return float(psf_from_result(res, grid, wavelength=LAM)[0])

    at_focus = peak(f)
    # ~1.6 waves of defocus at the marginal ray: deep Strehl loss
    defocus = peak(f + 0.5)
    assert defocus < 0.3 * at_focus


def test_psf_is_differentiable_strehl_objective():
    """d(on-axis PSF)/d(opl perturbation) is finite: the Strehl ratio can
    directly drive optimization."""
    res, f, _, _ = perfect_lens_result(n_rays=101)
    grid = jnp.asarray([[f, 0.0]], F64)
    rays = res.rays

    def strehl(delta):
        opl = rays.fields["opl"] + delta * jnp.arange(rays.n_rays) ** 2
        return huygens_psf(rays.p0, opl, LAM, grid)[0]

    g = float(jax.grad(strehl)(jnp.asarray(0.0, F64)))
    assert np.isfinite(g)
    # a quadratic OPL error (defocus) lowers the peak from its maximum
    assert float(strehl(jnp.asarray(1e-7, F64))) < float(
        strehl(jnp.asarray(0.0, F64)))


def test_ray_chunked_psf_matches_dense():
    """ray_chunk evaluates the identical sum in lax.scan blocks (memory-
    bounded at production ray counts) -- values and gradients match the
    dense path."""
    rng = np.random.default_rng(11)
    n = 96
    sources = jnp.asarray(rng.normal(size=(n, 2)), F64)
    opl = jnp.asarray(rng.uniform(5.0, 5.001, n), F64)
    amps = jnp.asarray(rng.uniform(0.5, 1.0, n), F64)
    ys = jnp.linspace(-0.3, 0.3, 17, dtype=F64)
    grid = jnp.stack([jnp.full_like(ys, 30.0), ys], axis=1)

    dense = huygens_psf(sources, opl, LAM, grid, amplitudes=amps)
    chunked = huygens_psf(sources, opl, LAM, grid, amplitudes=amps,
                          ray_chunk=16)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                               rtol=1e-12)

    g_dense = jax.grad(lambda o: huygens_psf(
        sources, o, LAM, grid, amplitudes=amps)[8])(opl)
    g_chunk = jax.grad(lambda o: huygens_psf(
        sources, o, LAM, grid, amplitudes=amps, ray_chunk=32)[8])(opl)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_dense),
                               rtol=1e-10)

    # non-divisible counts are padded with zero-amplitude wavelets
    padded = huygens_psf(sources, opl, LAM, grid, amplitudes=amps,
                         ray_chunk=7)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(dense),
                               rtol=1e-12)


def test_polychromatic_psf_is_incoherent_sum():
    """Two wavelengths through the perfect lens: the polychromatic PSF is
    exactly the weighted sum of the per-wavelength coherent PSFs (no
    cross-wavelength interference), and broader than either alone when
    their monochromatic patterns differ."""
    from tensorflowraytrace_tpu.analysis import polychromatic_psf

    f, n_glass, half_ap, n_rays = 20.0, 1.5, 1.0, 200
    ys = np.linspace(-half_ap, half_ap, n_rays + 1)
    xs = hyperbola_x(ys, f, n_glass)
    surf = SegmentSet.make(np.stack([xs[:-1], ys[:-1]], axis=1),
                           np.stack([xs[1:], ys[1:]], axis=1),
                           mat_in=1, mat_out=0, dtype=F64)
    tgt = SegmentSet.make([[f - 1.0, -50.0]], [[f - 1.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[surf], target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(n_glass))
    ry = np.linspace(-half_ap * 0.9, half_ap * 0.9, n_rays)
    p0 = np.stack([np.full(n_rays, -1.0), ry], axis=1)
    wl = np.where(np.arange(n_rays) % 2 == 0, 450.0, 650.0)
    rays = seed_optical_path(
        RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p0 + [1.0, 0.0], F64),
                    jnp.asarray(wl, F64), dtype=F64))
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=optical_path_reaction())
    assert bool(jnp.all(res.rays.state == FINISHED))

    ys_g = np.linspace(-0.01, 0.01, 401)
    grid = jnp.asarray(np.stack([np.full_like(ys_g, f), ys_g], axis=1), F64)
    scale = 1e-6  # nm -> mm-scale scene units
    poly = np.asarray(polychromatic_psf(res, grid, [450.0, 650.0], scale,
                                        weights=[0.4, 0.6]))

    # manual per-wavelength sum with masked amplitudes
    manual = np.zeros_like(poly)
    for wl_nm, w in ((450.0, 0.4), (650.0, 0.6)):
        amp = jnp.asarray((wl == wl_nm).astype(np.float64))
        manual += w * np.asarray(huygens_psf(
            res.rays.p0, res.rays.fields["opl"], wl_nm * scale, grid,
            amplitudes=amp, medium_n=n_glass))
    np.testing.assert_allclose(poly, manual, rtol=1e-10)
    assert poly[200] == poly.max()  # peak on axis


def test_encircled_energy_main_lobe():
    """The perfect lens's slit-diffraction PSF holds the textbook ~90.3%
    of its energy inside the first zero (1D sinc^2 main-lobe fraction)."""
    from tensorflowraytrace_tpu.analysis import encircled_energy

    res, f, n_glass, half_ap = perfect_lens_result()
    ys = np.linspace(-0.02, 0.02, 3201)
    grid = jnp.asarray(np.stack([np.full_like(ys, f), ys], axis=1), F64)
    psf = psf_from_result(res, grid, wavelength=LAM)
    y_zero = LAM * f / (n_glass * 2 * half_ap * 0.98)
    ee = encircled_energy(psf, grid, jnp.asarray([f, 0.0], F64),
                          [y_zero, 3 * y_zero])
    # sinc^2 main lobe carries 90.3% of the total energy; the window here
    # only spans +-14 zeros so the denominator slightly underestimates
    np.testing.assert_allclose(float(ee[0]), 0.903, atol=0.02)
    assert float(ee[1]) > float(ee[0])

    g = jax.grad(lambda o: encircled_energy(
        huygens_psf(res.rays.p0, o, LAM, grid), grid,
        jnp.asarray([f, 0.0], F64), [y_zero])[0])(res.rays.fields["opl"])
    assert np.all(np.isfinite(np.asarray(g)))


def test_polychromatic_psf_chunked_matches_dense():
    """The grouped ray-chunked path (one scan, (G, K) carry) equals the
    dense one-dispatch evaluation exactly, including a ragged tail."""
    from tensorflowraytrace_tpu.analysis import polychromatic_psf

    res, f, n_glass, half_ap = perfect_lens_result()
    ys_g = np.linspace(-0.01, 0.01, 101)
    grid = jnp.asarray(np.stack([np.full_like(ys_g, f), ys_g], axis=1), F64)
    scale = 1e-6
    lines = [550.0]
    dense = np.asarray(polychromatic_psf(res, grid, lines, scale))
    chunk = np.asarray(polychromatic_psf(res, grid, lines, scale,
                                         ray_chunk=37))
    # blockwise summation reorders the adds; 1e-8 is pure rounding room
    np.testing.assert_allclose(chunk, dense, rtol=1e-8,
                               atol=1e-10 * dense.max())
