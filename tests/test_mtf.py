"""MTF tests: the FFT-of-PSF machinery must reproduce textbook
diffraction physics -- the analytic circular-pupil autocorrelation chat
function, the triangle MTF of a slit-aperture (2D) diffraction-limited
lens traced end-to-end -- and stay differentiable so an "MTF at nu"
spec can drive optimization."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu.analysis import mtf_at, mtf_from_psf

from test_psf import LAM, perfect_lens_result, psf_from_result

F64 = jnp.float64


def test_mtf_dc_is_one_and_even():
    rng = np.random.default_rng(7)
    psf = jnp.asarray(rng.random((32, 48)), F64)
    mtf, (fy, fx) = mtf_from_psf(psf, 0.5)
    # DC sits at the fftshift center and is exactly 1
    iy, ix = 32 // 2, 48 // 2
    np.testing.assert_allclose(float(mtf[iy, ix]), 1.0, rtol=1e-12)
    assert float(fy[iy]) == 0.0 and float(fx[ix]) == 0.0
    # the MTF of a real PSF is even: M(-f) = M(f).  On the fftshift'd
    # grid the mirror of index i (about DC) is (-i) % n rolled to center.
    m = np.asarray(mtf)
    flipped = np.roll(np.flip(m), (1, 1), axis=(0, 1))
    np.testing.assert_allclose(m, flipped, rtol=1e-9, atol=1e-12)
    # frequency axes are fftshift'd fftfreq with the given pitch
    np.testing.assert_allclose(
        np.asarray(fx), np.fft.fftshift(np.fft.fftfreq(48, d=0.5)))


def test_circular_pupil_mtf_matches_analytic():
    """PSF = |FFT(circular pupil)|^2, so its MTF must equal the analytic
    normalized autocorrelation of the disk: the chat function
    (2/pi)(acos(s) - s sqrt(1 - s^2)), s = nu / nu_cutoff."""
    n = 512
    f0 = 0.2  # pupil radius in cycles/sample; autocorr support 2*f0 < 0.5
    f = np.fft.fftfreq(n)
    fr = np.hypot(f[:, None], f[None, :])
    pupil = (fr <= f0).astype(np.float64)
    field = np.fft.fft2(pupil)
    psf = jnp.asarray(np.abs(field) ** 2)

    mtf, (fy, fx) = mtf_from_psf(psf, 1.0)
    # compare along the +x cut through DC
    cut = np.asarray(mtf)[n // 2, n // 2:]
    nu = np.asarray(fx)[n // 2:]
    s = np.clip(nu / (2 * f0), 0.0, 1.0)
    chat = (2 / np.pi) * (np.arccos(s) - s * np.sqrt(1 - s * s))
    # pixelated disk edge limits agreement to ~1/(n*f0)
    np.testing.assert_allclose(cut, chat, atol=0.01)
    # physical spacing just rescales the frequency axis
    _, (fy2, _) = mtf_from_psf(psf, 2.0)
    np.testing.assert_allclose(np.asarray(fy2), np.asarray(fy) / 2.0)


def test_perfect_lens_mtf_is_triangle():
    """End to end: rays through the Fermat hyperbola lens -> Huygens PSF
    -> MTF.  A 2D (slit-aperture) diffraction-limited system has the
    triangle MTF 1 - nu/nu_c with nu_c = 2 NA / lambda (in-glass)."""
    res, fl, n_glass, half_ap = perfect_lens_result()
    a = half_ap * 0.98  # traced half-aperture
    nu_c = 2 * n_glass * a / (LAM * fl)
    g = 4001
    w = 0.15  # ~40 sinc^2 lobes: truncation error on the MTF ~1%
    ys = np.linspace(-w, w, g)
    dy = ys[1] - ys[0]
    grid = jnp.asarray(np.stack([np.full_like(ys, fl), ys], axis=1), F64)
    psf = psf_from_result(res, grid, wavelength=LAM)

    nus = jnp.asarray([0.25, 0.5, 0.75]) * nu_c
    vals = np.asarray(mtf_at(psf, dy, nus))
    np.testing.assert_allclose(vals, [0.75, 0.5, 0.25], atol=0.02)
    # and it is essentially zero past the cutoff
    beyond = float(mtf_at(psf, dy, 1.2 * nu_c))
    assert beyond < 0.02


def test_mtf_at_matches_full_grid_cut():
    rng = np.random.default_rng(3)
    # a smooth, decaying synthetic PSF (separable gaussian x airy-ish)
    y = np.linspace(-4, 4, 128)
    x = np.linspace(-4, 4, 160)
    psf = np.exp(-y[:, None] ** 2) * np.exp(-0.5 * x[None, :] ** 2)
    psf = jnp.asarray(psf + 1e-3 * rng.random(psf.shape), F64)
    dx = float(x[1] - x[0])
    dyy = float(y[1] - y[0])
    mtf, (fy, fx) = mtf_from_psf(psf, (dyy, dx))
    # the axis-1 through-DC cut of the full MTF == mtf_at on that axis
    cut = np.asarray(mtf)[128 // 2, :]
    probe = np.asarray(fx)[160 // 2 + 5]
    np.testing.assert_allclose(
        float(mtf_at(psf, (dyy, dx), probe, axis=1)),
        cut[160 // 2 + 5], rtol=1e-9)
    # same for axis 0
    cut0 = np.asarray(mtf)[:, 160 // 2]
    probe0 = np.asarray(fy)[128 // 2 + 7]
    np.testing.assert_allclose(
        float(mtf_at(psf, (dyy, dx), probe0, axis=0)),
        cut0[128 // 2 + 7], rtol=1e-9)


def test_mtf_is_differentiable_spec_objective():
    """d(MTF at nu)/d(defocus) is finite and negative: an MTF spec can
    directly drive a prescription."""
    from tensorflowraytrace_tpu.analysis import huygens_psf

    res, fl, n_glass, half_ap = perfect_lens_result(n_rays=401)
    rays = res.rays
    nu_c = 2 * n_glass * half_ap * 0.98 / (LAM * fl)
    ys = np.linspace(-0.08, 0.08, 801)
    dy = ys[1] - ys[0]
    grid = jnp.asarray(np.stack([np.full_like(ys, fl), ys], axis=1), F64)

    def mtf_mid(delta):
        # quadratic OPL error across the aperture = defocus-like wavefront
        # (the final leg converges IN GLASS: medium_n matters)
        opl = rays.fields["opl"] + delta * rays.p0[:, 1] ** 2
        psf = huygens_psf(rays.p0, opl, LAM, grid, medium_n=n_glass)
        return mtf_at(psf, dy, 0.5 * nu_c)[()]

    g = float(jax.grad(mtf_mid)(jnp.asarray(0.0, F64)))
    assert np.isfinite(g)
    half_wave = LAM / 2 / (half_ap * 0.98) ** 2
    assert float(mtf_mid(jnp.asarray(half_wave, F64))) < float(
        mtf_mid(jnp.asarray(0.0, F64)))


def test_mtf_jits():
    psf = jnp.asarray(np.exp(-np.linspace(-5, 5, 256) ** 2), F64)
    v = jax.jit(lambda p: mtf_at(p, 10 / 255, jnp.asarray([0.5])))(psf)
    full = mtf_at(psf, 10 / 255, jnp.asarray([0.5]))
    np.testing.assert_allclose(np.asarray(v), np.asarray(full))
