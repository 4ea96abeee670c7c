"""f32 exact-float NaN-gradient hardening of every guarded sqrt/cdiv site.

TPU executes float32, and round 3's recurring defect class was f32 NaN
gradients at critical/grazing incidence (VERDICT r3 weak #2).  The f64
two-knob ULP-lattice search of tests/test_polarization.py is ported here to
float32 -- the TPU dtype -- and swept over every clamp site the r3 physics
added:

* ``operations._fresnel_prelude`` radicand -> ``fresnel_intensity_reaction``
  (cos_t = sqrt(max(radicand, eps^2)) at exactly-critical incidence),
* ``jones_polarization_reaction`` (double-where'd sqrt pair a/b + the
  transmission radicands),
* ``ops.thinfilm.layer_cosine``'s +i eps^2 branch-point guard inside
  ``stack_r`` (substrate AND layer criticality),
* ``operations._tangential_child``'s clamped sqrt at grazing emergence
  (grating / metasurface child construction).

The search principle: one f32 ULP of the index knob moves the radicand by
~1.7 ULPs of 1.0, so it can straddle zero forever; a second sub-lattice knob
(a tiny ray tilt / an index offset) reshuffles the lattice offset until the
radicand lands on exactly 0.0.  Each found point then gets a jax.grad
finiteness assertion.  Benign-point central-difference gradchecks per
feature close the loop (the clamps must not merely be finite, they must
still be the right derivative away from the corner).

Reference analog: the safe-divide discipline of geometry.py:44-52 -- the
reference never needed the f32 version because it runs strictly float64
(engine.py:23).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu import RaySet, TraceConfig
from tensorflowraytrace_tpu.engine import Projection
from tensorflowraytrace_tpu.operations import (
    _fresnel_prelude, fresnel_intensity_reaction, grating_reaction,
    jones_polarization_reaction, seed_polarization,
)
from tensorflowraytrace_tpu.ops import thinfilm

F32 = jnp.float32
CFG = TraceConfig(max_bounces=1)
SQ3_2 = math.sqrt(3.0) / 2.0


def make_proj3d(n_in, ny, n_out=1.0, dtype=F32):
    """One 3D ray at incidence cos_i ~ 1/2 against a tilted plane; ``ny``
    tilts the ray direction sub-ULP to slide the radicand lattice."""
    p0 = jnp.zeros((1, 3), dtype)
    end = jnp.asarray([[1.0, ny, 0.0]], dtype)
    rays = RaySet.make(p0, end, 550.0, dtype=dtype)
    proj = Projection(
        hit_valid=jnp.ones(1, bool), point=end,
        norm=jnp.asarray([[0.5, SQ3_2, 0.0]], dtype),
        n_in=jnp.asarray([n_in], dtype), n_out=jnp.asarray([n_out], dtype),
        category=jnp.zeros(1, jnp.int32), surf_idx=jnp.zeros(1, jnp.int32),
        kind=jnp.zeros(1, jnp.int32), extras={}, dim=3)
    return proj, rays


def hunt_critical_n():
    """Two-knob f32 lattice search for an (n_in, ny) whose _fresnel_prelude
    radicand is exactly 0.0.  Returns (n_in, ny) or None."""
    base = 2.0 / math.sqrt(3.0)  # analytic critical index for cos_i = 1/2
    for j in range(300):
        # each j slides the radicand lattice by ~1/3 of its ULP(1.0) grain
        # (d rad/d cos_i ~ 1.33; 3e-8 * 0.866 * 1.33 ~ 3.5e-8 ~ 0.3 ULP)
        ny = j * 3e-8
        x = np.float32(base)
        for _ in range(16):
            proj, rays = make_proj3d(float(x), ny)
            rad = float(_fresnel_prelude(proj, rays)[7][0])
            if rad == 0.0:
                return float(x), ny
            # one f32 ULP of n_in moves the radicand ~1.7 ULP(1.0)
            x = np.nextafter(x, np.float32(2.0) if rad > 0
                             else np.float32(1.0))
    return None


@pytest.fixture(scope="module")
def critical_point():
    found = hunt_critical_n()
    if found is None:
        pytest.skip("f32 lattice near critical index misses exact 0")
    return found


def test_found_point_is_exactly_critical(critical_point):
    n_crit, ny = critical_point
    proj, rays = make_proj3d(n_crit, ny)
    pre = _fresnel_prelude(proj, rays)
    assert float(pre[7][0]) == 0.0        # radicand
    assert not bool(pre[8][0])            # not TIR: the refract branch


def test_intensity_exact_critical_f32(critical_point):
    """radicand == 0.0 lands on the SELECTED refract branch of
    fresnel_intensity_reaction's cos_t = sqrt(max(radicand, eps^2)); the
    eps^2 clamp must keep the n_in gradient finite in f32."""
    n_crit, ny = critical_point

    def loss(n_in):
        proj, rays = make_proj3d(n_in, ny)
        rays = rays.with_field("intensity", jnp.ones(1, F32))
        _, _, upd = fresnel_intensity_reaction()(proj, rays, CFG)
        return jnp.sum(upd["intensity"])

    v, g = jax.value_and_grad(loss)(jnp.asarray(n_crit, F32))
    assert np.isfinite(float(v))
    assert np.isfinite(float(g)), f"intensity grad at exact critical = {g}"


def test_jones_exact_critical_f32(critical_point):
    """The Jones reaction's double-where'd sqrt pair (a, b) plus the ts/tp
    transmission radicands all see radicand == 0 here; every clamp must
    hold in f32."""
    n_crit, ny = critical_point

    def loss(n_in):
        proj, rays = make_proj3d(n_in, ny)
        rays = seed_polarization(rays)
        _, _, upd = jones_polarization_reaction()(proj, rays, CFG)
        return sum(jnp.sum(v) for k, v in upd.items()
                   if k.startswith(("es_", "ep_")))

    v, g = jax.value_and_grad(loss)(jnp.asarray(n_crit, F32))
    assert np.isfinite(float(v))
    assert np.isfinite(float(g)), f"jones grad at exact critical = {g}"


def test_thinfilm_jones_exact_critical_f32(critical_point):
    """The coated Jones transport at EXACT critical incidence: both its
    bare path (the double-where'd a/b pair) and its stack path
    (layer_cosine's +i eps^2 branch-point guard inside stack_rt) sit on
    the radicand == 0 lattice point; gradients w.r.t. n_in AND the coating
    thickness must stay finite in f32."""
    from tensorflowraytrace_tpu.operations import thin_film_jones_reaction

    n_crit, ny = critical_point
    d_qw = float(thinfilm.quarter_wave_thickness(N_COAT, 550.0))

    def loss(n_in, d_coat):
        proj, rays = make_proj3d(n_in, ny)
        rays = seed_polarization(rays)
        rx = thin_film_jones_reaction(
            [[(N_COAT, d_coat)]], {"triangles": np.asarray([0])})
        _, _, upd = rx(proj, rays, CFG)
        return sum(jnp.sum(v) for k, v in upd.items()
                   if k.startswith(("es_", "ep_")))

    (v, (g_n, g_d)) = jax.value_and_grad(loss, argnums=(0, 1))(
        jnp.asarray(n_crit, F32), jnp.asarray(d_qw, F32))
    assert np.isfinite(float(v))
    assert np.isfinite(float(g_n)), f"tf-jones d/dn at exact critical = {g_n}"
    assert np.isfinite(float(g_d)), f"tf-jones d/dd at exact critical = {g_d}"


# ----------------------------------------------------------------------
# thin-film stack_r: layer_cosine's +i eps^2 branch-point guard
# ----------------------------------------------------------------------

N_GLASS = 1.52
N_COAT = 1.38


def _cos_arg_f32(cos0, n0, n_layer):
    """Replicate layer_cosine's real radicand arithmetic op-for-op in
    np.float32: sin2 = (1 - cos0^2) * (n0/n_layer)^2; return 1 - sin2."""
    c = np.float32(cos0)
    r = np.float32(n0) / np.float32(n_layer)
    sin2 = (np.float32(1.0) - c * c) * (r * r)
    return np.float32(1.0) - sin2


def hunt_critical_cos(n_layer):
    """Find (cos0, n0) in f32 with layer_cosine's radicand exactly 0 for
    the given layer index (knob 2 = n0, sliding the lattice ~1/3 grain
    per ULP of 1.52)."""
    n0 = np.float32(N_GLASS)
    for _ in range(300):
        base = math.sqrt(max(0.0, 1.0 - (n_layer / float(n0)) ** 2))
        c = np.float32(base)
        for _ in range(16):
            arg = _cos_arg_f32(c, n0, n_layer)
            if arg == 0.0:
                return float(c), float(n0)
            c = np.nextafter(c, np.float32(1.0) if arg < 0
                             else np.float32(0.0))
        n0 = np.nextafter(n0, np.float32(2.0))
    return None


@pytest.mark.parametrize("where,n_layer", [("substrate", 1.0),
                                           ("layer", N_COAT)])
def test_thinfilm_exact_critical_f32(where, n_layer):
    """stack_r at EXACTLY critical incidence for (a) the substrate cosine
    and (b) a coating-layer cosine: the +i eps^2 shift in layer_cosine must
    bound sqrt' at the branch point in complex64, keeping d R/d cos0 and
    d R/d thickness finite."""
    found = hunt_critical_cos(n_layer)
    if found is None:
        pytest.skip(f"f32 lattice misses exact critical for {where}")
    cos0, n0 = found
    assert _cos_arg_f32(cos0, n0, n_layer) == 0.0
    d_qw = float(thinfilm.quarter_wave_thickness(N_COAT, 550.0))

    def R(cos0, d):
        one = jnp.ones(1, F32)
        return jnp.sum(thinfilm.stack_R_unpolarized(
            n0 * one, 1.0 * one, cos0 * one, 550.0 * one,
            jnp.full((1, 1), N_COAT, F32), jnp.full((1, 1), d, F32)))

    (v, (g_c, g_d)) = jax.value_and_grad(R, argnums=(0, 1))(
        jnp.asarray(cos0, F32), jnp.asarray(d_qw, F32))
    assert np.isfinite(float(v)) and 0.0 <= float(v) <= 1.0 + 1e-6
    assert np.isfinite(float(g_c)), f"{where}: dR/dcos0 = {g_c}"
    assert np.isfinite(float(g_d)), f"{where}: dR/dthickness = {g_d}"


# ----------------------------------------------------------------------
# _tangential_child: clamped sqrt at grazing emergence (grating path)
# ----------------------------------------------------------------------

def make_grating_proj(dtype=F32):
    """Normal-incidence 3D hit on a grating plane with exact-lattice
    geometry: norm = x-hat and groove = y-hat make d_t = 0 and
    out_t = (0, shift, 0) with shift = fl(lambda/a) exactly, so
    s2 = fl(shift^2) -- the grazing-emergence lattice is driven by the
    spacing knob alone."""
    p0 = jnp.zeros((1, 3), dtype)
    end = jnp.asarray([[1.0, 0.0, 0.0]], dtype)
    rays = RaySet.make(p0, end, 550.0, dtype=dtype)
    proj = Projection(
        hit_valid=jnp.ones(1, bool), point=end,
        norm=jnp.asarray([[1.0, 0.0, 0.0]], dtype),
        n_in=jnp.ones(1, dtype), n_out=jnp.ones(1, dtype),
        category=jnp.zeros(1, jnp.int32), surf_idx=jnp.zeros(1, jnp.int32),
        kind=jnp.zeros(1, jnp.int32), extras={}, dim=3)
    return proj, rays


def _grating_loss(a):
    proj, rays = make_grating_proj()
    rx = grating_reaction([(a, 1, "transmission", (0.0, 1.0, 0.0))],
                          {"triangles": np.asarray([0])})
    p0, p1, _ = rx(proj, rays, CFG)
    return jnp.sum(p1)


@pytest.mark.parametrize("case", ["exact_one", "one_ulp_below",
                                  "just_evanescent"])
def test_grating_grazing_emergence_f32(case):
    """s2 == 1.0 EXACTLY (a == lambda: shift == 1.0 with no rounding) sits
    on the boundary of _tangential_child's evan test; one ULP of spacing to
    either side lands on the clamp (0 < 1 - s2 < 2 ULP) and on the
    evanescent fallback.  All three must have finite spacing gradients
    through the full grating reaction."""
    a = {"exact_one": np.float32(550.0),
         "one_ulp_below": np.nextafter(np.float32(550.0), np.float32(600.0)),
         "just_evanescent": np.nextafter(np.float32(550.0),
                                         np.float32(500.0))}[case]
    # confirm the intended lattice placement of s2 = fl(fl(550/a)^2)
    t = np.float32(550.0) / a
    s2 = t * t
    if case == "exact_one":
        assert s2 == np.float32(1.0)
    elif case == "one_ulp_below":
        assert 0.0 < 1.0 - float(s2) < 3e-7
    else:
        assert s2 > np.float32(1.0)

    v, g = jax.value_and_grad(_grating_loss)(jnp.asarray(float(a), F32))
    assert np.isfinite(float(v))
    assert np.isfinite(float(g)), f"{case}: d child/d spacing = {g}"


# ----------------------------------------------------------------------
# exactly-grazing incidence (nu == 0.0) and the n == 0 mirror sentinel
# ----------------------------------------------------------------------

def make_grazing_proj(n_in, dtype=F32):
    """d = x-hat, norm = y-hat: nu = 0.0 with no rounding -- cos_i == 0
    exactly (grazing), every 1/cos and normalization guard on the hot
    path."""
    p0 = jnp.zeros((1, 3), dtype)
    end = jnp.asarray([[1.0, 0.0, 0.0]], dtype)
    rays = RaySet.make(p0, end, 550.0, dtype=dtype)
    proj = Projection(
        hit_valid=jnp.ones(1, bool), point=end,
        norm=jnp.asarray([[0.0, 1.0, 0.0]], dtype),
        n_in=jnp.asarray([n_in], dtype), n_out=jnp.ones(1, dtype),
        category=jnp.zeros(1, jnp.int32), surf_idx=jnp.zeros(1, jnp.int32),
        kind=jnp.zeros(1, jnp.int32), extras={}, dim=3)
    return proj, rays


@pytest.mark.parametrize("n_in", [0.75, 0.0],
                         ids=["grazing_external", "mirror_sentinel"])
def test_grazing_and_mirror_f32(n_in):
    """cos_i == 0.0 exactly: the intensity rs/rp denominators (eps floor)
    and the Jones cdiv (eps floor on |den|^2) are at their worst case; the
    n_in == 0 mirror sentinel additionally routes eta == 0 through every
    select.  Gradients w.r.t. n_in must stay finite in f32."""

    def loss_i(n):
        proj, rays = make_grazing_proj(n)
        rays = rays.with_field("intensity", jnp.ones(1, F32))
        _, _, upd = fresnel_intensity_reaction()(proj, rays, CFG)
        return jnp.sum(upd["intensity"])

    def loss_j(n):
        proj, rays = make_grazing_proj(n)
        rays = seed_polarization(rays)
        _, _, upd = jones_polarization_reaction()(proj, rays, CFG)
        return sum(jnp.sum(v) for k, v in upd.items()
                   if k.startswith(("es_", "ep_")))

    for name, loss in (("intensity", loss_i), ("jones", loss_j)):
        v, g = jax.value_and_grad(loss)(jnp.asarray(n_in, F32))
        assert np.isfinite(float(v)), f"{name}: value {v}"
        assert np.isfinite(float(g)), f"{name}: grad at grazing = {g}"


# ----------------------------------------------------------------------
# benign-point gradchecks: the clamps must not bend the derivative away
# from the corners (central difference vs jax.grad, f32 tolerances)
# ----------------------------------------------------------------------

def _fd(f, x, h):
    return (f(x + h) - f(x - h)) / (2.0 * h)


def test_gradcheck_intensity_f32():
    ny = 0.3  # ~30 degrees off the critical geometry: smooth region

    def loss(n_in):
        proj, rays = make_proj3d(float(n_in), ny)
        rays = rays.with_field("intensity", jnp.ones(1, F32))
        _, _, upd = fresnel_intensity_reaction()(proj, rays, CFG)
        return float(jnp.sum(upd["intensity"]))

    g = float(jax.grad(lambda n: jnp.sum(
        fresnel_intensity_reaction()(
            make_proj3d(n, ny)[0],
            make_proj3d(n, ny)[1].with_field("intensity", jnp.ones(1, F32)),
            CFG)[2]["intensity"]))(jnp.asarray(1.1, F32)))
    fd = _fd(loss, 1.1, 1e-3)
    np.testing.assert_allclose(g, fd, rtol=5e-2)


def test_gradcheck_thinfilm_f32():
    d_qw = float(thinfilm.quarter_wave_thickness(N_COAT, 550.0))

    def R(d):
        one = jnp.ones(1, F32)
        return jnp.sum(thinfilm.stack_R_unpolarized(
            one, N_GLASS * one, 0.9 * one, 550.0 * one,
            jnp.full((1, 1), N_COAT, F32),
            jnp.full((1, 1), d, F32)))

    g = float(jax.grad(R)(jnp.asarray(0.8 * d_qw, F32)))
    fd = float(_fd(lambda d: float(R(jnp.asarray(d, F32))), 0.8 * d_qw,
                   0.05))
    np.testing.assert_allclose(g, fd, rtol=5e-2)


def test_gradcheck_grating_f32():
    g = float(jax.grad(_grating_loss)(jnp.asarray(900.0, F32)))
    fd = float(_fd(lambda a: float(_grating_loss(jnp.asarray(a, F32))),
                   900.0, 0.25))
    np.testing.assert_allclose(g, fd, rtol=5e-2)


def test_gradcheck_jones_f32():
    ny = 0.3

    def loss(n_in):
        proj, rays = make_proj3d(n_in, ny)
        rays = seed_polarization(rays, jones=(0.6, 0.8))
        _, _, upd = jones_polarization_reaction()(proj, rays, CFG)
        s0 = upd["es_re"] ** 2 + upd["es_im"] ** 2 \
            + upd["ep_re"] ** 2 + upd["ep_im"] ** 2
        return jnp.sum(s0)

    g = float(jax.grad(lambda n: loss(n))(jnp.asarray(1.1, F32)))
    fd = _fd(lambda n: float(loss(jnp.asarray(n, F32))), 1.1, 1e-3)
    np.testing.assert_allclose(g, fd, rtol=5e-2)
