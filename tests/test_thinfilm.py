"""Thin-film coating tests: the characteristic-matrix stack must reproduce
textbook coating optics (bare-interface reduction, quarter-wave AR minimum,
HR Bragg pairs, lossless energy balance, TIR), and the coated-surface
intensity reaction must follow the engine's geometric branches."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, Scene3D, SegmentSet, TraceConfig, TriangleSet,
    trace,
)
from tensorflowraytrace_tpu.operations import (
    fresnel_intensity_reaction, thin_film_intensity_reaction,
)
from tensorflowraytrace_tpu.ops import materials as mats
from tensorflowraytrace_tpu.ops import thinfilm

F64 = jnp.float64
N_GLASS = 1.52
N_MGF2 = 1.38


def stack_R(n0, nsub, cos0, lam, layers):
    """Unpolarized R of a layer list [(n, d), ...] for a single ray."""
    one = jnp.ones(1, F64)
    if layers:
        ln = jnp.stack([jnp.full(1, n, F64) for n, _ in layers])
        ld = jnp.stack([jnp.full(1, d, F64) for _, d in layers])
    else:
        ln = jnp.zeros((0, 1), F64)
        ld = jnp.zeros((0, 1), F64)
    return float(thinfilm.stack_R_unpolarized(
        n0 * one, nsub * one, cos0 * one, lam * one, ln, ld)[0])


def test_empty_stack_is_bare_fresnel():
    """L == 0 must reduce exactly to the bare Fresnel interface."""
    for cos0 in (1.0, math.cos(0.5), math.cos(1.2)):
        R = stack_R(1.0, N_GLASS, cos0, 550.0, [])
        # analytic unpolarized Fresnel
        th = math.acos(cos0)
        tht = math.asin(math.sin(th) / N_GLASS)
        rs = (math.cos(th) - N_GLASS * math.cos(tht)) / (
            math.cos(th) + N_GLASS * math.cos(tht))
        rp = (N_GLASS * math.cos(th) - math.cos(tht)) / (
            N_GLASS * math.cos(th) + math.cos(tht))
        np.testing.assert_allclose(R, 0.5 * (rs * rs + rp * rp), rtol=1e-12)


def test_quarter_wave_ar_minimum():
    """Single quarter-wave layer at the design wavelength:
    R = ((n0 ns - nf^2) / (n0 ns + nf^2))^2 [Macleod eq. 2.96]."""
    lam = 550.0
    d = float(thinfilm.quarter_wave_thickness(N_MGF2, lam))
    R = stack_R(1.0, N_GLASS, 1.0, lam, [(N_MGF2, d)])
    expect = ((N_GLASS - N_MGF2 ** 2) / (N_GLASS + N_MGF2 ** 2)) ** 2
    np.testing.assert_allclose(R, expect, rtol=1e-12)
    # and it is below the bare interface at design wavelength
    assert R < stack_R(1.0, N_GLASS, 1.0, lam, [])
    # an ideal n = sqrt(ns) quarter-wave layer nulls R completely
    nf = math.sqrt(N_GLASS)
    d = float(thinfilm.quarter_wave_thickness(nf, lam))
    assert stack_R(1.0, N_GLASS, 1.0, lam, [(nf, d)]) < 1e-25


def test_hr_bragg_pairs_grow_reflectance():
    """Quarter-wave high/low pairs build a Bragg mirror: R rises toward 1
    with pair count (R_N = ((1 - Y)/(1 + Y))^2, Y = (nH/nL)^(2N) ns)."""
    lam, n_hi, n_lo = 550.0, 2.35, 1.38
    d_hi = float(thinfilm.quarter_wave_thickness(n_hi, lam))
    d_lo = float(thinfilm.quarter_wave_thickness(n_lo, lam))
    last = 0.0
    for pairs in (1, 2, 4):
        layers = [(n_hi, d_hi), (n_lo, d_lo)] * pairs
        R = stack_R(1.0, N_GLASS, 1.0, lam, layers)
        # equivalent admittance Y = (nH/nL)^(2N) ns [Macleod eq. 6.3]
        y = (n_hi / n_lo) ** (2 * pairs) * N_GLASS
        expect = ((1 - y) / (1 + y)) ** 2
        np.testing.assert_allclose(R, expect, rtol=1e-10)
        assert R > last
        last = R
    assert last > 0.95


def test_lossless_energy_and_tir():
    """Real-index stacks conserve energy (R in [0, 1]); beyond the critical
    angle the substrate wave is evanescent and R == 1 even under a stack."""
    lam = 550.0
    d = float(thinfilm.quarter_wave_thickness(N_MGF2, lam))
    for cos0 in np.cos(np.linspace(0.0, 1.5, 7)):
        R = stack_R(1.0, N_GLASS, float(cos0), lam, [(N_MGF2, d)])
        assert 0.0 <= R <= 1.0
    # glass -> vacuum beyond critical (41.1 deg)
    R = stack_R(N_GLASS, 1.0, math.cos(1.0), lam, [(N_MGF2, d)])
    np.testing.assert_allclose(R, 1.0, atol=1e-12)


def test_thickness_gradient_designs_ar():
    """dR/d(thickness) is finite and a few gradient steps strictly reduce
    broadband mean reflectance -- the differentiable-coating-design use."""
    lams = jnp.linspace(450.0, 650.0, 9)
    one = jnp.ones_like(lams)

    def mean_R(dd):
        ln = jnp.stack([N_MGF2 * one])
        ld = jnp.stack([dd * one])
        return jnp.mean(thinfilm.stack_R_unpolarized(
            one, N_GLASS * one, one, lams, ln, ld))

    d = jnp.asarray(40.0, F64)  # far from quarter-wave (~99.6)
    g = jax.grad(mean_R)
    r0 = float(mean_R(d))
    for _ in range(200):
        d = d - 2e4 * g(d)
    assert np.isfinite(float(g(d)))
    assert float(mean_R(d)) < 0.5 * r0
    # converged near the quarter-wave thickness at the band center
    assert abs(float(d) - 550.0 / (4 * N_MGF2)) < 8.0


def seeded_ray(dtype=F64):
    r = RaySet.make(jnp.asarray([[0.0, 0.0]], dtype),
                    jnp.asarray([[1.0, 0.0]], dtype), 550.0, dtype=dtype)
    return dataclasses.replace(
        r, fields={**r.fields, "intensity": jnp.ones(1, dtype)})


def glass_wall_scene():
    entry = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=F64)
    tgt = SegmentSet.make([[4.0, -50.0]], [[4.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[entry], target_segments=[tgt])
    return scene, (mats.vacuum, mats.build_constant_material(N_GLASS))


def test_reaction_bare_matches_fresnel_intensity():
    """coat id -1 (and an absent kind table) must behave exactly like
    fresnel_intensity_reaction."""
    scene, materials = glass_wall_scene()
    cfg = TraceConfig(max_bounces=2)
    rx = thin_film_intensity_reaction([], {"segments": np.asarray([-1, -1])})
    a = trace(seeded_ray(), scene, materials, cfg, reaction=rx)
    b = trace(seeded_ray(), scene, materials, cfg,
              reaction=fresnel_intensity_reaction())
    np.testing.assert_allclose(np.asarray(a.rays.fields["intensity"]),
                               np.asarray(b.rays.fields["intensity"]),
                               rtol=1e-14)


def test_reaction_ar_coated_transmission():
    """An AR-coated entrance face transmits 1 - R_stack instead of the bare
    Fresnel transmittance."""
    scene, materials = glass_wall_scene()
    d = float(thinfilm.quarter_wave_thickness(N_MGF2, 550.0))
    rx = thin_film_intensity_reaction(
        [[(N_MGF2, d)]], {"segments": np.asarray([0, -1])})
    res = trace(seeded_ray(), scene, materials, TraceConfig(max_bounces=2),
                reaction=rx)
    expect = 1.0 - ((N_GLASS - N_MGF2 ** 2) / (N_GLASS + N_MGF2 ** 2)) ** 2
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]),
                               expect, rtol=1e-12)


def test_reaction_internal_hit_reverses_stack():
    """Stacks are specified mat_out -> mat_in; a ray arriving from the
    mat_in side must traverse the layers in reverse order.  Pinned against
    a direct stack_r call with the order flipped by hand (an asymmetric
    2-layer stack, off quarter-wave so the order matters)."""
    # glass slab: entry at x=1 (uncoated), exit at x=2 whose endpoint
    # order is flipped so the +x ray hits it INTERNALLY (nu > 0): the
    # incident medium is mat_in = glass and the stack -- specified from the
    # mat_out (vacuum) side as [outer A, inner B] -- must be reversed
    layers = [(2.35, 30.0), (1.38, 85.0)]
    entry = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=F64)
    exit_ = SegmentSet.make([[2.0, 50.0]], [[2.0, -50.0]], mat_in=1,
                            mat_out=0, dtype=F64)
    tgt = SegmentSet.make([[4.0, -50.0]], [[4.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[entry, exit_],
                          target_segments=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(N_GLASS))
    rx = thin_film_intensity_reaction(
        [layers], {"segments": np.asarray([-1, 0, -1])})
    res = trace(seeded_ray(), scene, materials, TraceConfig(max_bounces=3),
                reaction=rx)
    assert int(res.rays.state[0]) == FINISHED

    # expected: bare Fresnel at entry, then the REVERSED stack seen from
    # the glass side at the exit face
    one = jnp.ones(1, F64)
    ln = jnp.stack([jnp.full(1, n, F64) for n, _ in reversed(layers)])
    ld = jnp.stack([jnp.full(1, d, F64) for _, d in reversed(layers)])
    R_exit = float(thinfilm.stack_R_unpolarized(
        N_GLASS * one, one, one, 550.0 * one, ln, ld)[0])
    R_entry = ((N_GLASS - 1) / (N_GLASS + 1)) ** 2
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]),
                               (1 - R_entry) * (1 - R_exit), rtol=1e-12)
    # sanity: the order genuinely matters for this stack
    ln_f = jnp.stack([jnp.full(1, n, F64) for n, _ in layers])
    ld_f = jnp.stack([jnp.full(1, d, F64) for _, d in layers])
    R_fwd = float(thinfilm.stack_R_unpolarized(
        N_GLASS * one, one, one, 550.0 * one, ln_f, ld_f)[0])
    assert abs(R_fwd - R_exit) > 1e-4


def test_reaction_3d_table_and_dispersive_layer():
    """3D coat tables gather by surf_idx, and a layer index may be a
    materials-style callable n(wavelength)."""
    big = 200.0
    wall = TriangleSet.make(
        [[1.0, -big, -big]], [[1.0, big, 0.0]], [[1.0, -big, big]],
        mat_in=1, mat_out=0, dtype=F64)
    tgt = TriangleSet.make(
        [[4.0, -big, -big]], [[4.0, big, 0.0]], [[4.0, -big, big]],
        dtype=F64)
    scene = Scene3D.build(optical=[wall], targets=[tgt])
    materials = (mats.vacuum, mats.build_constant_material(N_GLASS))

    def n_disp(wl):
        return 1.3 + 44.0 / wl  # 1.38 at 550

    d = float(thinfilm.quarter_wave_thickness(N_MGF2, 550.0))
    rx = thin_film_intensity_reaction(
        [[(n_disp, d)]], {"triangles": np.asarray([0, -1])})
    r = RaySet.make(jnp.asarray([[0.0, 0.0, 0.0]], F64),
                    jnp.asarray([[1.0, 0.0, 0.0]], F64), 550.0, dtype=F64)
    r = dataclasses.replace(r, fields={**r.fields,
                                       "intensity": jnp.ones(1, F64)})
    res = trace(r, scene, materials, TraceConfig(max_bounces=2), reaction=rx)
    assert int(res.rays.state[0]) == FINISHED
    expect = 1.0 - ((N_GLASS - N_MGF2 ** 2) / (N_GLASS + N_MGF2 ** 2)) ** 2
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]),
                               expect, rtol=1e-9)


def test_mirror_sentinel_under_thin_film_is_lossless_and_finite():
    """A mirror surface (n == 0 sentinel substrate) must give R == 1 --
    factor 1 on the reflect branch -- not NaN (regression: stack_r computed
    (n0/0)^2 = inf in the substrate admittance)."""
    mirror = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=1,
                             mat_out=0, dtype=F64)
    tgt = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror], target_segments=[tgt])
    rays = RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                       jnp.asarray([[1.0, 0.25]], F64), 550.0, dtype=F64)
    rays = dataclasses.replace(
        rays, fields={**rays.fields, "intensity": jnp.ones(1, F64)})
    rx = thin_film_intensity_reaction([], {})
    res = trace(rays, scene, (mats.vacuum, mats.reflective),
                TraceConfig(max_bounces=2), reaction=rx)
    assert int(res.rays.state[0]) == FINISHED
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]), 1.0,
                               rtol=1e-12)


def test_bare_one_sided_mirror_back_refraction_matches_fresnel():
    """2D n_in == 0 internal hits REFRACT (one-sided mirror, eta = 1/n_out);
    the bare thin-film path must apply the same transmittance as
    fresnel_intensity_reaction, not eta0 = 0 -> R = 1 -> factor 0
    (regression)."""
    n_glass = 1.5
    mirror = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=0,
                             mat_out=1, dtype=F64)
    tgt = SegmentSet.make([[0.0, -50.0]], [[0.0, 50.0]], dtype=F64)
    scene = Scene2D.build(optical_segments=[mirror], target_segments=[tgt])
    materials = (mats.reflective, mats.build_constant_material(n_glass))

    def run(rx):
        rays = RaySet.make(jnp.asarray([[4.0, 0.0]], F64),
                           jnp.asarray([[3.0, 0.0]], F64), 550.0, dtype=F64)
        rays = dataclasses.replace(
            rays, fields={**rays.fields, "intensity": jnp.ones(1, F64)})
        return trace(rays, scene, materials, TraceConfig(max_bounces=2),
                     reaction=rx)

    a = run(thin_film_intensity_reaction([], {}))
    b = run(fresnel_intensity_reaction())
    assert int(a.rays.state[0]) == FINISHED
    got = float(a.rays.fields["intensity"][0])
    want = float(b.rays.fields["intensity"][0])
    assert 0.9 < want < 1.0  # the refraction genuinely attenuates
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_absorption_composes_with_interface_intensity():
    """Bulk absorption over interface Fresnel losses: the two intensity
    trackers chain multiplicatively on the shared field (regression: the
    merge used to raise ValueError on the natural composition)."""
    from tensorflowraytrace_tpu.operations import (
        absorption_reaction, final_intensity, seed_absorption,
    )

    alpha = 0.3
    scene, materials = glass_wall_scene()
    tables = {"segments": (np.asarray([alpha, 0.0]), np.asarray([0.0, 0.0]))}
    rays = seed_absorption(seeded_ray())
    rx = absorption_reaction(tables,
                             base_reaction=fresnel_intensity_reaction())
    res = trace(rays, scene, materials, TraceConfig(max_bounces=2),
                reaction=rx)
    assert int(res.rays.state[0]) == FINISHED
    T = 1.0 - ((N_GLASS - 1) / (N_GLASS + 1)) ** 2
    # interface transmittance at x=1, then 3 units of absorbing glass to
    # the target at x=4 (closed by final_intensity)
    np.testing.assert_allclose(float(final_intensity(res.rays)[0]),
                               T * math.exp(-alpha * 3.0), rtol=1e-12)


def test_class_ops_forward_field_parameter():
    """ThinFilmIntensity/Absorption expose field= like FresnelIntensity."""
    from tensorflowraytrace_tpu.operations import Absorption, ThinFilmIntensity

    op1 = ThinFilmIntensity([], {}, field="power")
    op2 = Absorption({}, field="power")
    scene, materials = glass_wall_scene()
    rays = RaySet.make(jnp.asarray([[0.0, 0.0]], F64),
                       jnp.asarray([[1.0, 0.0]], F64), 550.0, dtype=F64)
    rays = dataclasses.replace(
        rays, fields={**rays.fields, "power": jnp.ones(1, F64),
                      "cur_alpha": jnp.zeros(1, F64)})
    r1 = trace(rays, scene, materials, TraceConfig(max_bounces=2),
               reaction=op1.reaction)
    r2 = trace(rays, scene, materials, TraceConfig(max_bounces=2),
               reaction=op2.reaction)
    assert float(r1.rays.fields["power"][0]) < 1.0
    np.testing.assert_allclose(float(r2.rays.fields["power"][0]), 1.0)


def test_grand_composition_matches_individual_trackers():
    """All four field trackers in ONE trace -- bulk absorption over coated
    interface intensity over Jones polarization over OPL -- and every
    field equals its single-tracker run: the composition machinery neither
    double-applies nor drops any physics."""
    from tensorflowraytrace_tpu.operations import (
        absorption_reaction, jones_polarization_reaction,
        optical_path_reaction, seed_absorption, seed_optical_path,
        seed_polarization, stokes_parameters,
    )

    scene, materials = glass_wall_scene()
    cfg = TraceConfig(max_bounces=2)
    alpha = 0.2
    tables = {"segments": (np.asarray([alpha, 0.0]), np.asarray([0.0, 0.0]))}
    d = float(thinfilm.quarter_wave_thickness(N_MGF2, 550.0))
    stack_spec = ([[(N_MGF2, d)]], {"segments": np.asarray([0, -1])})

    def seeded():
        r = seeded_ray()
        r = seed_optical_path(r)
        r = seed_absorption(r, seed_field=False)
        return seed_polarization(r, jones=(1.0, 0.0))

    composed = trace(seeded(), scene, materials, cfg,
                     reaction=absorption_reaction(
                         tables, base_reaction=thin_film_intensity_reaction(
                             *stack_spec,
                             base_reaction=jones_polarization_reaction(
                                 base_reaction=optical_path_reaction()))))

    # singles
    r_film = trace(seeded(), scene, materials, cfg,
                   reaction=thin_film_intensity_reaction(*stack_spec))
    r_abs = trace(seeded(), scene, materials, cfg,
                  reaction=absorption_reaction(tables))
    r_jones = trace(seeded(), scene, materials, cfg,
                    reaction=jones_polarization_reaction())
    r_opl = trace(seeded(), scene, materials, cfg,
                  reaction=optical_path_reaction())

    cf = composed.rays.fields
    # intensity chains multiplicatively: coated transmittance x Beer-Lambert
    np.testing.assert_allclose(
        float(cf["intensity"][0]),
        float(r_film.rays.fields["intensity"][0])
        * float(r_abs.rays.fields["intensity"][0]), rtol=1e-12)
    # polarization, OPL and the carried media are untouched by the others
    s_c = stokes_parameters(composed.rays)
    s_1 = stokes_parameters(r_jones.rays)
    np.testing.assert_allclose(float(s_c["S0"][0]), float(s_1["S0"][0]),
                               rtol=1e-12)
    np.testing.assert_allclose(float(cf["opl"][0]),
                               float(r_opl.rays.fields["opl"][0]),
                               rtol=1e-12)
    np.testing.assert_allclose(float(cf["cur_n"][0]),
                               float(r_opl.rays.fields["cur_n"][0]))
    np.testing.assert_allclose(float(cf["cur_alpha"][0]),
                               float(r_abs.rays.fields["cur_alpha"][0]))


def test_surface_absorber():
    """Per-surface absorptivity multiplies intensity by 1 - A per hit and
    composes with the Fresnel tracker; unmarked kinds lose nothing."""
    from tensorflowraytrace_tpu.operations import surface_absorber_reaction

    scene, materials = glass_wall_scene()
    cfg = TraceConfig(max_bounces=2)
    A = 0.25
    rx = surface_absorber_reaction(
        {"segments": np.asarray([A, 0.0])},
        base_reaction=fresnel_intensity_reaction())
    res = trace(seeded_ray(), scene, materials, cfg, reaction=rx)
    T = 1.0 - ((N_GLASS - 1) / (N_GLASS + 1)) ** 2
    np.testing.assert_allclose(float(res.rays.fields["intensity"][0]),
                               (1 - A) * T, rtol=1e-12)
    # unmarked table: pure Fresnel
    rx0 = surface_absorber_reaction(
        {}, base_reaction=fresnel_intensity_reaction())
    res0 = trace(seeded_ray(), scene, materials, cfg, reaction=rx0)
    np.testing.assert_allclose(float(res0.rays.fields["intensity"][0]), T,
                               rtol=1e-12)
