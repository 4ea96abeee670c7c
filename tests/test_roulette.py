"""Russian-roulette stochastic branch sampling (the Monte-Carlo complement
to the deterministic ghost-tree enumeration).

Pins, on the glass-slab scene shared with tests/test_ghost.py:

* unbiasedness: the Monte-Carlo landed-power estimate matches the exact
  depth-K branch-tree sum (branch_override enumeration) within sampling
  error,
* power-proportional weights are exactly 1 (sampling prob == branch power),
* defensive-floor weights differ from 1 but stay unbiased,
* mean total weight == 1 (the compensation telescopes) and TIR slots are
  deterministic (always reflect),
* reproducibility: same key -> identical trace.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowraytrace_tpu import (
    FINISHED, RaySet, Scene2D, SegmentSet, TraceConfig, trace,
)
from tensorflowraytrace_tpu.operations import (
    all_branch_schedules, branch_override_reaction,
    fresnel_intensity_reaction, russian_roulette_reaction,
    seed_branch_counter, seed_roulette,
)
from tensorflowraytrace_tpu.ops import materials as mats

F64 = jnp.float64
N_GLASS = 1.5
R = ((N_GLASS - 1.0) / (N_GLASS + 1.0)) ** 2
T = 1.0 - R


def slab_scene(dtype=F64):
    front = SegmentSet.make([[1.0, -50.0]], [[1.0, 50.0]], mat_in=1,
                            mat_out=0, dtype=dtype)
    back = SegmentSet.make([[2.0, -50.0]], [[2.0, 50.0]], mat_in=1,
                           mat_out=0, dtype=dtype)
    tgt = SegmentSet.make([[5.0, -50.0]], [[5.0, 50.0]], dtype=dtype)
    scene = Scene2D.build(optical_segments=[front, back],
                          target_segments=[tgt])
    return scene, (mats.vacuum, mats.build_constant_material(N_GLASS))


def beam(n, dtype=F64):
    p0 = np.zeros((n, 2))
    p0[:, 1] = np.linspace(-0.5, 0.5, n)
    r = RaySet.make(jnp.asarray(p0, dtype),
                    jnp.asarray(p0 + [1.0, 0.0], dtype), 550.0, dtype=dtype)
    return seed_roulette(r).with_field("intensity", jnp.ones(n, dtype))


K = 6
CFG = TraceConfig(max_bounces=K)


@functools.lru_cache(maxsize=1)
def exact_landed_power():
    """Ground truth: exhaustive depth-K branch tree (one on-axis ray),
    landed-on-target power with early-exit multiplicity weighting.  One
    compiled program vmapped over the 2**K schedules (a Python loop would
    compile the engine 64x and bloat the suite's XLA compile memory), and
    memoized across the parametrized callers."""
    scene, materials = slab_scene()
    rays = seed_branch_counter(
        RaySet.make(jnp.zeros((1, 2), F64), jnp.asarray([[1.0, 0.0]], F64),
                    550.0, dtype=F64)).with_field("intensity",
                                                  jnp.ones(1, F64))

    @jax.jit
    def leaf(sched):
        rx = fresnel_intensity_reaction(
            base_reaction=branch_override_reaction(sched))
        res = trace(rays, scene, materials, CFG, reaction=rx)
        landed = res.rays.state[0] == FINISHED
        pwr = jnp.where(landed, res.rays.fields["intensity"][0], 0.0)
        j = res.rays.fields["branch_ctr"][0]
        return pwr * 2.0 ** (j.astype(F64) - K)

    return float(jnp.sum(jax.vmap(leaf)(all_branch_schedules(K))))


@pytest.mark.parametrize("floor", [0.0, 0.1],
                         ids=["power_proportional", "defensive"])
def test_unbiased_landed_power(floor):
    """MC landed power over 20k rays matches the exact branch-tree sum
    within ~4 sigma of the binomial sampling error."""
    scene, materials = slab_scene()
    n = 20000
    rays = beam(n)
    rx = fresnel_intensity_reaction(
        base_reaction=russian_roulette_reaction(
            jax.random.PRNGKey(0), defensive_floor=floor))
    res = trace(rays, scene, materials, CFG, reaction=rx)
    landed = np.asarray(res.rays.state) == FINISHED
    w = np.asarray(res.rays.fields["intensity"])
    mc = float(np.sum(np.where(landed, w, 0.0))) / n
    exact = exact_landed_power()
    # sigma of the per-ray landed-weight estimator, measured empirically
    per_ray = np.where(landed, w, 0.0)
    sigma = float(per_ray.std()) / math.sqrt(n)
    assert abs(mc - exact) < 4.0 * sigma + 1e-6, (
        f"MC {mc:.6f} vs exact {exact:.6f} (sigma {sigma:.2e})")
    if floor == 0.0:
        # power-proportional sampling: every weight is exactly 1
        np.testing.assert_allclose(w, 1.0, rtol=1e-12)
    else:
        assert np.abs(w - 1.0).max() > 1e-3  # compensation really applied


def test_mean_total_weight_is_one():
    """E[product of compensations x branch powers] == 1 regardless of
    landing: the weight telescopes (R/p + (1-R)/(1-p) weighted by p, 1-p)."""
    scene, materials = slab_scene()
    n = 50000
    rays = beam(n)
    rx = fresnel_intensity_reaction(
        base_reaction=russian_roulette_reaction(
            jax.random.PRNGKey(3), defensive_floor=0.2))
    res = trace(rays, scene, materials, CFG, reaction=rx)
    w = np.asarray(res.rays.fields["intensity"])
    sigma = w.std() / math.sqrt(n)
    assert abs(w.mean() - 1.0) < 4.0 * sigma + 1e-9


def test_tir_is_deterministic():
    """Beyond the critical angle R_eff == 1: every ray reflects, weight 1,
    no variance."""
    scene, materials = slab_scene()
    n = 500
    ang = 0.9  # > critical angle 0.7297
    p0 = np.zeros((n, 2))
    p0[:, 0] = 1.5
    p0[:, 1] = np.linspace(-0.2, 0.2, n)
    d = np.tile([-math.cos(ang), math.sin(ang)], (n, 1))
    rays = seed_roulette(
        RaySet.make(jnp.asarray(p0, F64), jnp.asarray(p0 + d, F64), 550.0,
                    dtype=F64)).with_field("intensity", jnp.ones(n, F64))
    rx = fresnel_intensity_reaction(
        base_reaction=russian_roulette_reaction(jax.random.PRNGKey(1)))
    res = trace(rays, scene, materials, TraceConfig(max_bounces=1),
                reaction=rx)
    np.testing.assert_allclose(
        np.asarray(res.rays.fields["intensity"]), 1.0, rtol=1e-12)
    # reflected: direction flipped in x at the front wall (internal hit)
    v = np.asarray(res.rays.p1 - res.rays.p0)
    assert np.all(v[:, 0] > 0)


def test_reproducible_and_key_sensitive():
    scene, materials = slab_scene()
    rays = beam(256)
    mk = lambda k: trace(
        rays, scene, materials, CFG,
        reaction=fresnel_intensity_reaction(
            base_reaction=russian_roulette_reaction(jax.random.PRNGKey(k))))
    a1, a2, b = mk(0), mk(0), mk(1)
    np.testing.assert_array_equal(np.asarray(a1.rays.p1),
                                  np.asarray(a2.rays.p1))
    assert not np.array_equal(np.asarray(a1.rays.state),
                              np.asarray(b.rays.state))


def test_missing_seed_fails_loudly():
    scene, materials = slab_scene()
    rays = RaySet.make(jnp.zeros((1, 2), F64),
                       jnp.asarray([[1.0, 0.0]], F64), 550.0, dtype=F64)
    with pytest.raises(KeyError, match="rr_ctr"):
        trace(rays, scene, materials, CFG,
              reaction=russian_roulette_reaction(jax.random.PRNGKey(0)))
