"""CPU-vs-TPU f32 trace-agreement floors (VERDICT.md round-1 weak #7).

The characterized numbers (docs/notes.md) are:
  3D lens depth 3:       100%   state agreement, max same-fate dev 4.3e-6
  2D arc depth 2:        98.4%  state agreement, max same-fate dev 5.9e-6
  2D TIR guide depth 50: 99.95% state agreement (chaotic same-fate divergence)

These tests codify floors below those measurements so a TPU-path numerics
regression is caught.  The suite forces a CPU backend in-process
(tests/conftest.py), so the comparison runs in a subprocess with the host's
default (TPU) env; skipped when no TPU is attached.
"""

import json
import os
import subprocess
import sys

import pytest

from tensorflowraytrace_tpu.utils.tpu_probe import probe_tpu, tpu_env

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLOORS = {
    "2D arc refraction (depth 2)": {"state_agreement": 0.97,
                                    "max_same_fate_dev": 1e-4},
    "3D parametric lens (depth 3)": {"state_agreement": 0.999,
                                     "max_same_fate_dev": 1e-4},
    "2D TIR guide (depth 50)": {"state_agreement": 0.995,
                                "max_same_fate_dev": None},
    # r3 field trackers (VERDICT r3 next-round #5).  Floors are ~10x the
    # deviations measured on a live v5e chip 2026-08-18 (docs/notes.md):
    # intensity 6.2e-8, opl 4.8e-7, Stokes ~3.6e-7 (vs the S0 scale),
    # thin-film 6.1e-8.
    "intensity+OPL (dispersive arc)": {
        "state_agreement": 0.97, "max_same_fate_dev": 1e-4,
        "field_devs": {"intensity": 1e-6, "opl_total": 5e-6}},
    "Jones rhomb (two TIRs)": {
        "state_agreement": 0.97, "max_same_fate_dev": 1e-4,
        "field_devs": {"S0": 4e-6, "S1": 4e-6, "S2": 4e-6, "S3": 4e-6}},
    "thin-film oblique (45deg)": {
        "state_agreement": 0.97, "max_same_fate_dev": 1e-4,
        "field_devs": {"intensity": 1e-6}},
    # r5 coated-surface Jones transport (stack_rt complex amplitudes ->
    # Stokes), measured on v5e 2026-08-19: 100% state agreement, same-fate
    # 2.9e-6, Stokes devs S0 4.9e-7 / S1 3.3e-7 / S2 4.3e-7 / S3 1.3e-7.
    # Floors ~10x measured.
    "thin-film Jones (coated oblique)": {
        "state_agreement": 0.97, "max_same_fate_dev": 1e-4,
        "field_devs": {"S0": 5e-6, "S1": 5e-6, "S2": 5e-6, "S3": 5e-6}},
    # r4 multi-branch tracing, measured on v5e 2026-08-18: ghost 100%
    # agreement / p1 1.7e-6 / intensity 5.5e-7; roulette 100% agreement
    # (the threefry acceptance bits are platform-deterministic, so the
    # SAMPLED branches match exactly) / p1 7.2e-7 / intensity 1.3e-7.
    # Roulette's state floor is looser: a branch flips whenever f32
    # rounding moves R across the drawn u (~1e-7 odds per decision).
    "ghost double-bounce (slab)": {
        "state_agreement": 0.99, "max_same_fate_dev": 1e-4,
        "field_devs": {"intensity": 1e-5}},
    "russian roulette (slab)": {
        "state_agreement": 0.95, "max_same_fate_dev": 1e-4,
        "field_devs": {"intensity": 1e-5}},
}

# grid-valued configs (no ray fates): floors on max deviation relative to
# the CPU peak.  With the reference-wavelet phase reduction the coherent sum
# agrees to 1.4e-6 (measured on v5e 2026-08-18; it was 0.33 before the
# reduction -- k*(absolute path) ~2e6 rad overwhelmed f32 trig).
VALUE_FLOORS = {
    "Huygens PSF (32x32 grid)": {"max_rel_dev": 2e-5},
}


@pytest.fixture(scope="module")
def agreement():
    # undo the suite's CPU forcing; let the host env pick the TPU platform
    env = tpu_env()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # A hung tunnel (platform registers, device calls block) would stall the
    # 1200 s run below to ERROR; a bounded subprocess probe degrades that
    # outage mode to a skip.
    if probe_tpu(timeout=120, env=env) is None:
        pytest.skip("no working TPU (device probe failed or hung)")
    r = subprocess.run(
        [sys.executable, os.path.join("examples", "cpu_tpu_agreement.py"),
         "--json"],
        env=env, cwd=REPO, text=True, capture_output=True, timeout=1200)
    if "no TPU attached" in r.stdout or "no TPU attached" in r.stderr:
        pytest.skip("no TPU attached")
    assert r.returncode == 0, r.stderr[-2000:]
    for line in r.stdout.splitlines():
        if line.startswith("AGREEMENT_JSON "):
            return json.loads(line[len("AGREEMENT_JSON "):])
    pytest.skip("agreement run produced no JSON (no TPU?)")


@pytest.mark.tpu
@pytest.mark.parametrize("config", sorted(FLOORS))
def test_agreement_floor(agreement, config):
    floors = FLOORS[config]
    got = agreement[config]
    assert got["state_agreement"] >= floors["state_agreement"], (
        f"{config}: state agreement {got['state_agreement']:.4%} fell below "
        f"floor {floors['state_agreement']:.4%} -- TPU numerics regression?")
    if floors["max_same_fate_dev"] is not None:
        assert got["max_same_fate_dev"] <= floors["max_same_fate_dev"], (
            f"{config}: same-fate deviation {got['max_same_fate_dev']:.3e} "
            f"above floor {floors['max_same_fate_dev']:.1e}")
    for field, floor in floors.get("field_devs", {}).items():
        dev = got["field_devs"][field]
        assert dev <= floor, (
            f"{config}: field {field!r} rel deviation {dev:.3e} above floor "
            f"{floor:.1e} -- TPU physics regression in the r3 trackers?")


@pytest.mark.tpu
@pytest.mark.parametrize("config", sorted(VALUE_FLOORS))
def test_value_floor(agreement, config):
    floors = VALUE_FLOORS[config]
    got = agreement[config]
    assert got["max_rel_dev"] <= floors["max_rel_dev"], (
        f"{config}: max rel deviation {got['max_rel_dev']:.3e} above floor "
        f"{floors['max_rel_dev']:.1e}")
