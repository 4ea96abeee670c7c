"""Smoke tests: every headless example runs end-to-end at tiny sizes.

The reference's de-facto integration tests are its ~50 dev/ scripts run by
hand (SURVEY.md section 4: "the de facto integration tests are the dev/
scripts").  Here the equivalent examples/ scripts ARE importable modules with
parameterized ``main``s, so CI can actually execute them: each test imports
the script and runs ``main`` with the smallest sizes that still exercise the
full pipeline.  Artifacts (PNGs, STLs, pickles) land in a tmp cwd.

Skipped (with reasons): baseline_tf_cpu (imports TensorFlow; minutes),
cpu_tpu_agreement (needs the real TPU), performance (fixed 1M-ray sweep).
"""

import importlib.util
import os
import sys

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples")


def load(name):
    spec = importlib.util.spec_from_file_location(
        f"example_{name}", os.path.join(EXAMPLES, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(autouse=True)
def _tmp_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    yield
    plt.close("all")


# (script, kwargs) -- sizes chosen so each runs in seconds on CPU float64
CASES = [
    ("optimize_single_arc", {}),
    ("design_sweep", {"population": 8, "steps": 5, "top_k": 2}),
    ("trace_3d", {}),
    ("light_guide", {}),
    ("mesh_graph_tools", {}),
    ("engine_internals", {}),
    ("cdf_demo", {}),
    ("remesh", {}),
    ("source_gallery", {}),
    ("source_rotation_roll", {}),
    ("precompile_pipeline", {}),
    ("stepwise_optimize", {}),
    ("hexalens", {"steps": 2, "ray_count": 128, "mesh_step": 0.3}),
    ("simple_3d_optimize", {"steps": 2, "bp_count": 5, "mesh_steps": 3}),
    ("sharded_light_guide", {"rays": 1024, "steps": 2, "bounces": 3}),
    ("guide_trace_bench", {"n_rays": 512, "bounces": 3,
                           "theta_res": 6, "z_res": 6}),
    ("fresnel_intensity", {"rays": 400}),
    ("fresnel_rhomb", {"steps": 40}),
    ("wavefront_lens", {"steps": 250}),
    ("achromat", {"steps": 5, "n_heights": 9}),
    ("ar_coating", {"steps": 60, "rays": 128}),
    ("spectrometer", {"steps": 400}),
    ("hybrid_achromat", {"steps": 260, "n_heights": 9}),
    ("strehl_lens", {"steps": 150, "n_segments": 32, "n_rays": 96}),
    ("tolerancing", {"samples": 128, "n_rays": 48}),
    ("stray_light", {"rays": 1200}),
    ("ghost_analysis", {"rays": 101, "depth": 4, "make_plot": False}),
    ("streamed_trace", {"n_rays": 2048, "block": 512, "bounces": 6,
                        "theta_res": 8, "z_res": 12, "scaling_points": 2}),
    ("caustic_render", {"n_rays": 2048, "block": 512, "res": 32,
                        "mesh_steps": 8}),
    ("streamed_training", {"rays_per_step": 2048, "block": 512, "steps": 3,
                           "bounces": 6, "theta_res": 6, "z_res": 6}),
    # the multi-chip differentiated stream: block index space sharded over
    # the 8-device virtual mesh, one psum per dispatch
    ("streamed_training#mesh", {"rays_per_step": 2048, "block": 256,
                                "steps": 2, "bounces": 4, "theta_res": 6,
                                "z_res": 6, "mesh_devices": 8}),
    ("interactive_optimize", {"simulate": [" ", " ", "b", "s", " ", "q"],
                              "verbose": False}),
    ("asphere_singlet", {"steps": 300, "resolution": 64, "n_rays": 64,
                         "verbose": False}),
    ("cooke_triplet", {"steps": 250, "n_rays": 24, "verbose": False}),
    ("paraxial_analysis", {"verbose": False}),
    ("lens_report", {"n_rays": 400, "psf_rays": 512, "grid_pts": 41,
                     "n_fields": 3, "verbose": False}),
    ("tpu_physics_bench", {"tiny": True}),
]


@pytest.mark.parametrize("name,kwargs", CASES, ids=[c[0] for c in CASES])
def test_example_runs(name, kwargs):
    # "script#variant" runs the same script under a second configuration
    mod = load(name.split("#")[0])
    mod.main(**kwargs)


def test_image_quality_3d_runs(tmp_path):
    """The full finished-lens workflow: hexalens exports its STLs, then
    image_quality_3d loads them back and histograms the landing spots
    (reference dev/hexalens.py -> dev/image_quality_3d.py chain)."""
    load("hexalens").main(steps=2, ray_count=128, mesh_step=0.3)
    assert os.path.exists("hexalens_first.stl")  # saved into the tmp cwd
    load("image_quality_3d").main(
        batches=2, rays=64,
        first_stl="hexalens_first.stl", second_stl="hexalens_second.stl")
