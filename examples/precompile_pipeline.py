"""Precompile pipeline: expensive goal built offline, cached, downsampled
per step.

Rebuild of the /root/reference/dev/PCF_lens.py workflow (SURVEY.md 3.4):
  1. build a goal point set from an image-like density (ImageBasePoints),
  2. build a source point set from an arbitrary density,
  3. match goals to sources optimally (Hungarian transform_map, O(n^3)),
  4. cache the matched pairs (PrecompiledBasePoints.save),
  5. per optimization step: cheap random downsample + Gaussian perturbation.

Run:  python examples/precompile_pipeline.py
"""

import math

import jax
import numpy as np

from tensorflowraytrace_tpu.models import goals

PI = math.pi


def main():
    n = 300

    # 1. goal: a ring-shaped density built like an image (could also be
    #    goals.ImageBasePoints("file.png", x_size=...) for a real image)
    yy, xx = np.mgrid[-1:1:64j, -1:1:64j]
    r = np.hypot(xx, yy)
    ring_img = ((np.abs(r - 0.6) < 0.12) * 200).astype(np.uint8)
    goal_points_dist = goals.ImageBasePoints.from_array(ring_img, x_size=2.0)
    goal_points, _ = goal_points_dist.sample(jax.random.PRNGKey(0))
    goal_points = np.asarray(goal_points)
    idx = np.random.default_rng(0).choice(goal_points.shape[0], n, replace=False)
    goal_points = goal_points[idx]
    print(f"goal: {goal_points.shape[0]} points on the ring")

    # 2. source: gaussian spot
    src_density = lambda x, y: np.exp(-(x ** 2 + y ** 2) / 0.08)
    src_dist = goals.ArbitraryBasePoints(
        goals.ArbitraryDistribution(src_density, ((-1, 1, 64), (-1, 1, 64))),
        n, conserve_etendue=False)
    src_points, _ = src_dist.sample(jax.random.PRNGKey(1))
    src_points = np.asarray(src_points)

    # 3. optimal matching (this is the expensive offline step)
    matched_goals = goals.transform_map(src_points, goal_points)
    mean_d = np.linalg.norm(src_points - matched_goals, axis=1).mean()
    print(f"Hungarian matching done; mean source->goal distance {mean_d:.3f}")

    # 4. cache
    cache = goals.PrecompiledBasePoints(sample_count=64,
                                        perturbation=(0.01, 0.01))
    cache.full_points = src_points
    cache.full_ranks = matched_goals
    cache.save("precompiled_points.pkl")
    print("saved precompiled_points.pkl")

    # 5. per-step cheap sampling
    loaded = goals.PrecompiledBasePoints("precompiled_points.pkl",
                                         sample_count=64,
                                         perturbation=(0.01, 0.01))
    for step in range(3):
        pts, ranks = loaded.sample(jax.random.PRNGKey(100 + step))
        print(f"step {step}: sampled {pts.shape[0]} source points with "
              f"matched goals, first goal = {np.asarray(ranks)[0]}")


if __name__ == "__main__":
    main()
