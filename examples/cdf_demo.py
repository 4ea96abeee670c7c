"""CDF machinery demo: forward/inverse density warps and goal flattening.

Rebuild of the reference's dev/cdf_test.py / dev/cdf_demo.py /
dev/flatten_distributions.py workflow: accumulate a density from traced-ray
histograms, compute its CDF, and use it both ways (uniform -> density for
goal generation; density -> uniform for flattening).

Run:  python examples/cdf_demo.py
"""

import numpy as np

from tensorflowraytrace_tpu.models import goals


def main():
    rng = np.random.default_rng(0)

    # pretend these are landing patterns accumulated over trace batches
    cdf = goals.CumulativeDensityFunction(((-1.0, 1.0), (-1.0, 1.0)))
    for batch in range(5):
        pts = rng.normal(0, 0.35, (20000, 2)).clip(-0.999, 0.999)
        h, _, _ = np.histogram2d(pts[:, 0], pts[:, 1], bins=32,
                                 range=((-1, 1), (-1, 1)))
        cdf.accumulate_density(h.T)  # (Y, X) convention
    cdf.compute()

    # forward: map uniform samples onto the accumulated density
    uni = rng.uniform(0, 1, (30000, 2))
    mapped = cdf.cdf(uni)
    print(f"forward CDF: uniform -> gaussian-ish; std = "
          f"{mapped.std(axis=0).round(3)} (target ~0.35)")

    # inverse: flatten density-distributed points to uniform
    gauss = rng.normal(0, 0.35, (30000, 2)).clip(-0.999, 0.999)
    flat = cdf.icdf(gauss)
    h, _ = np.histogram(flat[:, 0], bins=10, range=(0, 1))
    print(f"inverse CDF: flattened x-histogram cv = "
          f"{h.std() / h.mean():.3f} (uniform ~ 0)")

    # one-shot flatten of an arbitrary cloud (flatten_distribution)
    xf, yf = goals.flatten_distribution(gauss[:, 0], gauss[:, 1],
                                        ((-1, 1, 48), (-1, 1, 48)))
    h2, _ = np.histogram(xf, bins=10, range=(0, 1))
    print(f"flatten_distribution: cv = {h2.std() / h2.mean():.3f}")


if __name__ == "__main__":
    main()
