"""Re-mesh an irregular initial-condition surface onto a regular base mesh.

Rebuild of /root/reference/dev/remesh.py: planar_interpolated_remesh takes a
bumpy mesh whose vertex heights define a desired starting shape and produces
(a) a flat copy of a *regular* base mesh and (b) the initial parameters that
re-inflate it -- the right way to seed a parametric optic with a non-planar
initial condition.

Run:  python examples/remesh.py
"""

import numpy as np

from tensorflowraytrace_tpu.models import mesh as mt


def main():
    # irregular "designer" mesh: coarse hexagon with a custom height profile
    bumpy = mt.hexagonal_mesh(1.0, 5)
    r2 = np.sum(bumpy.points[:, :2] ** 2, axis=1)
    bumpy.points[:, 2] = 0.4 * np.exp(-3 * r2)  # gaussian bump lens

    # regular optimization mesh at higher resolution
    base = mt.hexagonal_mesh(1.0, 12)

    flat, initial_params = mt.planar_interpolated_remesh(bumpy, base)
    print(f"bumpy: {bumpy.n_points} verts -> base: {base.n_points} verts")
    print(f"initial parameter range: [{initial_params.min():.4f}, "
          f"{initial_params.max():.4f}] (expected peak ~0.4)")
    assert abs(initial_params.max() - 0.4) < 0.02

    # the flattened mesh + params plug directly into a parametric boundary
    from tensorflowraytrace_tpu.models import boundaries as bd

    b = bd.ParametricTriangleBoundary(flat, bd.FromVectorVG((0.0, 0.0, 1.0)),
                                      initial_parameters=0.0)
    surf = b.build(b.init_params() + initial_params.astype(np.float32))
    peak = float(np.asarray(surf.vp[:, 2]).max())
    print(f"rebuilt surface peak height: {peak:.4f}")

    out = mt.planar_interpolated_remesh(bumpy, base, flatten=False)
    out.save("remeshed.stl")
    print("saved remeshed.stl")


if __name__ == "__main__":
    main()
