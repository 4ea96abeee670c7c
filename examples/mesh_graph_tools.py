"""Mesh-graph machinery visual checks: relationships, generations, the
gradient accumulator, and the smoother.

Rebuilds four interactive reference checks headless (one PNG, printed
assertions):
* dev/graph_relationships.py / graph_relationships_1p.py -- BFS vertex
  relationships from a top parent, drawn as connection arrows + generation
  coloring (mesh_tools.py:509-552).
* dev/gradient_accumulator.py -- the (n, n) ancestor-accumulation matrix:
  perturbing the gradient of ONE vertex moves it and every descendant.
* dev/mesh_smoothing.py -- the row-normalized neighbor-weight smoother:
  one spiked vertex relaxes toward its neighbors under repeated smoothing.

Run:  python examples/mesh_graph_tools.py [--show]
"""

import argparse

import numpy as np

from tensorflowraytrace_tpu.models import mesh as mt


def main(show=False):
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mesh = mt.hexagonal_mesh(1.0, 4)
    top = mt.get_closest_point(mesh, (0.0, 0.0, 0.0))
    generations = mt.find_generations(mesh, top)   # list of BFS waves
    _, children, _, _ = mt.find_all_relationships(mesh, top)
    vum, accumulator = mt.mesh_parametrization_tools(mesh, top)
    smoother = mt.mesh_smoothing_tool(mesh, mt.gaussian_weights(0.5, 3))

    fig = plt.figure(figsize=(14, 14))
    ax1 = fig.add_subplot(2, 2, 1, projection="3d")
    ax2 = fig.add_subplot(2, 2, 2, projection="3d")
    ax3 = fig.add_subplot(2, 2, 3)
    ax4 = fig.add_subplot(2, 2, 4)

    # ---- panel 1: parent->child connections ----
    ax1.set_title("vertex relationships (BFS from the center vertex)")
    ax1.set_aspect("equal")
    mt.visualize_connections(ax1, mesh, children)
    n_children = sum(len(v) for v in children)
    print(f"relationships: {n_children} parent->child edges from vertex {top}")

    # ---- panel 2: generations ----
    ax2.set_title("BFS generations")
    ax2.set_aspect("equal")
    mt.visualize_generations(ax2, mesh, generations)
    n_gen = len(generations)
    reached = sum(len(w) for w in generations)
    print(f"generations: {n_gen} rings; vertices reached: "
          f"{reached}/{mesh.n_points}")
    assert reached == mesh.n_points

    # ---- panel 3: accumulator = ancestor matrix ----
    acc = np.asarray(accumulator)
    # a unit gradient on the top parent reaches every vertex; a unit
    # gradient on a rim vertex reaches only itself
    reach_top = int((acc[:, top] != 0).sum())
    rim = int(next(iter(generations[-1])))
    reach_rim = int((acc[:, rim] != 0).sum())
    print(f"accumulator: grad on center vertex reaches {reach_top}/"
          f"{acc.shape[0]} vertices; grad on a rim vertex reaches {reach_rim}")
    assert reach_top == acc.shape[0] and reach_rim == 1
    ax3.set_title("gradient accumulator (ancestor matrix)")
    ax3.imshow(acc, cmap="Blues", interpolation="nearest")

    # ---- panel 4: smoothing a spiked vertex ----
    z = np.zeros(mesh.n_points)
    z[top] = 1.0
    sm = np.asarray(smoother)
    z1 = sm @ z
    z3 = np.linalg.matrix_power(sm, 3) @ z
    print(f"smoother: spike 1.0 -> {z1[top]:.3f} after 1 pass "
          f"-> {z3[top]:.3f} after 3 (mass spreads to neighbors)")
    assert z1[top] < 1.0 and z3[top] < z1[top]
    ax4.set_title("smoother: spiked vertex after 0/1/3 passes")
    level = np.zeros(mesh.n_points, dtype=int)
    for g, wave in enumerate(generations):
        for v in wave:
            level[v] = g
    order = np.argsort(level, kind="stable")
    ax4.plot(z[order], label="spike")
    ax4.plot(z1[order], label="1 pass")
    ax4.plot(z3[order], label="3 passes")
    ax4.legend()

    if show:
        plt.show()
    else:
        fig.savefig("mesh_graph_tools.png", dpi=100)
        print("saved mesh_graph_tools.png")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--show", action="store_true")
    main(**vars(ap.parse_args()))
