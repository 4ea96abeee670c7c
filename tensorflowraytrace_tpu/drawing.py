"""Visualization: matplotlib drawers for rays, boundaries, and goals.

Reference counterpart: /root/reference/tfrt/drawing.py (mpl for 2D, pyvista
for 3D).  pyvista is unavailable here, so the 3D drawers render through
matplotlib's mplot3d (Line3DCollection / Poly3DCollection) instead; the data
contract and class names match the reference.  All drawing is host-side --
device arrays are pulled with np.asarray.

Parity map:
  RED..PURPLE, RAINBOW_6     <- drawing.py:53-60 (re-exported from ops.spectrum)
  form_mpl_line_syntax       <- drawing.py:69
  RayDrawer2D                <- drawing.py:79   (LineCollection colored by
                                wavelength via the spectrumRGB colormap)
  RayDrawer3D                <- drawing.py:221  (3D ray lines)
  ArcDrawer                  <- drawing.py:347  (arc patches + norm arrows)
  SegmentDrawer              <- drawing.py:612  (segments + norm arrows)
  TriangleDrawer             <- drawing.py:811  (mesh faces + norm arrows)
  GoalDrawer3D               <- drawing.py:952  (arrows from trace output to
                                goal points)
  disable_figure_key_commands<- drawing.py:1027
  redraw_current_figure      <- drawing.py:1034
"""

from __future__ import annotations

import math

import numpy as np

import matplotlib as mpl
import matplotlib.pyplot as plt

from tensorflowraytrace_tpu.ops.spectrum import (  # noqa: F401 (re-exports)
    BLUE, GREEN, ORANGE, PURPLE, RAINBOW_6, RED, VISIBLE_MAX, VISIBLE_MIN,
    YELLOW, rgb,
)

PI = math.pi
UNIT_TO_NUMBER = {"nm": 1, "um": 1000}


def _get(rays, key):
    """Field access that works for RaySet, dicts, and ReadOnly-style sets."""
    return np.asarray(rays[key])


def form_mpl_line_syntax(rays):
    """Ray set -> list of [(x0, y0), (x1, y1)] segments (drawing.py:69-74)."""
    xs = _get(rays, "x_start")
    ys = _get(rays, "y_start")
    xe = _get(rays, "x_end")
    ye = _get(rays, "y_end")
    return [[(a, b), (c, d)] for a, b, c, d in zip(xs, ys, xe, ye)]


def spectrum_colormap():
    return mpl.colors.ListedColormap(rgb())


class RayDrawer2D:
    """Draw 2D rays into an mpl axis as a LineCollection colored by
    wavelength (drawing.py:79-217)."""

    def __init__(self, ax, rays=None, min_wavelength=VISIBLE_MIN,
                 max_wavelength=VISIBLE_MAX, units="nm", style="-",
                 colormap=None):
        self.ax = ax
        self.rays = rays
        self._style = style
        try:
            self._unit = UNIT_TO_NUMBER[units]
        except KeyError as e:
            raise ValueError(f"RayDrawer: invalid units {units!r}; use 'nm' "
                             "or 'um'") from e
        self._line_collection = mpl.collections.LineCollection(
            [], linestyles=style, cmap=colormap or spectrum_colormap())
        self.set_wavelength_limits(min_wavelength, max_wavelength)
        self.ax.add_collection(self._line_collection)

    def draw(self):
        if self.rays is None or len(_get(self.rays, "x_start")) == 0:
            self._line_collection.set_segments([])
            return
        self._line_collection.set_segments(form_mpl_line_syntax(self.rays))
        self._line_collection.set_array(self._unit * _get(self.rays, "wavelength"))

    def set_wavelength_limits(self, lo, hi):
        self._line_collection.norm = plt.Normalize(self._unit * lo,
                                                   self._unit * hi)


class SegmentDrawer:
    """Draw 2D segment boundaries with optional norm-direction arrows
    (drawing.py:612-808).  Accepts a SegmentSet or a field dict."""

    def __init__(self, ax, segments=None, color="black", style="-",
                 draw_norm_arrows=True, norm_arrow_length=0.1):
        self.ax = ax
        self.segments = segments
        self.color = color
        self.draw_norm_arrows = draw_norm_arrows
        self.norm_arrow_length = norm_arrow_length
        self._line_collection = mpl.collections.LineCollection(
            [], colors=color, linestyles=style)
        self.ax.add_collection(self._line_collection)
        self._arrows = []

    def draw(self):
        for a in self._arrows:
            a.remove()
        self._arrows = []
        if self.segments is None:
            self._line_collection.set_segments([])
            return
        self._line_collection.set_segments(form_mpl_line_syntax(self.segments))
        if self.draw_norm_arrows:
            xs = _get(self.segments, "x_start")
            ys = _get(self.segments, "y_start")
            xe = _get(self.segments, "x_end")
            ye = _get(self.segments, "y_end")
            cx = (xs + xe) / 2
            cy = (ys + ye) / 2
            theta = np.arctan2(ye - ys, xe - xs) + PI / 2
            L = self.norm_arrow_length
            for x, y, t in zip(cx, cy, theta):
                self._arrows.append(self.ax.annotate(
                    "", xy=(x + L * np.cos(t), y + L * np.sin(t)), xytext=(x, y),
                    arrowprops=dict(arrowstyle="->", color=self.color)))


class ArcDrawer:
    """Draw 2D arc boundaries with optional norm arrows
    (drawing.py:347-609).  Accepts an ArcSet or a field dict."""

    def __init__(self, ax, arcs=None, color="cyan", style="-",
                 draw_norm_arrows=True, norm_arrow_count=5,
                 norm_arrow_length=0.1):
        self.ax = ax
        self.arcs = arcs
        self.color = color
        self.style = style
        self.draw_norm_arrows = draw_norm_arrows
        self.norm_arrow_count = norm_arrow_count
        self.norm_arrow_length = norm_arrow_length
        self._patches = []
        self._arrows = []

    def draw(self):
        for p in self._patches:
            p.remove()
        for a in self._arrows:
            a.remove()
        self._patches = []
        self._arrows = []
        if self.arcs is None:
            return
        xc = _get(self.arcs, "x_center")
        yc = _get(self.arcs, "y_center")
        a0 = _get(self.arcs, "angle_start")
        a1 = _get(self.arcs, "angle_end")
        r = _get(self.arcs, "radius")
        for x, y, s, e, rad in zip(xc, yc, a0, a1, r):
            arc = mpl.patches.Arc(
                (x, y), 2 * abs(rad), 2 * abs(rad),
                theta1=np.degrees(s), theta2=np.degrees(e),
                color=self.color, linestyle=self.style, fill=False)
            self.ax.add_patch(arc)
            self._patches.append(arc)
            if self.draw_norm_arrows:
                # norm points outward for positive radius, inward for negative
                # (reference convention, engine.py:666-670)
                span = (e - s) % (2 * PI) or 2 * PI
                angles = s + span * np.linspace(0.1, 0.9, self.norm_arrow_count)
                sign = 1.0 if rad >= 0 else -1.0
                L = self.norm_arrow_length
                for t in angles:
                    px = x + abs(rad) * np.cos(t)
                    py = y + abs(rad) * np.sin(t)
                    self._arrows.append(self.ax.annotate(
                        "", xy=(px + sign * L * np.cos(t),
                                py + sign * L * np.sin(t)),
                        xytext=(px, py),
                        arrowprops=dict(arrowstyle="->", color=self.color)))


class RayDrawer3D:
    """Draw 3D rays into an mplot3d axis, colored by wavelength
    (drawing.py:221-344; pyvista replaced by Line3DCollection)."""

    def __init__(self, ax, rays=None, min_wavelength=VISIBLE_MIN,
                 max_wavelength=VISIBLE_MAX, colormap=None):
        from mpl_toolkits.mplot3d.art3d import Line3DCollection

        self.ax = ax
        self.rays = rays
        self._collection = Line3DCollection(
            [], cmap=colormap or spectrum_colormap())
        self._collection.norm = plt.Normalize(min_wavelength, max_wavelength)
        # autolim=False: mpl's autoscale chokes on an initially-empty 3D
        # collection; callers set their own axis limits anyway
        try:
            self.ax.add_collection3d(self._collection, autolim=False)
        except TypeError:  # older matplotlib without the autolim kwarg
            self.ax.add_collection3d(self._collection)

    def draw(self):
        if self.rays is None or len(_get(self.rays, "x_start")) == 0:
            self._collection.set_segments([])
            return
        p0 = np.stack([_get(self.rays, "x_start"), _get(self.rays, "y_start"),
                       _get(self.rays, "z_start")], axis=1)
        p1 = np.stack([_get(self.rays, "x_end"), _get(self.rays, "y_end"),
                       _get(self.rays, "z_end")], axis=1)
        self._collection.set_segments(np.stack([p0, p1], axis=1))
        self._collection.set_array(_get(self.rays, "wavelength"))


class TriangleDrawer:
    """Draw a triangle boundary / mesh with optional norm arrows
    (drawing.py:811-949).  Accepts a TriangleSet, TriMesh, or anything with
    xp..z2 fields."""

    def __init__(self, ax, surface=None, color="cyan", show_edges=False,
                 draw_norm_arrows=False, norm_arrow_length=0.1, alpha=0.7,
                 draw_parameter_arrows=False, parameter_arrow_length=0.1,
                 boundary=None, params=None):
        self.ax = ax
        self.surface = surface
        self.color = color
        self.show_edges = show_edges
        self.draw_norm_arrows = draw_norm_arrows
        self.norm_arrow_length = norm_arrow_length
        self.alpha = alpha
        # parameter-vector debug arrows (reference drawing.py:913-929):
        # one arrow per vertex along the direction its parameter moves it.
        # ``boundary`` is a parametric builder (models/boundaries.py) with
        # .vectors and params_to_vertices; ``params`` the current parameters
        # (None -> the zero mesh).
        self.draw_parameter_arrows = draw_parameter_arrows
        self.parameter_arrow_length = parameter_arrow_length
        self.boundary = boundary
        self.params = params
        self.norm_arrow_visibility = True
        self.parameter_arrow_visibility = True
        self._poly = None
        self._quiver = None
        self._param_quiver = None

    def toggle_norm_arrow_visibility(self):
        self.norm_arrow_visibility = not self.norm_arrow_visibility
        self.draw()

    def toggle_parameter_arrow_visibility(self):
        self.parameter_arrow_visibility = not self.parameter_arrow_visibility
        self.draw()

    def _triangles(self):
        s = self.surface
        if hasattr(s, "points") and hasattr(s, "faces"):  # TriMesh
            return s.points[s.faces]
        vp = np.stack([_get(s, "xp"), _get(s, "yp"), _get(s, "zp")], axis=1)
        v1 = np.stack([_get(s, "x1"), _get(s, "y1"), _get(s, "z1")], axis=1)
        v2 = np.stack([_get(s, "x2"), _get(s, "y2"), _get(s, "z2")], axis=1)
        return np.stack([vp, v1, v2], axis=1)

    def draw(self):
        from mpl_toolkits.mplot3d.art3d import Poly3DCollection

        if self._poly is not None:
            self._poly.remove()
            self._poly = None
        if self._quiver is not None:
            self._quiver.remove()
            self._quiver = None
        if self._param_quiver is not None:
            self._param_quiver.remove()
            self._param_quiver = None
        if self.surface is None:
            return
        tris = self._triangles()
        self._poly = Poly3DCollection(
            tris, facecolor=self.color, alpha=self.alpha,
            edgecolor="black" if self.show_edges else None)
        self.ax.add_collection3d(self._poly)
        if self.draw_norm_arrows and self.norm_arrow_visibility:
            centers = tris.mean(axis=1)
            n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 1])
            n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-30)
            self._quiver = self.ax.quiver(
                centers[:, 0], centers[:, 1], centers[:, 2],
                n[:, 0], n[:, 1], n[:, 2],
                length=self.norm_arrow_length, color=self.color)
        if (self.draw_parameter_arrows and self.parameter_arrow_visibility
                and self.boundary is not None):
            b = self.boundary
            if self.params is not None:
                verts = np.asarray(b.params_to_vertices(self.params))
            else:
                verts = np.asarray(b.zero)
            vecs = np.asarray(b.vectors)
            self._param_quiver = self.ax.quiver(
                verts[:, 0], verts[:, 1], verts[:, 2],
                vecs[:, 0], vecs[:, 1], vecs[:, 2],
                length=self.parameter_arrow_length, color="red")


class GoalDrawer3D:
    """Draw arrows from trace outputs to their goal points
    (drawing.py:952-1024)."""

    def __init__(self, ax, color="green"):
        self.ax = ax
        self.color = color
        self.output = None
        self.goal = None
        self._quiver = None

    def draw(self):
        if self._quiver is not None:
            self._quiver.remove()
            self._quiver = None
        if self.output is None or self.goal is None:
            return
        out = np.asarray(self.output)
        goal = np.asarray(self.goal)
        d = goal - out
        self._quiver = self.ax.quiver(
            out[:, 0], out[:, 1], out[:, 2], d[:, 0], d[:, 1], d[:, 2],
            color=self.color)


def history_rays(result, bounce=None):
    """Flatten a TraceResult's per-bounce history into one drawable ray dict:
    the rebuild's replacement for the reference's engine.all_rays history
    lists.  Includes each slot only for bounces where it was still live."""
    if result.history_p0 is None:
        raise ValueError("trace was run without keep_history=True")
    p0 = np.asarray(result.history_p0)
    p1 = np.asarray(result.history_p1)
    alive = np.asarray(result.history_alive)
    n_bounces = p0.shape[0]
    wl = np.broadcast_to(np.asarray(result.rays.wavelength), alive.shape)
    if bounce is not None:
        sel = alive[bounce]
        return _ray_dict(p0[bounce][sel], p1[bounce][sel], wl[bounce][sel])
    mask = alive.reshape(-1)
    dim = p0.shape[-1]
    return _ray_dict(p0.reshape(-1, dim)[mask], p1.reshape(-1, dim)[mask],
                     wl.reshape(-1)[mask])


def _ray_dict(p0, p1, wl):
    out = {"x_start": p0[:, 0], "y_start": p0[:, 1],
           "x_end": p1[:, 0], "y_end": p1[:, 1], "wavelength": wl}
    if p0.shape[1] == 3:
        out["z_start"] = p0[:, 2]
        out["z_end"] = p1[:, 2]
    return out


def disable_figure_key_commands():
    """Disable mpl's default key bindings (drawing.py:1027-1032)."""
    for key, value in plt.rcParams.items():
        if "keymap" in key:
            plt.rcParams[key] = []


def redraw_current_figure():
    plt.gcf().canvas.draw()


# ======================================================================
# pyvista plotter drawers (guarded: the dev image has no pyvista, but
# users who install it get the reference's live-plotter workflow)
# ======================================================================

try:  # pragma: no cover - exercised only where pyvista is installed
    import pyvista as _pv

    HAS_PYVISTA = True
except ImportError:
    _pv = None
    HAS_PYVISTA = False


def _require_pyvista(who):
    if not HAS_PYVISTA:
        raise ImportError(
            f"{who} renders into a pyvista.Plotter, but pyvista is not "
            "installed; use the matplotlib drawer of the same name instead")


class PvRayDrawer3D:
    """Draw a ray set into a live ``pyvista.Plotter``, colored by wavelength
    (the reference's RayDrawer3D, drawing.py:221-344; the mpl ``RayDrawer3D``
    above is the headless stand-in).  Same dict signature: x/y/z_start,
    x/y/z_end, wavelength."""

    def __init__(self, plot, rays=None, min_wavelength=VISIBLE_MIN,
                 max_wavelength=VISIBLE_MAX, colormap=None):
        _require_pyvista("PvRayDrawer3D")
        self.plot = plot
        self.rays = rays
        self.colormap = colormap or spectrum_colormap()
        self._min_wavelength = min_wavelength
        self._max_wavelength = max_wavelength
        self._mesh = None
        self._actor = None

    def set_wavelength_limits(self, lo, hi):
        self._min_wavelength = lo
        self._max_wavelength = hi

    def draw(self):
        if self.rays is None or len(_get(self.rays, "x_start")) == 0:
            if self._actor is not None:
                self.plot.remove_actor(self._actor)
                self._actor = None
                self._mesh = None
            return
        p0 = np.stack([_get(self.rays, "x_start"), _get(self.rays, "y_start"),
                       _get(self.rays, "z_start")], axis=1)
        p1 = np.stack([_get(self.rays, "x_end"), _get(self.rays, "y_end"),
                       _get(self.rays, "z_end")], axis=1)
        n = p0.shape[0]
        # pyvista line cells: [2, start_idx, end_idx] per ray
        cells = np.column_stack([np.full(n, 2), np.arange(n),
                                 np.arange(n) + n]).astype(np.int64)
        if self._mesh is None:
            self._mesh = _pv.PolyData()
        self._mesh.points = np.concatenate([p0, p1], axis=0)
        self._mesh.lines = cells
        self._mesh["wavelength"] = np.asarray(_get(self.rays, "wavelength"))
        if self._actor is None:
            # add ONCE; later draws mutate the shared PolyData in place --
            # re-adding every redraw would pile up actors in the plotter
            self._actor = self.plot.add_mesh(
                self._mesh, cmap=self.colormap,
                clim=(self._min_wavelength, self._max_wavelength))
        else:
            # clim is baked into the actor's mapper at add_mesh time, so a
            # set_wavelength_limits between draws must be re-applied here
            mapper = getattr(self._actor, "mapper", None)
            if mapper is not None:
                mapper.scalar_range = (self._min_wavelength,
                                       self._max_wavelength)


class PvTriangleDrawer:
    """Draw a triangle boundary into a ``pyvista.Plotter`` with toggleable
    norm / parameter debug arrows (reference TriangleDrawer,
    drawing.py:811-949)."""

    def __init__(self, plot, surface=None, color="cyan", show_edges=False,
                 draw_norm_arrows=False, norm_arrow_length=0.1,
                 draw_parameter_arrows=False, parameter_arrow_length=0.1,
                 boundary=None, params=None, opacity=1.0):
        _require_pyvista("PvTriangleDrawer")
        self.plot = plot
        self.surface = surface
        self.color = color
        self.show_edges = show_edges
        self.draw_norm_arrows = draw_norm_arrows
        self.norm_arrow_length = norm_arrow_length
        self.draw_parameter_arrows = draw_parameter_arrows
        self.parameter_arrow_length = parameter_arrow_length
        self.boundary = boundary
        self.params = params
        self.opacity = opacity
        self.norm_arrow_visibility = True
        self.parameter_arrow_visibility = True
        self._actor = None
        self._norm_actor = None
        self._param_actor = None

    def toggle_norm_arrow_visibility(self):
        self.norm_arrow_visibility = not self.norm_arrow_visibility
        self.draw()

    def toggle_parameter_arrow_visibility(self):
        self.parameter_arrow_visibility = not self.parameter_arrow_visibility
        self.draw()

    # same surface-format tolerance as the mpl TriangleDrawer
    _triangles = TriangleDrawer._triangles

    def draw(self):
        for name in ("_actor", "_norm_actor", "_param_actor"):
            actor = getattr(self, name)
            if actor is not None:
                self.plot.remove_actor(actor)
                setattr(self, name, None)
        if self.surface is None:
            return
        tris = np.asarray(self._triangles())
        n = tris.shape[0]
        points = tris.reshape(-1, 3)
        faces = np.column_stack(
            [np.full(n, 3), np.arange(0, 3 * n, 3),
             np.arange(1, 3 * n, 3), np.arange(2, 3 * n, 3)]).astype(np.int64)
        mesh = _pv.PolyData(points, faces)
        self._actor = self.plot.add_mesh(mesh, color=self.color,
                                         show_edges=self.show_edges,
                                         opacity=self.opacity)
        if self.draw_norm_arrows and self.norm_arrow_visibility:
            centers = tris.mean(axis=1)
            nvec = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 1])
            nvec /= np.maximum(np.linalg.norm(nvec, axis=1, keepdims=True),
                               1e-30)
            self._norm_actor = self.plot.add_arrows(
                centers, nvec, mag=self.norm_arrow_length, color=self.color)
        if (self.draw_parameter_arrows and self.parameter_arrow_visibility
                and self.boundary is not None):
            b = self.boundary
            verts = np.asarray(b.params_to_vertices(self.params)
                               if self.params is not None else b.zero)
            vecs = np.asarray(b.vectors)
            self._param_actor = self.plot.add_arrows(
                verts, vecs, mag=self.parameter_arrow_length, color="red")


class PvGoalDrawer3D:
    """Arrows from trace outputs to goal points in a ``pyvista.Plotter``
    (reference GoalDrawer3D, drawing.py:952-1024)."""

    def __init__(self, plot, color="green"):
        _require_pyvista("PvGoalDrawer3D")
        self.plot = plot
        self.color = color
        self.output = None
        self.goal = None
        self._actor = None

    def draw(self):
        if self._actor is not None:
            self.plot.remove_actor(self._actor)
            self._actor = None
        if self.output is None or self.goal is None:
            return
        out = np.asarray(self.output)
        goal = np.asarray(self.goal)
        self._actor = self.plot.add_arrows(out, goal - out, mag=1.0,
                                           color=self.color)
