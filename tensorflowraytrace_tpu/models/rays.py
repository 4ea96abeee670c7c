"""RaySet: the static-shape ray container.

The reference stores rays as a dict of equal-length 1-D float64 tensors with
string keys (x_start, ..., wavelength, rank; /root/reference/tfrt/sources.py:9-13)
and *compacts* rays into active/finished/stopped/dead lists with
``tf.boolean_mask`` every bounce (engine.py:1596-1677).  Dynamic shapes are
poison for XLA/TPU, so this rebuild keeps **one slot per ray for the whole
trace**: a ray that dies or finishes keeps its slot and merely changes its
``state`` code; the bounce loop is a ``lax.scan`` over a fixed-size array.

This also makes the reference's "simple ray inheritance" (engine.py:2242-2281)
automatic: extra per-ray fields (wavelength, rank, oldest_ancestor, ...)
simply stay in their slot when a child ray replaces its parent.

Coordinates are stored SoA-as-vectors: ``p0``/``p1`` of shape (N, dim).
Dict-style access (``rays["x_start"]``) is provided for API parity with the
reference's field signatures (engine.py:18-21).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowraytrace_tpu.config import ACTIVE, DEAD, FINISHED, STOPPED, resolve_dtype

_COORD_KEYS_2D = {"x_start": (0, 0), "y_start": (0, 1), "x_end": (1, 0), "y_end": (1, 1)}
_COORD_KEYS_3D = {
    "x_start": (0, 0), "y_start": (0, 1), "z_start": (0, 2),
    "x_end": (1, 0), "y_end": (1, 1), "z_end": (1, 2),
}


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["p0", "p1", "wavelength", "state", "fields"],
    meta_fields=[],
)
@dataclass
class RaySet:
    """A batch of rays (line segments interpreted as semi-infinite rays).

    p0, p1 : (N, dim) start / end points.  dim is 2 or 3.
    wavelength : (N,) in nm.
    state : (N,) int32 life-cycle code (ACTIVE/FINISHED/STOPPED/DEAD).
    fields : extra per-ray data riding in the slot (rank, oldest_ancestor,
        intensity, ...); values are arrays with leading dimension N.
    """

    p0: jax.Array
    p1: jax.Array
    wavelength: jax.Array
    state: jax.Array
    fields: Dict[str, jax.Array] = field(default_factory=dict)

    # ---------------- construction ----------------

    @staticmethod
    def make(p0, p1, wavelength=None, state=None, fields=None, dtype=None):
        dtype = resolve_dtype(dtype)
        p0 = jnp.asarray(p0, dtype=dtype)
        p1 = jnp.asarray(p1, dtype=dtype)
        n = p0.shape[0]
        if wavelength is None:
            wavelength = jnp.zeros((n,), dtype=dtype)
        else:
            wavelength = jnp.broadcast_to(jnp.asarray(wavelength, dtype=dtype), (n,))
        if state is None:
            state = jnp.full((n,), ACTIVE, dtype=jnp.int32)
        fields = dict(fields or {})
        fields = {k: jnp.asarray(v) for k, v in fields.items()}
        return RaySet(p0=p0, p1=p1, wavelength=wavelength, state=state, fields=fields)

    @staticmethod
    def from_dict(d, dtype=None):
        """Build from a reference-style field dict (x_start, y_start, ...)."""
        dtype = resolve_dtype(dtype)
        dim = 3 if "z_start" in d else 2
        axes = "xyz"[:dim]
        p0 = jnp.stack([jnp.asarray(d[f"{a}_start"], dtype=dtype) for a in axes], axis=1)
        p1 = jnp.stack([jnp.asarray(d[f"{a}_end"], dtype=dtype) for a in axes], axis=1)
        coord_keys = _COORD_KEYS_3D if dim == 3 else _COORD_KEYS_2D
        extras = {k: v for k, v in d.items() if k not in coord_keys and k != "wavelength"}
        return RaySet.make(p0, p1, d.get("wavelength"), fields=extras, dtype=dtype)

    # ---------------- shape info ----------------

    @property
    def dim(self) -> int:
        return self.p0.shape[-1]

    @property
    def n_rays(self) -> int:
        return self.p0.shape[0]

    def __len__(self) -> int:
        return self.n_rays

    # ---------------- reference-style field access ----------------

    def __getitem__(self, key):
        coord = (_COORD_KEYS_3D if self.dim == 3 else _COORD_KEYS_2D).get(key)
        if coord is not None:
            arr = self.p0 if coord[0] == 0 else self.p1
            return arr[:, coord[1]]
        if key == "wavelength":
            return self.wavelength
        return self.fields[key]

    def keys(self):
        base = list(_COORD_KEYS_3D if self.dim == 3 else _COORD_KEYS_2D)
        return base + ["wavelength"] + list(self.fields)

    def with_field(self, name, value):
        fields = dict(self.fields)
        fields[name] = jnp.asarray(value)
        return dataclasses.replace(self, fields=fields)

    # ---------------- state masks ----------------

    @property
    def active_mask(self):
        return self.state == ACTIVE

    @property
    def finished_mask(self):
        return self.state == FINISHED

    @property
    def stopped_mask(self):
        return self.state == STOPPED

    @property
    def dead_mask(self):
        return self.state == DEAD

    def select(self, mask):
        """Host-side compaction (for drawing / analysis outside jit).

        The jit-side never compacts -- losses weight by mask instead.
        """
        mask = np.asarray(mask)
        return RaySet(
            p0=jnp.asarray(np.asarray(self.p0)[mask]),
            p1=jnp.asarray(np.asarray(self.p1)[mask]),
            wavelength=jnp.asarray(np.asarray(self.wavelength)[mask]),
            state=jnp.asarray(np.asarray(self.state)[mask]),
            fields={k: jnp.asarray(np.asarray(v)[mask]) for k, v in self.fields.items()},
        )

    @property
    def finished(self):
        return self.select(self.finished_mask)

    @property
    def active(self):
        return self.select(self.active_mask)

    @property
    def stopped(self):
        return self.select(self.stopped_mask)

    @property
    def dead(self):
        return self.select(self.dead_mask)


def concat_rays(ray_sets):
    """Concatenate ray sets (the reference's ``amalgamate``, engine.py:50-76).

    Keeps only extra fields common to every set.
    """
    ray_sets = [r for r in ray_sets if r is not None and r.n_rays > 0]
    if not ray_sets:
        raise ValueError("concat_rays: nothing to concatenate")
    common = set(ray_sets[0].fields)
    for r in ray_sets[1:]:
        common &= set(r.fields)
    return RaySet(
        p0=jnp.concatenate([r.p0 for r in ray_sets], axis=0),
        p1=jnp.concatenate([r.p1 for r in ray_sets], axis=0),
        wavelength=jnp.concatenate([r.wavelength for r in ray_sets], axis=0),
        state=jnp.concatenate([r.state for r in ray_sets], axis=0),
        fields={
            k: jnp.concatenate([r.fields[k] for r in ray_sets], axis=0) for k in common
        },
    )
