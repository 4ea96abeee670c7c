"""AOT export: serialize compiled trace / training-step programs.

The reference has no deployment story -- every run re-traces Python through
TF eager.  TPU-native serving wants the opposite: compile ONCE, ship the
artifact, run it from any process (including ones without this package or
its Python dependencies) via ``jax.export``'s versioned StableHLO
serialization.

Typical uses:

* freeze a finished lens design's forward trace and hand it to an
  evaluation/serving job (no scene-build code needed at load time);
* pre-compile the training step on a dev box for a specific shape and load
  it on the pod (cross-platform lowering: export on CPU *for* TPU with
  ``platforms=("tpu",)``);
* archive the exact compiled program alongside checkpoint + STL so a design
  is reproducible bit-for-bit later.

The artifact embeds the program, the input/output tree structure, shapes,
dtypes and shardings; calling convention is exactly the original function's
flattened args.
"""

from __future__ import annotations

import pickle
from typing import Callable, Optional, Sequence

import jax
from jax import export as _jexport


def _register_serializations():
    """Register the package's pytree dataclasses for jax.export: the
    in/out tree structure of an exported program is part of its calling
    convention and must serialize with it.  Auxdata (the meta fields) is
    pickled -- artifacts are trusted (you made them)."""
    from tensorflowraytrace_tpu.engine import Projection, TraceResult
    from tensorflowraytrace_tpu.models.rays import RaySet
    from tensorflowraytrace_tpu.models.surfaces import (
        ArcSet, Scene2D, Scene3D, SegmentSet, TriangleSet,
    )

    for t in (RaySet, SegmentSet, ArcSet, TriangleSet, Scene2D, Scene3D,
              Projection, TraceResult):
        try:
            _jexport.register_pytree_node_serialization(
                t,
                serialized_name=f"tensorflowraytrace_tpu.{t.__name__}",
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads,
            )
        except ValueError:  # pragma: no cover - double import/registration
            pass


_register_serializations()


def export_fn(fn: Callable, *example_args, platforms: Optional[Sequence[str]] = None,
              **example_kwargs) -> bytes:
    """Serialize ``jit(fn)`` lowered for ``example_args``' shapes/dtypes.

    ``example_args`` may be real arrays or ``jax.ShapeDtypeStruct``s (no
    data needed).  ``platforms``: lowering targets, e.g. ``("tpu",)`` or
    ``("tpu", "cpu")`` for one artifact that runs on both; defaults to the
    current backend.  Returns the serialized bytes.
    """
    jitted = fn if isinstance(fn, jax.stages.Wrapped) else jax.jit(fn)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = _jexport.export(jitted, **kwargs)(*example_args,
                                                 **example_kwargs)
    return bytes(exported.serialize())


def load_fn(blob: bytes) -> Callable:
    """Deserialize an :func:`export_fn` artifact into a callable.

    The callable takes the original (flattened-pytree) arguments and runs
    the embedded compiled program on the current backend -- no package code
    from export time is needed.
    """
    exported = _jexport.deserialize(bytearray(blob))
    return exported.call


def save_exported(path: str, fn: Callable, *example_args, **kw) -> None:
    """``export_fn`` straight to a file."""
    blob = export_fn(fn, *example_args, **kw)
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str) -> Callable:
    """Load a :func:`save_exported` artifact."""
    with open(path, "rb") as f:
        return load_fn(f.read())


def export_trace(scene, materials, cfg, example_rays,
                 platforms: Optional[Sequence[str]] = None) -> bytes:
    """Freeze a scene's forward trace: returns an artifact whose callable
    maps a RaySet (of the example's shape/dtype) to the final
    ``TraceResult.rays`` RaySet.  The scene, materials and config are baked
    into the program as constants -- the serving side needs no scene-build
    code, only ray data."""
    from tensorflowraytrace_tpu.engine import trace

    materials = tuple(materials or ())

    def fwd(rays):
        return trace(rays, scene, materials, cfg).rays

    shapes = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_rays)
    return export_fn(fwd, shapes, platforms=platforms)
