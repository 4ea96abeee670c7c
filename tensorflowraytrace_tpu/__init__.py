"""tensorflowraytrace_tpu: a TPU-native differentiable optical ray tracer.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ecpoppenheimer/TensorFlowRayTrace (mounted read-only at /root/reference):
differentiable 2D/3D ray tracing for designing lenses and light guides by
gradient descent, redesigned for TPU hardware -- static shapes, lax.scan
bounce loops, tiled Pallas intersection kernels, and ray-axis sharding over
device meshes.

Layer map (mirrors SURVEY.md section 1):
  ops/        geometry + intersection kernels, materials, spectrum
  models/     rays, surfaces, sources, distributions, boundaries, meshes
  engine      the multi-bounce trace loop
  sequential  analytic ordered-asphere tracer (classical lens design)
  paraxial    first-order analysis: ABCD, cardinal points, Petzval
  operations  pluggable per-bounce reactions
  optim       gradient processing + training routines
  parallel/   multi-chip sharding (shard_map over a ray mesh)
  analysis    imaging tests, histogram losses
  drawing     matplotlib visualization
  utils/      STL I/O, checkpointing, PRNG helpers
"""

from tensorflowraytrace_tpu import config
from tensorflowraytrace_tpu.config import (
    ACTIVE, DEAD, FINISHED, OPTICAL, STOP, STOPPED, TARGET,
)
from tensorflowraytrace_tpu.engine import (
    TraceConfig, TraceResult, bounce_count_fold, landing_histogram_fold,
    landing_sum_fold, newly_terminated, path_length_fold, trace,
)
from tensorflowraytrace_tpu.models.acceleration import (
    morton_sort_segments, morton_sort_triangles,
)
from tensorflowraytrace_tpu.models.rays import RaySet, concat_rays
from tensorflowraytrace_tpu.models.surfaces import (
    ArcSet, Scene2D, Scene3D, SegmentSet, TriangleSet,
)
from tensorflowraytrace_tpu.paraxial import (
    FieldCurves, GaussianBeamResult, ParaxialSystem, SeidelSums, StopSolve,
    axial_color, field_curves, gaussian_beam, lateral_color,
    paraxial_system, paraxial_trace, petzval_sum, seidel_sums, solve_stop,
)
from tensorflowraytrace_tpu.sequential import (
    AsphereStack, SequentialResult, collimated_bundle, trace_sequential,
)

__version__ = "0.1.0"
