"""Multi-chip parallelism: device mesh, shardings, and the sharded train step.

The reference has NO distributed layer at all (SURVEY.md §2.3 — single
hardcoded CUDA device); this subsystem is greenfield and TPU-native by design:

  * a named ``Mesh`` with axes ``("data", "gauss")`` — cameras ride the data
    axis, the Gaussian capacity axis is sharded over ``gauss`` (the 3DGS analog
    of tensor parallelism),
  * sharding is expressed with ``NamedSharding`` annotations on the jitted
    train step; XLA's SPMD partitioner inserts the ICI collectives (all-gather
    of projected splat data at the global depth sort, psum of parameter
    gradients) — the scaling-book recipe: annotate, let XLA place collectives,
  * ``jax.distributed`` initialization for multi-host pods.
"""

from gaussian_transformer_tpu.parallel.mesh import (
    make_mesh,
    scene_sharding,
    camera_batch_sharding,
    replicated,
)
from gaussian_transformer_tpu.parallel.step import (
    stack_cameras,
    make_sharded_train_step,
)

__all__ = [
    "make_mesh",
    "scene_sharding",
    "camera_batch_sharding",
    "replicated",
    "stack_cameras",
    "make_sharded_train_step",
]
