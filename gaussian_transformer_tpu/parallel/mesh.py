"""Device mesh construction and sharding rules.

Axes:
  * ``data``  — camera/batch parallelism (losses averaged, grads psum'd),
  * ``gauss`` — the Gaussian capacity axis (projection is embarrassingly
    parallel over primitives; the global depth sort / tile binning all-gathers
    the small projected representation, not the raw SH parameters).

Multi-host: call ``init_distributed()`` once per process before ``make_mesh``;
on a pod slice the mesh spans all hosts' local devices over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_transformer_tpu.train.optim import PARAM_LEAVES


def init_distributed(coordinator_address: Optional[str] = None, **kw) -> None:
    """jax.distributed.initialize wrapper (no-op if already initialized)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kw)
    except RuntimeError:
        pass  # already initialized


def make_mesh(devices: Optional[Sequence] = None, data: int = 1, gauss: Optional[int] = None) -> Mesh:
    """Build a ("data", "gauss") mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if gauss is None:
        assert n % data == 0, f"{n} devices not divisible by data={data}"
        gauss = n // data
    assert data * gauss == n
    arr = np.asarray(devices).reshape(data, gauss)
    return Mesh(arr, axis_names=("data", "gauss"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def scene_sharding(mesh: Mesh):
    """NamedSharding pytree for a GaussianScene: every per-Gaussian leaf is
    sharded on its capacity axis over ``gauss`` (replicated over ``data``)."""
    gauss = NamedSharding(mesh, P("gauss"))
    return {
        "xyz": gauss,
        "features_dc": gauss,
        "features_rest": gauss,
        "scaling": gauss,
        "rotation": gauss,
        "opacity": gauss,
        "alive": gauss,
    }


def shard_scene(scene, mesh: Mesh):
    """Device-put a GaussianScene according to scene_sharding. The capacity must
    be divisible by the gauss axis size (capacity padding makes this free)."""
    sh = scene_sharding(mesh)
    updates = {k: jax.device_put(getattr(scene, k), s) for k, s in sh.items()}
    return scene.replace(**updates)


def adam_sharding(mesh: Mesh, adam):
    gauss = NamedSharding(mesh, P("gauss"))
    rep = replicated(mesh)
    return type(adam)(
        mu={k: gauss for k in PARAM_LEAVES},
        nu={k: gauss for k in PARAM_LEAVES},
        counts={k: rep for k in PARAM_LEAVES},
    )


def camera_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis of stacked camera arrays over ``data``."""
    return NamedSharding(mesh, P("data"))
