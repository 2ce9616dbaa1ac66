"""FSDP-style parameter/optimizer sharding for the transformer trainers.

The reference trains its flagship stacked model on one GPU (fp16,
``/root/reference/train_stacked_transformer.py:363-367``); at 1.9B params the
TPU port fits one chip only via bf16 + Adafactor. This module is the
multi-chip story for the transformer half of the framework: parameters and
optimizer state are sharded over a mesh axis, and XLA's SPMD partitioner
inserts the per-layer all-gathers (weights) and reduce-scatters (grads) that
make it behave like FSDP/ZeRO-3 — no NCCL-style hand-written bucketing, the
partitioner schedules the collectives to overlap with compute.

Design: each parameter leaf is sharded along its LARGEST dimension divisible
by the axis size (d_model or d_ff for the big matrices); small leaves
(norm scales, biases) stay replicated — sharding them would cost more in
collective latency than the bytes saved. Optimizer state follows the
parameter sharding leaf-for-leaf (optax states mirror the param tree
structure).

Validated by a sharded==unsharded loss equivalence test on the virtual
8-device CPU mesh (tests/test_parallel.py) and exercised by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FSDP_AXIS = "fsdp"


def make_fsdp_mesh(devices=None, axis: str = FSDP_AXIS) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def leaf_spec(x, axis_size: int, axis: str, min_size: int = 1 << 16) -> P:
    """PartitionSpec for one array: shard the largest divisible dim, or
    replicate small/indivisible leaves."""
    shape = getattr(x, "shape", ())
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    dims = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in dims:
        if shape[d] % axis_size == 0 and shape[d] >= axis_size:
            spec = [None] * len(shape)
            spec[d] = axis
            return P(*spec)
    return P()


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = FSDP_AXIS, min_size: int = 1 << 16):
    """NamedSharding pytree matching ``tree`` (params OR optimizer state —
    optax states mirror the param structure so the same rule applies)."""
    size = mesh.shape[axis]

    def one(x):
        return NamedSharding(mesh, leaf_spec(x, size, axis, min_size))

    return jax.tree.map(one, tree)


def shard_tree(tree: Any, mesh: Mesh, axis: str = FSDP_AXIS, min_size: int = 1 << 16):
    """device_put ``tree`` with its FSDP shardings."""
    return jax.device_put(tree, fsdp_shardings(tree, mesh, axis, min_size))


def replicated(tree: Any, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
