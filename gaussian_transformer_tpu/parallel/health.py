"""Multi-host failure detection + crash containment.

The reference's fault story is ad-hoc single-process (SURVEY.md §5): viewer
socket errors drop the connection and training continues; the stacked trainer
catches RuntimeError per epoch, saves a checkpoint, and keeps going. Those
semantics are preserved in the trainers; THIS module adds what multi-host TPU
needs and the reference never had:

  * ``heartbeat`` — an all-reduce across hosts with a wall-clock deadline; if
    any host stalls, the collective times out and every healthy host raises
    ``HeartbeatTimeout`` instead of hanging the pod,
  * ``CrashSaver`` — wraps a step callable; on exception it writes the
    provided checkpoint payload (the reference's crash-save behavior,
    train_stacked_transformer.py:392-398, generalized),
  * ``guard_nans`` — opt-in ``jax.config`` nan-debugging toggle (the analog of
    the reference's ``--detect_anomaly``).
"""

from __future__ import annotations

import concurrent.futures
import os
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


class HeartbeatTimeout(RuntimeError):
    pass


def heartbeat(timeout_s: float = 60.0, tag: int = 0) -> bool:
    """Cross-host liveness check: a tiny psum over all devices, awaited with a
    deadline on the host. Returns True when every host participated; raises
    HeartbeatTimeout when the collective does not complete in time (a peer is
    hung/dead). Single-process meshes complete trivially."""
    n = jax.device_count()
    n_local = jax.local_device_count()

    # pmap psum spans every process's devices in multi-controller JAX: a hung
    # peer stalls the collective, which the host-side deadline converts into
    # an exception instead of a pod-wide hang.
    beat = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")
    fut = beat(np.full((n_local,), 1.0, np.float32) + tag * 0.0)
    with concurrent.futures.ThreadPoolExecutor(max_workers=1) as ex:
        task = ex.submit(lambda: float(np.asarray(fut)[0]))
        try:
            total = task.result(timeout=timeout_s)
        except concurrent.futures.TimeoutError as e:
            raise HeartbeatTimeout(f"heartbeat did not complete within {timeout_s}s") from e
    return total == n


class CrashSaver:
    """Run a step; on exception, persist a checkpoint payload then re-raise or
    swallow (the reference swallows and continues, :392-398)."""

    def __init__(self, save_fn: Callable[[], None], swallow: bool = True):
        self.save_fn = save_fn
        self.swallow = swallow
        self.crash_count = 0

    def __call__(self, step_fn: Callable, *args, **kwargs):
        try:
            return step_fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — crash containment by design
            self.crash_count += 1
            print(f"[crash-save] {type(e).__name__}: {e}")
            self.save_fn()
            if not self.swallow:
                raise
            return None


def guard_nans(enable: bool = True) -> None:
    """The --detect_anomaly analog (reference train.py:202,218)."""
    jax.config.update("jax_debug_nans", enable)
