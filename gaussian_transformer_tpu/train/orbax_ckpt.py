"""Orbax checkpointing: async, multi-host-safe snapshots of training pytrees.

The npz mechanisms in ``train/splat.py`` (capture/restore) and
``train/stacked.py`` (save/load_checkpoint) cover the reference's three
checkpoint paths (/root/reference/train.py:108-110,130-132 and
train_stacked_transformer.py:392-398) on one host. This module layers the
TPU-fleet-grade mechanism on top: Orbax ``CheckpointManager`` writes occur in
a background thread (training does not stall on IO), are atomic (no torn
checkpoints on preemption), retain a bounded history, and — on a multi-host
mesh — each process writes only its addressable shards.

Usage:
    mgr = make_manager(run_dir, max_to_keep=3)
    save(mgr, step, {"params": params, "opt_state": opt_state})  # async
    restored = restore(mgr, {"params": params, "opt_state": opt_state})
    mgr.wait_until_finished()   # before exiting
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except Exception:
        return False


def make_manager(run_dir: str, max_to_keep: int = 3, async_save: bool = True):
    """A CheckpointManager rooted at run_dir/orbax (absolute path — Orbax
    requires one)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(run_dir, "orbax"))
    os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep,
        enable_async_checkpointing=async_save,
    )
    return ocp.CheckpointManager(path, options=options)


def save(mgr, step: int, tree: Any) -> None:
    """Async-save a pytree of arrays at ``step`` (returns immediately; the
    write completes in the background)."""
    import orbax.checkpoint as ocp

    mgr.save(step, args=ocp.args.StandardSave(tree))


def restore(mgr, like: Any, step: Optional[int] = None) -> Any:
    """Restore the latest (or given) step as a pytree matching ``like``'s
    structure/shardings. Returns None if no checkpoint exists."""
    import orbax.checkpoint as ocp

    step = mgr.latest_step() if step is None else step
    if step is None:
        return None
    like = jax.tree.map(lambda x: x, like)  # shallow copy of the structure
    return mgr.restore(step, args=ocp.args.StandardRestore(like))


def restore_raw(mgr, step: Optional[int] = None) -> Any:
    """Restore the latest (or given) step with the SAVED shapes/dtypes (no
    ``like`` tree) — needed when the live state's static shapes may have
    drifted since the save (e.g. the splat trainer's capacity growth).
    Returns None if no checkpoint exists."""
    step = mgr.latest_step() if step is None else step
    if step is None:
        return None
    return mgr.restore(step)
