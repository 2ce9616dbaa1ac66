"""Adaptive density control on the capacity-padded GaussianScene.

Reference behavior: ``/root/reference/scene/gaussian_model.py`` —
``densify_and_clone`` (:374-387), ``densify_and_split`` (:349-372),
``densify_and_prune`` (:389-403), ``reset_opacity`` (:210-213) and the
densification-stats accumulation (:405-407), driven by ``train.py:113-123``.

TPU-native redesign: the reference grows/shrinks tensors and performs optimizer
state surgery; XLA needs static shapes, so here every operation is a masked
scatter into FREE capacity slots inside jit:

  * prune      -> clear ``alive`` bits,
  * clone      -> copy a source slot's params into a free slot,
  * split      -> sample two new Gaussians from the source's ellipsoid into two
                  free slots, then kill the source,
  * new slots  -> Adam mu/nu zeroed there (the reference zeroes exp_avg for
                  appended tensors, gaussian_model.py:315-316).

If free capacity runs out, surplus new points are DROPPED (scatter mode='drop')
and reported, so the host can ``scene.compact(bigger_capacity)`` between jitted
segments and keep going — the TPU replacement for unbounded torch growth.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from gaussian_transformer_tpu.train.optim import AdamState, zero_state_slots, zero_state_leaf
from gaussian_transformer_tpu.utils.general import inverse_sigmoid
from gaussian_transformer_tpu.utils.graphics import build_rotation


@struct.dataclass
class DensifyStats:
    """Running densification statistics (gaussian_model.py:54-59, 405-407)."""

    xyz_gradient_accum: jnp.ndarray  # [C]
    denom: jnp.ndarray  # [C]
    max_radii2d: jnp.ndarray  # [C] float (reference keeps int radii; float is jit-friendlier)

    @staticmethod
    def init(capacity: int) -> "DensifyStats":
        # Three distinct buffers — a shared one would break jit buffer donation.
        return DensifyStats(
            xyz_gradient_accum=jnp.zeros((capacity,), jnp.float32),
            denom=jnp.zeros((capacity,), jnp.float32),
            max_radii2d=jnp.zeros((capacity,), jnp.float32),
        )


def ndc_grad_scale(width: int, height: int) -> jnp.ndarray:
    """Pixel-space -> NDC-half-extent gradient scale [2].

    The reference CUDA backward reports dL/dmean2D in NDC units — its pixel
    grads are multiplied by 0.5*W / 0.5*H (diff-gaussian-rasterization
    backward.cu, consumed at gaussian_model.py:405-407) — and
    ``densify_grad_threshold=0.0002`` is calibrated to that. Our
    ``screenspace_offset`` differentiates in PIXEL units, so the grads must be
    scaled by [0.5*W, 0.5*H] before thresholding or clone/split never fire at
    reference settings."""
    return jnp.asarray([0.5 * width, 0.5 * height], jnp.float32)


def add_densification_stats(
    stats: DensifyStats,
    screenspace_grad: jnp.ndarray,  # [C, 2] d(loss)/d(means2d) in PIXEL units
    visibility: jnp.ndarray,  # [C] bool
    radii: jnp.ndarray,  # [C]
    image_size=None,  # (width, height) — when given, rescale to NDC units
) -> DensifyStats:
    """Accumulate screen-space gradient norms + track max screen radius
    (gaussian_model.py:405-407 and train.py:115)."""
    g = screenspace_grad[:, :2]
    if image_size is not None:
        g = g * ndc_grad_scale(image_size[0], image_size[1])[None, :]
    gnorm = jnp.linalg.norm(g, axis=-1)
    vis = visibility.astype(jnp.float32)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + gnorm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.where(
            visibility, jnp.maximum(stats.max_radii2d, radii.astype(jnp.float32)), stats.max_radii2d
        ),
    )


class DensifyReport(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # points lost to capacity exhaustion


def densify_and_prune(
    scene,
    adam: AdamState,
    stats: DensifyStats,
    key: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float,
):
    """One densify+prune pass (gaussian_model.py:389-403). Returns
    (scene, adam, fresh stats, report). Fully jittable; static shapes."""
    C = scene.capacity
    alive = scene.alive

    denom_safe = jnp.maximum(stats.denom, 1.0)
    grads = jnp.where(stats.denom > 0, stats.xyz_gradient_accum / denom_safe, 0.0)

    scale_act = scene.get_scaling  # exp(log-scales)
    scale_max = jnp.max(scale_act, axis=-1)
    wants = alive & (grads >= max_grad)
    clone_mask = wants & (scale_max <= percent_dense * extent)
    split_mask = wants & (scale_max > percent_dense * extent)

    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    n_split = jnp.sum(split_mask.astype(jnp.int32))

    (free_idx,) = jnp.nonzero(~alive, size=C, fill_value=C)
    n_free = jnp.sum((~alive).astype(jnp.int32))
    (clone_src,) = jnp.nonzero(clone_mask, size=C, fill_value=C)
    (split_src,) = jnp.nonzero(split_mask, size=C, fill_value=C)

    slot_pos = jnp.arange(C)
    # Clones take free slots [0, n_clone); each split takes two at n_clone + 2j.
    clone_valid = slot_pos < jnp.minimum(n_clone, n_free)
    clone_tgt = jnp.where(clone_valid, free_idx, C)

    split_off = n_clone + 2 * slot_pos
    sa_valid = (slot_pos < n_split) & (split_off + 1 < jnp.minimum(C, n_free))
    split_tgt_a = jnp.where(sa_valid, free_idx[jnp.minimum(split_off, C - 1)], C)
    split_tgt_b = jnp.where(sa_valid, free_idx[jnp.minimum(split_off + 1, C - 1)], C)

    leaves = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")

    def gather(leaf, src):
        arr = getattr(scene, leaf)
        return arr[jnp.minimum(src, C - 1)]

    # ---- clone: verbatim copy (gaussian_model.py:374-387) ----
    updates = {leaf: getattr(scene, leaf).at[clone_tgt].set(gather(leaf, clone_src), mode="drop") for leaf in leaves}
    new_alive = alive.at[clone_tgt].set(True, mode="drop")

    # ---- split: sample N=2 from the source ellipsoid (gaussian_model.py:349-372) ----
    stds = scale_act[jnp.minimum(split_src, C - 1)]  # [C, 3]
    rots = build_rotation(gather("rotation", split_src))  # [C, 3, 3]
    xyz_src = gather("xyz", split_src)
    samples = jax.random.normal(key, (2, C, 3), dtype=xyz_src.dtype) * stds[None]
    new_xyz = jnp.einsum("cij,ncj->nci", rots, samples) + xyz_src[None]
    new_scaling = jnp.log(jnp.maximum(stds / (0.8 * 2.0), 1e-30))

    for leaf in leaves:
        if leaf == "xyz":
            vals_a, vals_b = new_xyz[0], new_xyz[1]
        elif leaf == "scaling":
            vals_a = vals_b = new_scaling
        else:
            vals_a = vals_b = gather(leaf, split_src)
        updates[leaf] = updates[leaf].at[split_tgt_a].set(vals_a, mode="drop")
        updates[leaf] = updates[leaf].at[split_tgt_b].set(vals_b, mode="drop")
    new_alive = new_alive.at[split_tgt_a].set(True, mode="drop")
    new_alive = new_alive.at[split_tgt_b].set(True, mode="drop")
    # Kill split sources — but only those whose children actually got slots.
    killed_src = jnp.where(sa_valid, split_src, C)
    new_alive = new_alive.at[killed_src].set(False, mode="drop")

    scene = scene.replace(alive=new_alive, **updates)

    # Fresh slots start with zero Adam state.
    fresh = jnp.zeros((C,), bool)
    fresh = fresh.at[clone_tgt].set(True, mode="drop")
    fresh = fresh.at[split_tgt_a].set(True, mode="drop")
    fresh = fresh.at[split_tgt_b].set(True, mode="drop")
    adam = zero_state_slots(adam, fresh)

    # ---- prune (gaussian_model.py:389-400): low opacity, oversized screen
    # radius, or world-space scale > 0.1 * extent ----
    opac = scene.get_opacity[:, 0]
    prune = scene.alive & (opac < min_opacity)
    if max_screen_size:
        prune = prune | (scene.alive & (stats.max_radii2d > max_screen_size))
        prune = prune | (scene.alive & (jnp.max(scene.get_scaling, axis=-1) > 0.1 * extent))
    n_pruned = jnp.sum(prune.astype(jnp.int32))
    scene = scene.replace(alive=scene.alive & ~prune)
    adam = zero_state_slots(adam, prune)

    n_dropped = (n_clone - jnp.sum(clone_valid & (clone_src < C))) + 2 * (
        n_split - jnp.sum(sa_valid & (split_src < C))
    )
    report = DensifyReport(n_cloned=n_clone, n_split=n_split, n_pruned=n_pruned, n_dropped=n_dropped)
    return scene, adam, DensifyStats.init(C), report


def reset_opacity(scene, adam: AdamState):
    """Clamp opacity to <= 0.01 and reset its optimizer state
    (gaussian_model.py:210-213 + replace_tensor_to_optimizer)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(scene.opacity), 0.01))
    new_op = jnp.where(scene.alive[:, None], new_op, scene.opacity)
    return scene.replace(opacity=new_op), zero_state_leaf(adam, "opacity")
