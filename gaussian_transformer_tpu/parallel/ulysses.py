"""Ulysses-style sequence parallelism: all-to-all head sharding.

The alternative long-context mechanism to the ppermute ring (SURVEY.md §2.3):
instead of rotating K/V shards, two ``all_to_all`` collectives re-shard the
attention input from sequence-sharded [B, H, L/a, D] to head-sharded
[B, H/a, L, D], run ordinary dense attention per resident head group, and
shard back. Communication is 2 all-to-alls of the activations (vs a-1
ppermute hops); attention itself is the unmodified reference math, so exact
semantics (including the -1e4 mask fill) come for free.

Trade-off vs ring: Ulysses needs H divisible by the axis and moves the whole
sequence through the interconnect twice, but every device then holds full
rows — better MXU shapes for moderate L; ring never materializes the full
sequence anywhere — better for extreme L. Both are exact.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_transformer_tpu.ops.attention import MASK_FILL


def _local(q, k, v, mask, has_mask: bool, axis_name: str):
    """Inside shard_map: q/k/v [B, H, L_local, D]; mask (if any) replicated
    [B, 1|H, Lq, Lk] or q-sharded — see ulysses_attention."""
    # Sequence-sharded -> head-sharded: split heads, gather sequence.
    q = jax.lax.all_to_all(q, axis_name, split_axis=1, concat_axis=2, tiled=True)
    k = jax.lax.all_to_all(k, axis_name, split_axis=1, concat_axis=2, tiled=True)
    v = jax.lax.all_to_all(v, axis_name, split_axis=1, concat_axis=2, tiled=True)
    # q now [B, H/a, L, D]; dense reference attention per resident head group.
    D = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(D))
    if has_mask:
        idx = jax.lax.axis_index(axis_name)
        if mask.shape[1] > 1:
            # Head-sharded mask slice for the resident head group.
            h_loc = scores.shape[1]
            mask = jax.lax.dynamic_slice_in_dim(mask, idx * h_loc, h_loc, axis=1)
        scores = jnp.where(mask, scores, MASK_FILL)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    # Head-sharded -> sequence-sharded.
    return jax.lax.all_to_all(out, axis_name, split_axis=2, concat_axis=1, tiled=True)


def ulysses_attention(
    q: jnp.ndarray,  # [B, H, L, D] — L sharded over `axis`
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],  # [B, 1|H, L, L], True = attend
    mesh: Mesh,
    axis: str = "gauss",
):
    """Exact attention with all-to-all head sharding over ``mesh`` axis
    ``axis``. Requires H and L divisible by the axis size. The mask stays
    replicated on the sequence axes (each head group sees full rows)."""
    import functools

    seq_spec = P(None, None, axis, None)
    fn = functools.partial(_local, has_mask=mask is not None, axis_name=axis)
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P()),
        out_specs=seq_spec,
        check_vma=False,
    )
    dummy = jnp.zeros((), q.dtype) if mask is None else mask
    return sharded(q, k, v, dummy)
