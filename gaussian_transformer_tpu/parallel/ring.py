"""Ring attention: sequence parallelism over a mesh axis (ICI).

The key/value sequence axis is sharded across the mesh axis; each step every
device computes blockwise attention of its (resident) queries against the
currently-resident k/v shard, then rotates the k/v shards one hop around the
ring with ``ppermute`` — after axis_size steps every query has seen every key,
with the same online-softmax accumulation as ``ops.attention`` (exact, not an
approximation). Communication rides the ICI ring and overlaps with the next
step's matmuls under XLA's latency-hiding scheduler.

This is the TPU-native long-context mechanism the reference lacks entirely
(SURVEY.md §2.3, §5 — its only levers are token folding + visibility
truncation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_transformer_tpu.ops.attention import MASK_FILL, _block_update


def _ring_attention_local(q, k, v, mask, axis_name: str):
    """Runs inside shard_map: q/k/v are the LOCAL sequence shards
    [..., L_local, D]; mask is the local [.., Lq_local, Lk_global] slice or None."""
    axis_size = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    Lk_local = k.shape[-2]
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, q.dtype))

    lead = q.shape[:-2]
    # pvary: constants entering the loop carry must be marked device-varying
    # so they type-match the ppermuted k/v in the new shard_map vma system.
    m0 = jax.lax.pvary(jnp.full((*lead, q.shape[-2], 1), -jnp.inf, q.dtype), axis_name)
    l0 = jax.lax.pvary(jnp.zeros((*lead, q.shape[-2], 1), q.dtype), axis_name)
    acc0 = jax.lax.pvary(jnp.zeros((*lead, q.shape[-2], D), q.dtype), axis_name)

    def step(i, carry):
        m, l, acc, k_cur, v_cur = carry
        # Which global shard is resident this step.
        src_shard = (my_idx + i) % axis_size
        qkT = jnp.einsum("...qd,...kd->...qk", q, k_cur, preferred_element_type=q.dtype) * scale
        if mask is not None:
            start = src_shard * Lk_local
            mask_blk = jax.lax.dynamic_slice_in_dim(mask, start, Lk_local, axis=-1)
        else:
            mask_blk = None
        m, l, acc = _block_update((m, l, acc), qkT, v_cur, mask_blk)
        # Rotate k/v one hop: receive from right neighbor (idx + 1).
        perm = [(j, (j - 1) % axis_size) for j in range(axis_size)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m, l, acc, k_nxt, v_nxt

    m, l, acc, _, _ = jax.lax.fori_loop(0, axis_size, step, (m0, l0, acc0, k, v))
    return acc / jnp.maximum(l, 1e-30)


def ring_attention(
    q: jnp.ndarray,  # [B, H, L, D] — L sharded over `axis` on the mesh
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],  # [B, 1|H, L, L] or None (True = attend)
    mesh: Mesh,
    axis: str = "gauss",
):
    """Exact sequence-parallel attention over ``mesh`` axis ``axis``. The
    sequence length must divide by the axis size; mask (if any) is sharded on
    its query axis and kept whole on the key axis."""
    from jax import shard_map

    seq_spec = P(None, None, axis, None)
    mask_spec = P(None, None, axis, None)

    fn = functools.partial(_ring_attention_local, axis_name=axis)
    in_specs = (seq_spec, seq_spec, seq_spec, mask_spec if mask is not None else P())
    sharded = shard_map(
        lambda q_, k_, v_, m_: fn(q_, k_, v_, m_ if mask is not None else None),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=seq_spec,
    )
    return sharded(q, k, v, mask if mask is not None else jnp.zeros((), q.dtype))
