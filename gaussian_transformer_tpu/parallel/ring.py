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


def _ring_attention_local(q, k, v, mask, rng, axis_name: str, dropout_rate: float = 0.0):
    """Runs inside shard_map: q/k/v are the LOCAL sequence shards
    [..., L_local, D]; mask is the local [.., Lq_local, Lk_global] slice or
    None; ``rng`` (or None) drives train-mode attention-weight dropout with
    the blockwise numerator-masking semantics (ops/attention._block_update)."""
    axis_size = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    Lk_local = k.shape[-2]
    Lq_local = q.shape[-2]
    D = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, q.dtype))

    lead = q.shape[:-2]
    # pcast(to='varying'): constants entering the loop carry must be marked
    # device-varying so they type-match the ppermuted k/v in the new shard_map
    # vma system.
    _vary = lambda x: jax.lax.pcast(x, axis_name, to="varying")
    m0 = _vary(jnp.full((*lead, Lq_local, 1), -jnp.inf, q.dtype))
    l0 = _vary(jnp.zeros((*lead, Lq_local, 1), q.dtype))
    acc0 = _vary(jnp.zeros((*lead, Lq_local, D), q.dtype))

    # Rematerialize per ring step (like the blockwise scan body): backward
    # replays the local scores instead of storing [Lq, Lk_local] per step.
    @jax.checkpoint
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
        drop = None
        if rng is not None:
            # Independent Bernoulli per (query shard, key shard) pair.
            r = jax.random.fold_in(jax.random.fold_in(rng, my_idx), src_shard)
            drop = jax.random.bernoulli(r, 1.0 - dropout_rate, (*lead, Lq_local, Lk_local))
        m, l, acc = _block_update((m, l, acc), qkT, v_cur, mask_blk, drop, dropout_rate)
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
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """Exact sequence-parallel attention over ``mesh`` axis ``axis``. The
    sequence length must divide by the axis size; mask (if any) is sharded on
    its query axis and kept whole on the key axis. ``dropout_rate`` +
    ``dropout_rng`` enable torch-semantics attention-weight dropout (numerator
    Bernoulli-masked per (q-shard, k-shard) pair, denominator full — the same
    construction as ops.attention.blockwise_attention)."""
    from jax import shard_map

    seq_spec = P(None, None, axis, None)
    # Query-broadcast masks (size-1 query axis, e.g. encoder src PAD masks)
    # replicate to every shard; full [.., Lq, Lk] masks shard on the q axis.
    mask_spec = (
        P(None, None, axis, None)
        if mask is not None and mask.shape[-2] > 1
        else P()
    )

    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    fn = functools.partial(
        _ring_attention_local, axis_name=axis,
        dropout_rate=dropout_rate if use_dropout else 0.0,
    )
    in_specs = (
        seq_spec, seq_spec, seq_spec,
        mask_spec if mask is not None else P(),
        P(),
    )
    sharded = shard_map(
        lambda q_, k_, v_, m_, r_: fn(
            q_, k_, v_, m_ if mask is not None else None, r_ if use_dropout else None
        ),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=seq_spec,
    )
    rng_arg = dropout_rng if use_dropout else jnp.zeros((2,), jnp.uint32)
    return sharded(q, k, v, mask if mask is not None else jnp.zeros((), q.dtype), rng_arg)
