"""Memory-efficient attention for long Gaussian token sequences.

The reference's attention is vanilla O(L^2) with a -1e4 mask fill
(``/root/reference/model/attention.py:41-51``); its only long-sequence levers
are token folding and visibility truncation (SURVEY.md §5). This module adds
the TPU-native levers:

  * ``blockwise_attention`` — flash-style online-softmax streaming over key
    blocks (lax.scan, MXU matmuls, O(L) memory). EXACT reference semantics:
    masked scores are SET to -1e4 (not -inf), so fully-masked rows degrade to
    a uniform distribution exactly like the torch ``masked_fill`` path.
  * ``ring_attention`` (parallel/ring.py) rotates key/value shards around a
    mesh axis with ``ppermute`` while accumulating the same online softmax —
    sequence parallelism over ICI.

Both are forward-exact (not approximations); gradients come from JAX AD with
rematerialization per block.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

MASK_FILL = -1e4  # reference model/attention.py:47


def _block_update(carry, qkT, v_blk, mask_blk, drop_keep=None, dropout_rate=0.0):
    """Online-softmax accumulation for one key block.

    carry: (m [.., Lq, 1] running max, l [.., Lq, 1] running denom,
            acc [.., Lq, D] running numerator)
    qkT:   [.., Lq, Bk] scaled scores for this block.
    drop_keep: optional bool [.., Lq, Bk] — post-softmax dropout keep mask
      (applied to the NUMERATOR only, scaled by 1/(1-rate); the denominator
      stays full, matching torch's dropout(softmax(s)) @ v).
    """
    m, l, acc = carry
    if mask_blk is not None:
        qkT = jnp.where(mask_blk, qkT, MASK_FILL)
    m_new = jnp.maximum(m, jnp.max(qkT, axis=-1, keepdims=True))
    p = jnp.exp(qkT - m_new)
    scale = jnp.exp(m - m_new)
    l_new = l * scale + jnp.sum(p, axis=-1, keepdims=True)
    p_num = p
    if drop_keep is not None:
        p_num = p * drop_keep.astype(p.dtype) / (1.0 - dropout_rate)
    acc_new = acc * scale + jnp.einsum(
        "...qk,...kd->...qd", p_num, v_blk, preferred_element_type=acc.dtype
    )
    return m_new, l_new, acc_new


def blockwise_attention(
    q: jnp.ndarray,  # [..., Lq, D]
    k: jnp.ndarray,  # [..., Lk, D]
    v: jnp.ndarray,  # [..., Lk, D]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [..., Lq, Lk], True = attend
    block_k: int = 512,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
):
    """Exact attention with O(Lq * block_k) score memory.

    ``dropout_rate`` reproduces the reference's dropout-on-attention-weights
    (torch applies it AFTER softmax, model/attention.py:48-50) without ever
    materializing the [Lq, Lk] weight matrix: the softmax DENOMINATOR
    accumulates unmasked, while each block's numerator contribution is
    Bernoulli-masked (keys dropped per query) and scaled by 1/(1-rate) —
    algebraically identical to dropout(softmax(scores)) @ V. Per-block mask
    streams from ``dropout_rng`` folded with the block index."""
    *lead, Lq, D = q.shape
    Lk = k.shape[-2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(D, q.dtype))

    pad = (-Lk) % block_k
    if pad:
        k = jnp.pad(k, [(0, 0)] * (k.ndim - 2) + [(0, pad), (0, 0)])
        v = jnp.pad(v, [(0, 0)] * (v.ndim - 2) + [(0, pad), (0, 0)])
        pad_mask = jnp.arange(Lk + pad) < Lk  # [Lk+pad]
        if mask is None:
            mask = jnp.broadcast_to(pad_mask, (1,) * (q.ndim - 2) + (1, Lk + pad))
        else:
            mask = jnp.broadcast_to(
                mask, tuple(jnp.broadcast_shapes(mask.shape[:-2], tuple(lead))) + (Lq, Lk)
            )
            mask = jnp.pad(mask, [(0, 0)] * (mask.ndim - 2) + [(0, 0), (0, pad)])
    n_blocks = (Lk + pad) // block_k

    k_b = k.reshape(*k.shape[:-2], n_blocks, block_k, D)
    v_b = v.reshape(*v.shape[:-2], n_blocks, block_k, D)
    if mask is not None:
        mask_full = jnp.broadcast_to(
            mask, tuple(jnp.broadcast_shapes(mask.shape[:-2], tuple(lead))) + (Lq, Lk + pad)
        )
        mask_b = mask_full.reshape(*mask_full.shape[:-1], n_blocks, block_k)
        # -> [n_blocks, ..., Lq, block_k]
        mask_b = jnp.moveaxis(mask_b, -2, 0)
    else:
        mask_b = None

    # -> [n_blocks, ..., block_k, D] for scan.
    k_s = jnp.moveaxis(k_b, -3, 0)
    v_s = jnp.moveaxis(v_b, -3, 0)

    m0 = jnp.full((*lead, Lq, 1), -jnp.inf, q.dtype)
    l0 = jnp.zeros((*lead, Lq, 1), q.dtype)
    acc0 = jnp.zeros((*lead, Lq, D), q.dtype)

    use_dropout = dropout_rate > 0.0 and dropout_rng is not None

    @jax.checkpoint
    def body(carry, xs):
        if mask_b is None:
            (k_blk, v_blk, blk_idx), mb = xs, None
        else:
            k_blk, v_blk, mb, blk_idx = xs
        qkT = jnp.einsum("...qd,...kd->...qk", q, k_blk, preferred_element_type=q.dtype) * scale
        drop = None
        if use_dropout:
            rng = jax.random.fold_in(dropout_rng, blk_idx)
            drop = jax.random.bernoulli(rng, 1.0 - dropout_rate, (*lead, Lq, block_k))
        return _block_update(carry, qkT, v_blk, mb, drop, dropout_rate), None

    blk_iota = jnp.arange(n_blocks, dtype=jnp.int32)
    xs = (k_s, v_s, blk_iota) if mask_b is None else (k_s, v_s, mask_b, blk_iota)
    (m, l, acc), _ = jax.lax.scan(body, (m0, l0, acc0), xs)
    return acc / jnp.maximum(l, 1e-30)


def reference_attention(q, k, v, mask=None):
    """The reference's O(L^2) attention (model/attention.py:41-51), for tests
    and short sequences."""
    D = q.shape[-1]
    scores = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(jnp.asarray(D, q.dtype))
    if mask is not None:
        scores = jnp.where(mask, scores, MASK_FILL)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p, v)
