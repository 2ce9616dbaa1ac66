"""Encoder-decoder transformer over Gaussian token sequences (flax).

Behavioral parity with the reference's Annotated-Transformer stack
(``/root/reference/model/model.py:46-65``, ``model/shared.py``,
``model/attention.py``, ``model/encoder.py``, ``model/decoder.py``):

  * pre-norm residual sublayers with the torch-style LayerNorm
    (normalizes by STD with Bessel correction, eps added to the std —
    model/shared.py:13-24),
  * FFN: Linear(d, 2d) -> SwiGLU (split halves, silu(a) * b, the standard
    GLU-variants definition the reference pulls from ``torch_activation``) ->
    dropout -> Linear(d, d) (model/shared.py:41-51; d_ff = 2*d_model from
    model/model.py:51),
  * multi-head attention with additive -1e4 masking and dropout on the
    attention weights (model/attention.py:41-51),
  * src/tgt "embeddings" are FFN copies — inputs are already d_model-dim
    tokens (model/model.py:56-57),
  * Generator = single Linear regression head, no softmax (model/model.py:36-43),
  * NO positional encoding anywhere — order comes from box_sort + causal
    masking,
  * Xavier-uniform init on weight matrices (model/model.py:62-64).

TPU notes: attention is einsum-based (MXU); for the stacked model's big tokens
(d_model = 26 * 2^8) the matmuls dominate and map straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

XAVIER = nn.initializers.xavier_uniform()


def interleave(x):
    """concat(x[:, 0::2], x[:, 1::2]) on the feature axis — the reference's
    unused Interleave helper (model/shared.py:53-58)."""
    return jnp.concatenate([x[:, 0::2], x[:, 1::2]], axis=-1)


def unravel(x):
    """[B, L, D] -> [B, 2L, D/2] (model/shared.py:60-65 Unravel)."""
    return x.reshape(x.shape[0], x.shape[1] * 2, x.shape[2] // 2)


def subsequent_mask(size: int):
    """Causal mask [1, size, size]; True = may attend (model/shared.py:74-78)."""
    return jnp.asarray(np.triu(np.ones((1, size, size)), k=1) == 0)


class TorchLayerNorm(nn.Module):
    """LayerNorm matching the reference exactly: (x - mean) / (std + eps) with
    torch's UNBIASED std, learnable scale/shift (model/shared.py:13-24)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        a_2 = self.param("a_2", nn.initializers.ones, (d,))
        b_2 = self.param("b_2", nn.initializers.zeros, (d,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(d - 1, 1)
        return a_2 * (x - mean) / (jnp.sqrt(var) + self.eps) + b_2


class FeedForward(nn.Module):
    """Position-wise FFN with SwiGLU (model/shared.py:41-51). ``dtype`` is the
    computation dtype — bf16 runs the matmuls on the MXU's fast path (the TPU
    analog of the reference's fp16 training, train_transformer.py:313); params
    stay float32."""

    d_model: int
    d_ff: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.d_ff, kernel_init=XAVIER, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="w_1")(x)
        a, b = jnp.split(h, 2, axis=-1)
        h = jax.nn.silu(a) * b  # SwiGLU
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.d_model, kernel_init=XAVIER, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="w_2")(h)


class MultiHeadedAttention(nn.Module):
    """h-head scaled dot-product attention (model/attention.py).

    ``block_k > 0`` switches to the O(L)-memory blockwise kernel
    (ops/attention.py) for long Gaussian sequences — forward-exact, including
    the reference's dropout-on-attention-weights (numerator-masked online
    softmax; the weights matrix never materializes)."""

    h: int
    d_model: int
    dropout: float = 0.1
    block_k: int = 0
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # Sequence parallelism: mesh axis name to shard the token axis over; the
    # attention runs the exact ppermute ring (parallel/ring.py) so no device
    # ever holds the full K/V sequence. Requires ``mesh``. Train-mode
    # attention-weight dropout uses the same numerator-masking construction
    # as the blockwise path (exact torch semantics, different mask stream).
    ring_axis: Optional[str] = None
    mesh: Any = None

    @nn.compact
    def __call__(self, query, key, value, mask=None, deterministic: bool = True):
        assert self.d_model % self.h == 0
        d_k = self.d_model // self.h
        B = query.shape[0]

        def proj(x, name):
            y = nn.Dense(self.d_model, kernel_init=XAVIER, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=name)(x)
            return y.reshape(B, -1, self.h, d_k).transpose(0, 2, 1, 3)

        q = proj(query, "q")
        k = proj(key, "k")
        v = proj(value, "v")

        if mask is not None and mask.ndim == 3:
            mask = mask[:, None]  # broadcast over heads

        if self.ring_axis is not None:
            from gaussian_transformer_tpu.parallel.ring import ring_attention

            assert self.mesh is not None, "ring_axis requires a mesh"
            drop_rng = None
            if not deterministic and self.dropout > 0.0:
                drop_rng = self.make_rng("dropout")
            x = ring_attention(
                q, k, v, mask, self.mesh, axis=self.ring_axis,
                dropout_rate=0.0 if deterministic else self.dropout,
                dropout_rng=drop_rng,
            )
        elif self.block_k > 0:
            from gaussian_transformer_tpu.ops.attention import blockwise_attention

            drop_rng = None
            if not deterministic and self.dropout > 0.0:
                drop_rng = self.make_rng("dropout")
            x = blockwise_attention(
                q, k, v, mask=mask, block_k=self.block_k,
                dropout_rate=0.0 if deterministic else self.dropout,
                dropout_rng=drop_rng,
            )
        else:
            # Scores/softmax in float32 for stability regardless of dtype.
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.float32(d_k))
            if mask is not None:
                scores = jnp.where(mask == 0, -1e4, scores)
            p_attn = jax.nn.softmax(scores, axis=-1)
            p_attn = nn.Dropout(self.dropout, deterministic=deterministic)(p_attn)
            x = jnp.einsum("bhqk,bhkd->bhqd", p_attn.astype(v.dtype), v)
        x = x.transpose(0, 2, 1, 3).reshape(B, -1, self.h * d_k)
        return nn.Dense(self.d_model, kernel_init=XAVIER, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="out")(x)


class SublayerConnection(nn.Module):
    """Pre-norm residual: x + dropout(sublayer(norm(x))) (model/shared.py:27-39)."""

    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, sublayer, deterministic: bool = True):
        y = sublayer(TorchLayerNorm(name="norm")(x))
        return x + nn.Dropout(self.dropout, deterministic=deterministic)(y)


class EncoderLayer(nn.Module):
    d_model: int
    h: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    block_k: int = 0
    ring_axis: Optional[str] = None
    mesh: Any = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        attn = MultiHeadedAttention(self.h, self.d_model, self.dropout, block_k=self.block_k, dtype=self.dtype, param_dtype=self.param_dtype, ring_axis=self.ring_axis, mesh=self.mesh, name="self_attn")
        ff = FeedForward(self.d_model, 2 * self.d_model, self.dropout, dtype=self.dtype, param_dtype=self.param_dtype, name="feed_forward")
        x = SublayerConnection(self.dropout, name="sub0")(
            x, lambda y: attn(y, y, y, mask, deterministic), deterministic
        )
        return SublayerConnection(self.dropout, name="sub1")(
            x, lambda y: ff(y, deterministic), deterministic
        )


class DecoderLayer(nn.Module):
    d_model: int
    h: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    block_k: int = 0
    ring_axis: Optional[str] = None
    mesh: Any = None

    @nn.compact
    def __call__(self, x, memory, src_mask, tgt_mask, deterministic: bool = True):
        self_attn = MultiHeadedAttention(self.h, self.d_model, self.dropout, block_k=self.block_k, dtype=self.dtype, param_dtype=self.param_dtype, ring_axis=self.ring_axis, mesh=self.mesh, name="self_attn")
        src_attn = MultiHeadedAttention(self.h, self.d_model, self.dropout, block_k=self.block_k, dtype=self.dtype, param_dtype=self.param_dtype, ring_axis=self.ring_axis, mesh=self.mesh, name="src_attn")
        ff = FeedForward(self.d_model, 2 * self.d_model, self.dropout, dtype=self.dtype, param_dtype=self.param_dtype, name="feed_forward")
        x = SublayerConnection(self.dropout, name="sub0")(
            x, lambda y: self_attn(y, y, y, tgt_mask, deterministic), deterministic
        )
        x = SublayerConnection(self.dropout, name="sub1")(
            x, lambda y: src_attn(y, memory, memory, src_mask, deterministic), deterministic
        )
        return SublayerConnection(self.dropout, name="sub2")(
            x, lambda y: ff(y, deterministic), deterministic
        )


class Encoder(nn.Module):
    d_model: int
    h: int
    N: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    block_k: int = 0
    ring_axis: Optional[str] = None
    mesh: Any = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        for i in range(self.N):
            x = EncoderLayer(self.d_model, self.h, self.dropout, dtype=self.dtype, param_dtype=self.param_dtype, block_k=self.block_k, ring_axis=self.ring_axis, mesh=self.mesh, name=f"layer{i}")(
                x, mask, deterministic
            )
        return TorchLayerNorm(name="norm")(x)


class Decoder(nn.Module):
    d_model: int
    h: int
    N: int
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    block_k: int = 0
    ring_axis: Optional[str] = None
    mesh: Any = None

    @nn.compact
    def __call__(self, x, memory, src_mask, tgt_mask, deterministic: bool = True):
        for i in range(self.N):
            x = DecoderLayer(self.d_model, self.h, self.dropout, dtype=self.dtype, param_dtype=self.param_dtype, block_k=self.block_k, ring_axis=self.ring_axis, mesh=self.mesh, name=f"layer{i}")(
                x, memory, src_mask, tgt_mask, deterministic
            )
        return TorchLayerNorm(name="norm")(x)


class EncoderDecoder(nn.Module):
    """The full model (model/model.py:11-34). ``src_embed``/``tgt_embed`` are
    FeedForward copies; ``generator`` is the linear regression head."""

    src_g_len: int
    tgt_g_len: int
    N: int = 2
    d_model: int = 32
    h: int = 8
    dropout: float = 0.1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    # > 0: blockwise (flash-style) attention with this key-block size — the
    # long-sequence lever; 0: dense reference attention.
    block_k: int = 0
    # Sequence parallelism: mesh axis for ring attention (parallel/ring.py).
    ring_axis: Optional[str] = None
    mesh: Any = None

    def setup(self):
        self.encoder = Encoder(self.d_model, self.h, self.N, self.dropout, dtype=self.dtype, param_dtype=self.param_dtype, block_k=self.block_k, ring_axis=self.ring_axis, mesh=self.mesh)
        self.decoder = Decoder(self.d_model, self.h, self.N, self.dropout, dtype=self.dtype, param_dtype=self.param_dtype, block_k=self.block_k, ring_axis=self.ring_axis, mesh=self.mesh)
        self.src_embed = FeedForward(self.d_model, 2 * self.d_model, self.dropout, dtype=self.dtype, param_dtype=self.param_dtype)
        self.tgt_embed = FeedForward(self.d_model, 2 * self.d_model, self.dropout, dtype=self.dtype, param_dtype=self.param_dtype)
        # Generator output stays float32 (regression head).
        self.generator_proj = nn.Dense(self.tgt_g_len, kernel_init=XAVIER)

    def encode(self, src, src_mask, deterministic: bool = True):
        return self.encoder(self.src_embed(src, deterministic), src_mask, deterministic)

    def decode(self, memory, src_mask, tgt, tgt_mask, deterministic: bool = True):
        return self.decoder(
            self.tgt_embed(tgt, deterministic), memory, src_mask, tgt_mask, deterministic
        )

    def generator(self, x):
        return self.generator_proj(x)

    def __call__(self, src, tgt, src_mask, tgt_mask, deterministic: bool = True):
        return self.decode(
            self.encode(src, src_mask, deterministic), src_mask, tgt, tgt_mask, deterministic
        )


def make_model(
    stacking: int,
    src_g_len: int = 64,
    tgt_g_len: int = 64,
    N: int = 2,
    d_model: int = 32,
    h: int = 8,
    dropout: float = 0.1,
    dtype: Any = jnp.float32,
    param_dtype: Any = jnp.float32,
    block_k: int = 0,
    ring_axis: Optional[str] = None,
    mesh: Any = None,
) -> EncoderDecoder:
    """Construct the model (model/model.py:46-65; ``stacking`` is part of the
    reference signature but unused in construction there too). ``dtype=bf16``
    enables mixed precision (fp32 params, bf16 matmuls); ``param_dtype=bf16``
    additionally halves parameter/optimizer-state memory — together the TPU
    analog of the reference's ``model.half()`` (train_transformer.py:313),
    needed to fit the full-size stacked model (1.9B params) on one chip."""
    del stacking
    return EncoderDecoder(
        src_g_len=src_g_len, tgt_g_len=tgt_g_len, N=N, d_model=d_model, h=h,
        dropout=dropout, dtype=dtype, param_dtype=param_dtype, block_k=block_k,
        ring_axis=ring_axis, mesh=mesh,
    )


def init_model(
    model: EncoderDecoder, rng: jax.Array, src_len: int = 8, tgt_len: int = 8
):
    """Initialize parameters with dummy shapes (any lengths work — the model
    has no positional encoding)."""
    src = jnp.zeros((1, src_len, model.d_model))
    tgt = jnp.zeros((1, tgt_len, model.d_model))

    def trace_all(mdl, s, t, sm, tm):
        # The forward pass alone never touches the generator head (the
        # reference applies it separately too) — trace it so it gets params.
        return mdl.generator(mdl(s, t, sm, tm, True))

    return model.init(
        {"params": rng},
        src,
        tgt,
        jnp.ones((1, 1, src_len), bool),
        subsequent_mask(tgt_len),
        method=trace_all,
    )
