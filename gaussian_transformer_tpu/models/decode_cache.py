"""KV-cached autoregressive decoding for the EncoderDecoder.

The reference's greedy decode re-runs the full decoder over the whole prefix
every step — O(L^3) total attention work (train_stacked_transformer.py:259-269);
the trainers here keep that form because they BACKPROP through the decode.
For inference (viewer streaming, evaluation) this module provides the O(L^2)
cached path: per-layer self-attention K/V caches appended one token per step,
cross-attention K/V computed once from the encoder memory.

Pure functions over the flax param tree (the module graph is fixed:
encoder/decoder/src_embed/tgt_embed/generator_proj with layer{i}/sub{j}
names), jit-friendly via lax.scan, NOT differentiable by design (use
``train.stacked.greedy_decode`` to train through the decode).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from gaussian_transformer_tpu.models.transformer import EncoderDecoder


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _torch_ln(p, x, eps=1e-5):
    d = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / max(d - 1, 1)
    return p["a_2"] * (x - mean) / (jnp.sqrt(var) + eps) + p["b_2"]


def _ffn(p, x):
    h = _dense(p["w_1"], x)
    a, b = jnp.split(h, 2, axis=-1)
    return _dense(p["w_2"], jax.nn.silu(a) * b)


def _split_heads(y, h):
    B, L, D = y.shape
    return y.reshape(B, L, h, D // h).transpose(0, 2, 1, 3)  # [B, h, L, d_k]


def _merge_heads(y):
    B, h, L, d_k = y.shape
    return y.transpose(0, 2, 1, 3).reshape(B, L, h * d_k)


def _attend(q, k, v, mask=None):
    d_k = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(jnp.float32(d_k))
    if mask is not None:
        scores = jnp.where(mask, scores, -1e4)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), v)


def init_decode_state(model: EncoderDecoder, variables, src, src_mask, max_len: int):
    """Encode once; precompute cross-attention K/V and empty self-attn caches."""
    params = variables["params"]
    memory = model.apply(variables, src, src_mask, method=EncoderDecoder.encode)
    B = src.shape[0]
    h = model.h
    d_k = model.d_model // h

    layers = []
    for i in range(model.N):
        lp = params["decoder"][f"layer{i}"]
        cross_k = _split_heads(_dense(lp["src_attn"]["k"], memory), h)
        cross_v = _split_heads(_dense(lp["src_attn"]["v"], memory), h)
        layers.append(
            {
                "cross_k": cross_k,
                "cross_v": cross_v,
                "self_k": jnp.zeros((B, h, max_len, d_k)),
                "self_v": jnp.zeros((B, h, max_len, d_k)),
            }
        )
    return {"memory": memory, "layers": layers, "src_mask": src_mask}


def decode_step(model: EncoderDecoder, variables, state, token, pos):
    """One cached decoder step: token [B, 1, D], pos = its index. Returns
    (next_token_prediction [B, D], updated state)."""
    params = variables["params"]
    h = model.h
    x = _ffn(params["tgt_embed"], token)  # [B, 1, D]

    key_positions = jnp.arange(state["layers"][0]["self_k"].shape[2])
    self_mask = (key_positions <= pos)[None, None, None, :]  # attend to <= pos

    new_layers = []
    for i in range(model.N):
        lp = params["decoder"][f"layer{i}"]
        cache = state["layers"][i]

        # Self-attention over the cache.
        y = _torch_ln(lp["sub0"]["norm"], x)
        q = _split_heads(_dense(lp["self_attn"]["q"], y), h)
        k_new = _split_heads(_dense(lp["self_attn"]["k"], y), h)  # [B, h, 1, d_k]
        v_new = _split_heads(_dense(lp["self_attn"]["v"], y), h)
        self_k = jax.lax.dynamic_update_slice(cache["self_k"], k_new, (0, 0, pos, 0))
        self_v = jax.lax.dynamic_update_slice(cache["self_v"], v_new, (0, 0, pos, 0))
        attn = _attend(q, self_k, self_v, self_mask)
        x = x + _dense(lp["self_attn"]["out"], _merge_heads(attn))

        # Cross-attention against the precomputed memory K/V.
        y = _torch_ln(lp["sub1"]["norm"], x)
        q = _split_heads(_dense(lp["src_attn"]["q"], y), h)
        src_mask = state["src_mask"]
        cmask = None if src_mask is None else src_mask[:, None] if src_mask.ndim == 3 else src_mask
        attn = _attend(q, cache["cross_k"], cache["cross_v"], cmask)
        x = x + _dense(lp["src_attn"]["out"], _merge_heads(attn))

        # FFN.
        y = _torch_ln(lp["sub2"]["norm"], x)
        x = x + _ffn(lp["feed_forward"], y)

        new_layers.append({**cache, "self_k": self_k, "self_v": self_v})

    x = _torch_ln(params["decoder"]["norm"], x)
    out = _dense(params["generator_proj"], x)[:, 0]  # [B, D_out]
    return out, {**state, "layers": new_layers}


def greedy_decode_cached(
    model: EncoderDecoder, variables, src, src_mask, max_len: int, start_token
):
    """Cached greedy decode; same outputs as the trainers' scan decode but
    O(L) attention per step. Returns ys [B, max_len, D]."""
    B = src.shape[0]
    D = start_token.shape[-1]
    state = init_decode_state(model, variables, src, src_mask, max_len)
    ys = jnp.zeros((B, max_len, D), src.dtype).at[:, 0].set(start_token)

    def step(carry, i):
        ys, state = carry
        token = jax.lax.dynamic_slice(ys, (0, i, 0), (B, 1, D))
        nxt, state = decode_step(model, variables, state, token, i)
        ys = jax.lax.dynamic_update_slice(ys, nxt[:, None, :], (0, i + 1, 0))
        return (ys, state), None

    (ys, _), _ = jax.lax.scan(step, (ys, state), jnp.arange(max_len - 1))
    return ys
