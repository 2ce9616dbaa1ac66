"""Flat (unstacked) masked-Gaussian-modeling trainer.

Parity target: ``/root/reference/train_transformer.py`` — per camera, split the
VISIBLE Gaussians into kept (src) / dropped (tgt) by a Bernoulli mask with
epoch-scheduled rate ``1.05 - exp(-0.0005 * epoch)`` (:68-111), teacher-forced
forward, loss = 0.5 * (relative L1 image vs the no-drop baseline) + 0.1 *
L2(tokens) + 0.4 * LPIPS(alex) (:171-221), NoamOpt warmup (factor 0.5, warmup
2000) on Adamax(b1=0.9, b2=0.98, eps=1e-4) (:315-316), cameras pre-filtered to
5000 < visible < max_len=15000 (:121-133), best-loss checkpointing (:332-334).

NOTE the reference file is STALE: it builds ``make_model(26, 26, d_model=1024)``
whose FFN "embeddings" cannot consume 26-dim tokens, and touches
``model.src_embed[0]`` which does not exist — it cannot run against its own
model code (SURVEY.md §2). This implementation is the RUNNABLE equivalent: the
reference's unused ``Embeddings`` Linear (model/shared.py:62-67) maps 26 ->
d_model in front of the FFN embeds, and the generator regresses back to 26.
TPU deltas: bf16 instead of fp16 (documented numerics delta), static bucket
padding for jit.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from gaussian_transformer_tpu.eval import lpips as lpips_mod
from gaussian_transformer_tpu.models.codec import (
    END_GAUSSIAN,
    PAD_GAUSSIAN,
    START_GAUSSIAN,
    TOKEN_DIM,
    flatten_gaussians,
    fuzzy_token_equal,
    unflatten_gaussians,
)
from gaussian_transformer_tpu.models.transformer import (
    EncoderDecoder,
    make_model,
    subsequent_mask,
)
from gaussian_transformer_tpu.ops.losses import l1_loss, l2_loss
from gaussian_transformer_tpu.render import RenderConfig, render


class EmbeddedEncoderDecoder(nn.Module):
    """26-dim tokens <-> d_model via the reference's (unused) Embeddings Linear
    — the wrapper that makes the flat experiment runnable."""

    N: int = 6
    d_model: int = 1024
    h: int = 8
    dropout: float = 0.1
    block_k: int = 0  # > 0: blockwise attention for long visible-set sequences
    # Sequence parallelism: mesh axis name + mesh for exact ring attention
    # (parallel/ring.py) — shards the token axis over devices so no chip ever
    # holds the full K/V sequence (the >=32k-token lever).
    ring_axis: Optional[str] = None
    mesh: object = None

    def setup(self):
        self.embed_in_src = nn.Dense(self.d_model)
        self.embed_in_tgt = nn.Dense(self.d_model)
        self.core = make_model(
            0, self.d_model, self.d_model, self.N, self.d_model, self.h,
            self.dropout, block_k=self.block_k, ring_axis=self.ring_axis,
            mesh=self.mesh,
        )
        self.out_proj = nn.Dense(TOKEN_DIM)

    def encode(self, src, src_mask, deterministic=True):
        return self.core.encode(self.embed_in_src(src), src_mask, deterministic)

    def decode(self, memory, src_mask, tgt, tgt_mask, deterministic=True):
        return self.core.decode(memory, src_mask, self.embed_in_tgt(tgt), tgt_mask, deterministic)

    def generator(self, x):
        return self.out_proj(self.core.generator(x))

    def __call__(self, src, tgt, src_mask, tgt_mask, deterministic=True):
        return self.decode(self.encode(src, src_mask, deterministic), src_mask, tgt, tgt_mask, deterministic)


def init_flat_model(model: EmbeddedEncoderDecoder, rng):
    src = jnp.zeros((1, 8, TOKEN_DIM))
    tgt = jnp.zeros((1, 8, TOKEN_DIM))

    def trace_all(mdl, s, t, sm, tm):
        return mdl.generator(mdl(s, t, sm, tm, True))

    return model.init({"params": rng}, src, tgt, jnp.ones((1, 1, 8), bool), subsequent_mask(8), method=trace_all)


def noam_rate(step, model_size: int, factor: float = 0.5, warmup: int = 2000):
    """NoamOpt schedule (train_transformer.py:143-168)."""
    step = max(step, 1)
    return factor * (model_size ** (-0.5) * min(step ** (-0.5), step * warmup ** (-1.5)))


def make_noam_adamax(model_size: int, factor: float = 0.5, warmup: int = 2000):
    """Adamax with the Noam warmup schedule (train_transformer.py:315-316)."""
    sched = lambda step: factor * (model_size ** -0.5) * jnp.minimum(
        jnp.maximum(step, 1) ** -0.5, jnp.maximum(step, 1) * warmup ** -1.5
    )
    return optax.adamax(learning_rate=sched, b1=0.9, b2=0.98, eps=1e-4)


def dropout_schedule_flat(epoch: int) -> float:
    return 1.05 - math.exp(-0.0005 * epoch)


def make_std_mask(tgt):
    not_pad = ~fuzzy_token_equal(tgt[:, None, :, :], PAD_GAUSSIAN)
    return not_pad & subsequent_mask(tgt.shape[1])


class FlatTrainingScene:
    """Camera batcher with visibility pre-filtering
    (train_transformer.py:53-133). Sequences pad to ``bucket`` multiples."""

    def __init__(self, scene_obj, render_cfg=RenderConfig(), max_len=15_000, min_len=5_000,
                 bucket=256, seed=0):
        self.render_cfg = render_cfg
        self.bucket = bucket
        self.rng = np.random.RandomState(seed)
        self.dropout = 0.01
        self.gaussians = scene_obj.gaussians
        self.tokens = np.asarray(flatten_gaussians(self.gaussians))
        bg = jnp.zeros(3)
        # jit the visibility probe: eager per-op dispatch is pathologically
        # slow over remote-TPU links; one compile per camera resolution.
        vis_fn = jax.jit(
            lambda cam: render(cam, self.gaussians, render_cfg, bg_color=bg)["visibility_filter"]
        )
        self.cameras = []
        self.visible = []
        for cam in scene_obj.get_train_cameras():
            # anonymize: identity metadata is static in the pytree, and each
            # distinct identity crossing a jit boundary would retain a fresh
            # trace + executable (host-RSS leak at campaign scale).
            cam = cam.anonymize()
            vis = np.asarray(vis_fn(cam))
            count = int(vis.sum())
            if count + 1 >= max_len or count <= min_len:
                continue
            self.cameras.append(cam)
            self.visible.append(vis)
        self.size = len(self.cameras)

    def set_epoch(self, epoch: int):
        self.dropout = dropout_schedule_flat(epoch)

    def make_batch(self, cam_idx: int):
        vis = self.visible[cam_idx]
        seen = self.tokens[vis]
        mask = self.rng.rand(len(seen)) >= self.dropout
        src_real = seen[mask]
        tgt_real = seen[~mask]

        start = np.asarray(START_GAUSSIAN)
        end = np.asarray(END_GAUSSIAN)
        pad = np.asarray(PAD_GAUSSIAN)

        def build(rows, trailing_end):
            seq = [start[None], rows] + ([end[None]] if trailing_end else [])
            arr = np.concatenate(seq, axis=0)
            want = ((len(arr) + self.bucket - 1) // self.bucket) * self.bucket
            if trailing_end:
                # Decoder sequence pads to bucket+1 so trg = arr[:-1] and
                # trg_y = arr[1:] stay bucket-divisible (ring attention shards
                # the token axis and needs the length to divide the mesh).
                want += 1
            return np.concatenate([arr, np.tile(pad, (want - len(arr), 1))], axis=0)

        src = jnp.asarray(build(src_real, False)[None])
        tgt_full = jnp.asarray(build(tgt_real, True)[None])
        trg = tgt_full[:, :-1]
        trg_y = tgt_full[:, 1:]
        src_mask = ~fuzzy_token_equal(src[:, None, :, :], PAD_GAUSSIAN)
        return {
            "src": src,
            "src_mask": src_mask,
            "trg": trg,
            "trg_y": trg_y,
            "trg_mask": make_std_mask(trg),
            "cam": self.cameras[cam_idx],
            "n_src": len(src_real),
            "n_tgt": len(tgt_real),
        }


def make_flat_loss(model: EmbeddedEncoderDecoder, render_cfg: RenderConfig, use_lpips: Optional[bool] = None):
    """ImageLossCompute analog (train_transformer.py:171-221): render prompt +
    teacher-forced prediction, relative-L1-improvement + token L2 (+ LPIPS).

    When the model carries a ring mesh (``--seq_shard``), the two renders run
    inside a fully-manual replicated shard_map: XLA cannot auto-partition
    Mosaic kernels, so the bare form is rejected by the real TPU compiler
    (deviceless AOT gate finding — same class as the stacked trainer's fix)."""
    if use_lpips is None:
        use_lpips = lpips_mod.available("alex")

    def _render_two(g_combined, g_base, cam, bg):
        image = render(cam, g_combined, render_cfg, bg_color=bg)["render"]
        y_img = render(cam, g_base, render_cfg, bg_color=bg)["render"]
        return image, y_img

    def loss_fn(params, batch_src, batch_trg, batch_trg_y, src_mask, trg_mask, cam,
                dropout_rng=None):
        # Reference trains under model.train() (train_transformer.py:326) —
        # dropout active; pass a key to match, None for eval-style steps.
        if dropout_rng is not None:
            out = model.apply(params, batch_src, batch_trg, src_mask, trg_mask, False,
                              rngs={"dropout": dropout_rng})
        else:
            out = model.apply(params, batch_src, batch_trg, src_mask, trg_mask, True)
        x = model.apply(params, out, method=EmbeddedEncoderDecoder.generator)[0]  # [Lt, 26]

        prompt = batch_src[0]
        g_combined = unflatten_gaussians(jnp.concatenate([prompt, x], axis=0))
        bg = jnp.zeros(3)
        # Baseline: rendering ALL tokens (prompt + true targets).
        g_base = unflatten_gaussians(jnp.concatenate([prompt, batch_trg_y[0]], axis=0))

        mesh = getattr(model, "mesh", None)
        if mesh is None:
            image, y_img = _render_two(g_combined, g_base, cam, bg)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as SMP

            ctx = jax.sharding.get_abstract_mesh()
            use_mesh = mesh if getattr(ctx, "empty", True) else ctx
            image, y_img = shard_map(
                _render_two, mesh=use_mesh,
                in_specs=(SMP(), SMP(), SMP(), SMP()),
                out_specs=(SMP(), SMP()),
                check_vma=False,
            )(g_combined, g_base, cam, bg)
        original = cam.original_image

        base = l1_loss(y_img, original)
        gen = l1_loss(image, original)
        l2 = l2_loss(x, batch_trg_y[0])

        loss = ((base - (base - gen)) / jnp.maximum(base, 1e-8)) * 0.5
        loss = loss + 0.1 * l2
        if use_lpips:
            loss = loss + 0.4 * lpips_mod.lpips(
                jnp.clip(image, 0, 1), jnp.clip(original, 0, 1), "alex"
            )
        return loss, {"base": base, "gen": gen, "l2": l2}

    return loss_fn


def greedy_decode_flat(model, params, src, src_mask, max_len: int):
    """Greedy decode with the flat START token (train_transformer.py:269-281)."""
    D = TOKEN_DIM
    memory = model.apply(params, src, src_mask, method=EmbeddedEncoderDecoder.encode)
    filler = jnp.tile(jnp.arange(D, dtype=src.dtype)[None, None] * 1e-3, (1, max_len, 1))
    ys = filler.at[:, 0].set(START_GAUSSIAN)
    causal = subsequent_mask(max_len)

    @jax.checkpoint
    def step(ys, i):
        out = model.apply(params, memory, src_mask, ys, causal, method=EmbeddedEncoderDecoder.decode)
        nxt = model.apply(params, out[:, i], method=EmbeddedEncoderDecoder.generator)
        ys = jax.lax.dynamic_update_slice(ys, nxt[:, None, :], (0, i + 1, 0))
        return ys, None

    ys, _ = jax.lax.scan(step, ys, jnp.arange(max_len - 1))
    return ys
