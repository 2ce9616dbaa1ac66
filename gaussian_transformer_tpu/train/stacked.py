"""Stacked-transformer trainer — the reference's canonical generative experiment.

Parity target: ``/root/reference/train_stacked_transformer.py`` — a trained
scene is box-sorted once (:66-81), batches OR 4 cameras' visibility filters,
truncate to a multiple of 2^STACK and fold STACK times into fat tokens
(:93-101), carve an epoch-scheduled contiguous target window (:102-114), run a
full greedy decode inside the loss (:259-269), and optimize Chamfer + (when
chamfer < 3) L1/SSIM rendering losses (:178-251) with Adam(5e-4, eps=1e-4) and
ReduceLROnPlateau (:366-367).

TPU-native structure:
  * batch assembly pads src/tgt to static BUCKETS (masks carry correctness) so
    jit retraces only per bucket, not per visible-count;
  * greedy decode is a ``lax.scan`` over a fixed-size token buffer with the
    causal mask doing the work (position i never attends to the not-yet-written
    tail), each step rematerialized — gradients flow through the whole decode
    like the reference's backprop-through-greedy-decode;
  * the chamfer<3 image-loss gate is a ``lax.cond`` (the reference used it as
    a renderer-OOM guard; with static shapes it is purely a loss schedule);
  * Chamfer is the blockwise MXU op (ops/chamfer.py), rendering losses use the
    Pallas renderer.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from gaussian_transformer_tpu.models.box_sort import GaussianHandler
from gaussian_transformer_tpu.models.codec import (
    PAD_GAUSSIAN,
    START_GAUSSIAN,
    TOKEN_DIM,
    fuzzy_token_equal,
    stack_tokens,
    unflatten_gaussians,
    unstack_tokens,
)
from gaussian_transformer_tpu.models.transformer import (
    EncoderDecoder,
    make_model,
    subsequent_mask,
)
from gaussian_transformer_tpu.ops.chamfer import chamfer_distance
from gaussian_transformer_tpu.ops.losses import l1_loss, ssim
from gaussian_transformer_tpu.render import RenderConfig, render

STACK = 8  # train_stacked_transformer.py:38


def stacked_token_dim(stack: int = STACK) -> int:
    return TOKEN_DIM * 2**stack


def start_token(stack: int = STACK):
    return jnp.tile(START_GAUSSIAN, (2**stack,))


def pad_token(stack: int = STACK):
    return jnp.tile(PAD_GAUSSIAN, (2**stack,))


def make_std_mask(tgt, stack: int = STACK):
    """PAD + causal mask [B, L, L] (train_stacked_transformer.py:129-135)."""
    not_pad = ~fuzzy_token_equal(tgt[:, None, :, :], pad_token(stack))  # [B, 1, L]
    return not_pad & subsequent_mask(tgt.shape[1])


def dropout_schedule(epoch: int) -> float:
    """Target-window half-width schedule (train_stacked_transformer.py:79)."""
    return min(1.30 - math.exp(-1e-4 * epoch), 0.6)


@dataclasses.dataclass
class StackedBatch:
    src: jnp.ndarray  # [1, Ls, D]
    src_mask: jnp.ndarray  # [1, 1, Ls] — False on bucket-padding PAD tokens
    trg: jnp.ndarray  # [1, Lt, D] (decoder input, starts with START)
    trg_y: jnp.ndarray  # [1, Lt, D] (shifted target)
    trg_mask: jnp.ndarray  # [1, Lt, Lt]
    cameras: List  # batch cameras
    ntokens: int


class TrainingScene:
    """Scene + camera batcher (train_stacked_transformer.py:66-127).

    The scene is box-sorted ONCE at load; per batch we render ``batch_size``
    cameras, OR their visibility, fold the visible run, and split a scheduled
    contiguous window as the target. src/tgt are padded up to multiples of
    ``bucket`` fat tokens with PAD so the jitted loss retraces per bucket only.
    """

    def __init__(
        self,
        scene_obj,
        render_cfg: RenderConfig = RenderConfig(),
        batch_size: int = 4,
        stack: int = STACK,
        interval_num: int = 40,
        bucket: int = 16,
        seed: int = 0,
    ):
        self.batch_size = batch_size
        self.stack = stack
        self.bucket = bucket
        self.render_cfg = render_cfg
        self.rng = np.random.RandomState(seed)
        self.dropout = 0.0

        gaussians = scene_obj.gaussians
        self.handler = GaussianHandler.create(gaussians, interval_num)
        sorted_tokens = self.handler.box_sort(gaussians)  # [C, 26] normalized
        sorted_scene = self.handler.denormalize(unflatten_gaussians(sorted_tokens))
        n_alive = int(np.asarray(gaussians.num_alive))
        self.gaussians = sorted_scene  # all-alive, sorted spatially
        self.n_alive = n_alive
        # Tokens the model consumes stay NORMALIZED (the reference denormalizes
        # only for rendering — TrainingScene.__init__ :73 re-sorts then keeps
        # the normalized flat list for batching).
        self.tokens = jnp.asarray(np.asarray(sorted_tokens)[:n_alive])
        self.cameras = list(scene_obj.get_train_cameras())
        self.size = len(self.cameras)
        self._vis_cache = {}
        # jit once; eager renders dispatch per-op (very slow on remote TPUs).
        self._vis_fn = jax.jit(
            lambda cam: render(cam, self.gaussians, self.render_cfg)["visibility_filter"]
        )

    def _visibility(self, cam_idx: int) -> np.ndarray:
        if cam_idx not in self._vis_cache:
            vis = self._vis_fn(self.cameras[cam_idx].anonymize())
            self._vis_cache[cam_idx] = np.asarray(vis)[: self.n_alive]
        return self._vis_cache[cam_idx]

    def set_epoch(self, epoch: int) -> None:
        self.dropout = dropout_schedule(epoch)

    def batches(self):
        idxs = np.arange(self.size)
        self.rng.shuffle(idxs)
        idxs = idxs[: (self.size // self.batch_size) * self.batch_size]
        for group in idxs.reshape(-1, self.batch_size):
            yield self.make_batch(list(group))

    def make_batch_group(self, n_windows: int) -> Optional["StackedBatch"]:
        """``n_windows`` INDEPENDENT windows stacked on a leading axis for
        data-parallel training (make_dp_train_step): each window draws its own
        camera subset and scheduled split; all windows re-pad to the group's
        common bucketed src/tgt lengths so one array stacks them. Cameras
        stack to [N, B, ...] leaves."""
        idxs = np.arange(self.size)
        self.rng.shuffle(idxs)
        bs = self.batch_size
        reps = [[int(idxs[(i * bs + j) % self.size]) for j in range(bs)]
                for i in range(n_windows)]
        batches = [self.make_batch(g) for g in reps]
        if any(b is None for b in batches):
            return None
        padt = np.asarray(pad_token(self.stack))

        def repad(arr, want):
            arr = np.asarray(arr[0])
            return np.concatenate([arr, np.tile(padt, (want - len(arr), 1))], axis=0)

        ls = max(b.src.shape[1] for b in batches)
        lt = max(b.trg_y.shape[1] for b in batches)
        src = jnp.asarray(np.stack([repad(b.src, ls) for b in batches]))
        trg_full = np.stack(
            [np.concatenate([np.asarray(b.trg[0, :1]), repad(b.trg_y, lt)], axis=0)
             for b in batches]
        )  # [N, lt+1, D] — START + repadded targets
        trg = jnp.asarray(trg_full[:, :-1])
        trg_y = jnp.asarray(trg_full[:, 1:])
        src_mask = ~fuzzy_token_equal(src[:, None, :, :], pad_token(self.stack))
        from gaussian_transformer_tpu.parallel.step import stack_cameras

        cams = jax.tree.map(
            lambda *xs: jnp.stack(xs), *[stack_cameras(b.cameras) for b in batches]
        )
        return StackedBatch(
            src=src, src_mask=src_mask, trg=trg, trg_y=trg_y,
            trg_mask=None, cameras=cams,
            ntokens=sum(b.ntokens for b in batches),
        )

    def make_batch(self, cam_idxs: List[int]) -> Optional[StackedBatch]:
        fold = 2**self.stack
        vis = np.zeros(self.n_alive, bool)
        cams = []
        for i in cam_idxs:
            vis |= self._visibility(i)
            # anonymize: distinct camera identities in the batch pytree would
            # otherwise key a fresh jit trace per camera COMBINATION (the
            # campaign's host-RSS leak / step-time drift).
            cams.append(self.cameras[i].anonymize())

        seen = np.asarray(self.tokens)[vis]
        seen = seen[: (len(seen) // fold) * fold]
        if len(seen) < 2 * fold:
            return None
        folded = np.asarray(stack_tokens(jnp.asarray(seen), self.stack))  # [L, D]
        L = folded.shape[0]

        # Scheduled contiguous window (train_stacked_transformer.py:102-110).
        mid = L // 2
        low = int(mid - mid * self.dropout)
        high = int(mid + mid * self.dropout)
        offset = int(
            (self.rng.random_sample() * 0.8 + 0.1) * (low + (L - high)) - (L - high)
        )
        low -= offset
        high -= offset
        low, high = max(0, low), min(L, max(high, low + 1))

        D = folded.shape[1]
        start = np.asarray(start_token(self.stack))
        padt = np.asarray(pad_token(self.stack))

        src = np.concatenate([folded[:low], folded[high:]], axis=0)
        tgt_full = np.concatenate([start[None], folded[low:high]], axis=0)

        def pad_to(arr, mult):
            want = ((len(arr) + mult - 1) // mult) * mult
            return np.concatenate([arr, np.tile(padt, (want - len(arr), 1))], axis=0)

        src = pad_to(src, self.bucket)
        tgt_full = pad_to(tgt_full, self.bucket)

        trg = jnp.asarray(tgt_full[None, :-1])
        trg_y = jnp.asarray(tgt_full[None, 1:])
        src_j = jnp.asarray(src[None])
        # The reference feeds exact-length sequences with src_mask=None
        # (train_stacked_transformer.py:115); our static buckets pad with PAD
        # tokens, which MUST be masked out of the encoder to stay equivalent.
        src_mask = ~fuzzy_token_equal(src_j, pad_token(self.stack))[:, None, :]
        return StackedBatch(
            src=src_j,
            src_mask=src_mask,
            trg=trg,
            trg_y=trg_y,
            trg_mask=make_std_mask(trg, self.stack),
            cameras=cams,
            ntokens=high - low,
        )


def greedy_decode(model: EncoderDecoder, variables, src, src_mask, max_len: int, stack: int = STACK,
                  dropout_rng=None):
    """Autoregressive decode into a fixed [1, max_len, D] buffer
    (train_stacked_transformer.py:259-269). Differentiable through the scan.

    ``dropout_rng`` enables train-mode dropout (the reference decodes under
    ``model.train()``, so every forward resamples masks — we fold the step
    index into the key to match that resampling)."""
    D = src.shape[-1]
    if dropout_rng is not None:
        enc_rng, dec_rng = jax.random.split(dropout_rng)
        memory = model.apply(variables, src, src_mask, False,
                             method=EncoderDecoder.encode, rngs={"dropout": enc_rng})
    else:
        memory = model.apply(variables, src, src_mask, method=EncoderDecoder.encode)
    # Unwritten tail rows are causally masked and never read, but they DO flow
    # through the pre-norm LayerNorm whose sqrt(var) backward is infinite at
    # var=0 — a constant filler row would poison the grads with NaN * 0. An
    # iota filler keeps per-row variance > 0; values are irrelevant.
    filler = jnp.tile(jnp.arange(D, dtype=src.dtype)[None, None] * 1e-3, (1, max_len, 1))
    ys = filler.at[:, 0].set(start_token(stack))
    causal = subsequent_mask(max_len)

    @jax.checkpoint
    def step(ys, i):
        if dropout_rng is not None:
            out = model.apply(variables, memory, src_mask, ys, causal, False,
                              method=EncoderDecoder.decode,
                              rngs={"dropout": jax.random.fold_in(dec_rng, i)})
        else:
            out = model.apply(variables, memory, src_mask, ys, causal, method=EncoderDecoder.decode)
        nxt = model.apply(variables, out[:, i], method=EncoderDecoder.generator)
        ys = jax.lax.dynamic_update_slice(ys, nxt[:, None, :], (0, i + 1, 0))
        return ys, None

    ys, _ = jax.lax.scan(step, ys, jnp.arange(max_len - 1))
    return ys


def make_loss_fn(model: EncoderDecoder, handler: GaussianHandler, render_cfg: RenderConfig,
                 stack: int = STACK, mesh=None, manual_axes=None):
    """Build the jitted ImageLossCompute analog
    (train_stacked_transformer.py:178-251). Returns fn(variables, src, trg_y,
    cams_stacked, n_cams) -> (loss, metrics).

    ``mesh``: when the step runs under a device mesh (FSDP/DP), the
    image-loss render block must be wrapped in a fully-manual shard_map —
    XLA cannot auto-partition Mosaic kernels, so the real TPU compiler
    rejects the bare form (deviceless AOT gate finding). The wrapper is
    replicated (every device renders identically — the same thing the
    partitioner would have scheduled for replicated inputs).
    ``manual_axes``: axes the wrapper must make manual; None = all mesh axes
    (pass the REMAINING axes when the caller already sits inside a partial
    shard_map, e.g. make_dp_train_step's data axis)."""

    def loss_fn(variables, src, trg_y, cams, src_mask=None, dropout_rng=None):
        pred = greedy_decode(model, variables, src, src_mask, trg_y.shape[1] + 1, stack,
                             dropout_rng=dropout_rng)[:, 1:]
        pred_list = unstack_tokens(pred[0], stack)  # [Lt*2^s, 26]
        tgt_list = unstack_tokens(trg_y[0], stack)

        # The reference trains on exact-length sequences; our static buckets
        # append PAD fat tokens, which must NOT contribute to the loss (PAD
        # unflattens to alpha=0.5 gaussians at the origin and would both
        # pollute target renders and attract predictions). A fat token's
        # 2^s gaussians are contiguous after unstack, so the fat-token mask
        # expands by repetition.
        valid_fat = ~fuzzy_token_equal(trg_y[0], pad_token(stack))  # [Lt]
        valid = jnp.repeat(valid_fat, 2**stack)  # [Lt*2^s]
        n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)

        d1, d2, _, _ = chamfer_distance(
            pred_list[None], tgt_list[None], a_valid=valid[None], b_valid=valid[None]
        )
        chamfer = jnp.sum(d1) / n_valid + jnp.sum(d2) / n_valid

        n_cams = len(cams) if isinstance(cams, (list, tuple)) else cams.world_view_transform.shape[0]

        def _render_pair(g_pred, g_tgt, cam_list):
            imgs, tgt_imgs = [], []
            for cam in cam_list:
                a = render(cam, g_pred, render_cfg)["render"]
                b = render(cam, g_tgt, render_cfg)["render"]
                imgs.append(jnp.clip(jnp.nan_to_num(a), 0.0, 1.0))
                tgt_imgs.append(jnp.clip(jnp.nan_to_num(b), 0.0, 1.0))
            return jnp.stack(imgs), jnp.stack(tgt_imgs)

        def with_images(_):
            # Tokens are normalized; denormalize before rendering (reference
            # renders through display()/unflatten on denormalized lists).
            # PAD-derived rows are dropped via the alive mask so target/pred
            # renders contain no spurious splats.
            g_pred = handler.denormalize(unflatten_gaussians(pred_list)).replace(alive=valid)
            g_tgt = handler.denormalize(unflatten_gaussians(tgt_list)).replace(alive=valid)

            if mesh is None:
                images, tgt_images = _render_pair(g_pred, g_tgt, cams)
            else:
                # Fully-manual replicated region around the Mosaic kernels
                # (see the factory docstring).
                from jax import shard_map
                from jax.sharding import PartitionSpec as SMP

                cam_tree = cams if not isinstance(cams, (list, tuple)) else tuple(cams)

                def _manual(gp, gt_, cam_tree):
                    cam_list = (
                        list(cam_tree) if isinstance(cam_tree, tuple) else cam_tree
                    )
                    return _render_pair(gp, gt_, cam_list)

                # Under an outer shard_map (DPxFSDP) the inner wrapper must be
                # built on the CONTEXT AbstractMesh, whose already-manual axes
                # are typed Manual; outside one, the concrete mesh is correct.
                ctx_mesh = jax.sharding.get_abstract_mesh()
                use_mesh = mesh if getattr(ctx_mesh, "empty", True) else ctx_mesh
                kwargs = {} if manual_axes is None else {"axis_names": set(manual_axes)}
                images, tgt_images = shard_map(
                    _manual, mesh=use_mesh,
                    in_specs=(SMP(), SMP(), SMP()),
                    out_specs=(SMP(), SMP()),
                    check_vma=False, **kwargs,
                )(g_pred, g_tgt, cam_tree)
            gen = l1_loss(images, tgt_images) * (5.0 / n_cams)
            ssim_l = (1.0 - ssim(images, tgt_images)) * (0.2 / n_cams)
            return gen * 0.1 + ssim_l * 0.1

        img_loss = jax.lax.cond(chamfer < 3.0, with_images, lambda _: jnp.float32(0.0), None)
        loss = chamfer + img_loss
        return loss, {"chamfer": chamfer, "img_loss": img_loss}

    return loss_fn


class LiveViewerStream:
    """Live autoregressive viewer streaming (reference
    train_stacked_transformer.py:300-314): when the SIBR viewer pauses
    training (train=False), every greedy-decode step's partial reconstruction
    is rendered and sent immediately. Decode runs the O(L)-per-step KV-cached
    path (models/decode_cache); training keeps the backprop-able scan decode.

    ``network_gui.pump_stacked`` drives the .start()/.step()/.render() hooks;
    the trainer refreshes the batch + params with .set_batch() each step."""

    def __init__(self, model: EncoderDecoder, handler: GaussianHandler,
                 render_cfg: RenderConfig, stack: int = STACK):
        from gaussian_transformer_tpu.models.decode_cache import (
            decode_step,
            init_decode_state,
        )

        self.n_steps = 0
        self.params = None
        self.batch: Optional[StackedBatch] = None

        def _start(variables, src, src_mask, max_len):
            state = init_decode_state(model, variables, src, src_mask, max_len)
            ys = jnp.zeros((src.shape[0], max_len, src.shape[-1]), src.dtype)
            return ys.at[:, 0].set(start_token(stack)), state

        def _step(variables, ys, state, i):
            token = jax.lax.dynamic_slice_in_dim(ys, i, 1, axis=1)
            nxt, state = decode_step(model, variables, state, token, i)
            return jax.lax.dynamic_update_slice(ys, nxt[:, None, :], (0, i + 1, 0)), state

        def _image(src, src_mask, ys, trg_y, n_valid, cam, smod, show_prompt, show_pred):
            # display() semantics (train_stacked_transformer.py:271-281):
            # prompt and/or decoded-so-far; neither flag -> ground-truth target.
            if show_prompt or show_pred:
                tokens = jnp.concatenate([src[0], ys[0]], axis=0)
                alive_fat = jnp.concatenate([
                    src_mask[0, 0] & show_prompt,
                    (jnp.arange(ys.shape[1]) <= n_valid) & show_pred,
                ])
            else:
                tokens = trg_y[0]
                alive_fat = ~fuzzy_token_equal(trg_y[0], pad_token(stack))
            g = handler.denormalize(
                unflatten_gaussians(unstack_tokens(tokens, stack))
            ).replace(alive=jnp.repeat(alive_fat, 2**stack))
            return render(cam, g, render_cfg, scaling_modifier=smod)["render"]

        self._start_fn = jax.jit(_start, static_argnames="max_len")
        self._step_fn = jax.jit(_step)
        self._image_fn = jax.jit(_image, static_argnames=("show_prompt", "show_pred"))

    def set_batch(self, params, batch: StackedBatch) -> None:
        self.params = params
        self.batch = batch
        self.n_steps = int(batch.trg_y.shape[1])

    def start(self):
        b = self.batch
        ys, state = self._start_fn(self.params, b.src, b.src_mask, int(b.trg_y.shape[1]) + 1)
        return ys, state, 0

    def step(self, carry):
        ys, state, i = carry
        ys, state = self._step_fn(self.params, ys, state, jnp.int32(i))
        return ys, state, i + 1

    def render(self, carry, cam, smod, show_prompt, show_pred):
        ys, _, i = carry
        return self.compose(ys, i, cam, smod, show_prompt, show_pred)

    def compose(self, ys, n_valid, cam, smod, show_prompt, show_pred):
        """display() composite for any prediction buffer ``ys`` with rows
        0..n_valid live — shared by the streaming path and the teacher-forced
        train-mode viewer image."""
        b = self.batch
        return self._image_fn(
            b.src, b.src_mask, ys, b.trg_y, jnp.int32(n_valid), cam,
            jnp.float32(smod), bool(show_prompt), bool(show_pred),
        )


class ReduceLROnPlateau:
    """Host-side lr controller with torch's exact semantics (mode='min',
    threshold_mode='rel', threshold=1e-4) plus the reference's cooldown=5
    (train_stacked_transformer.py:367): factor 0.1, patience 10.

    Torch order of operations per step: (1) relative-improvement compare
    ``loss < best * (1 - threshold)`` updates best/resets bad count, else bad
    count increments; (2) during cooldown the counter decrements and the bad
    count is HELD at 0; (3) reduce when bad count exceeds patience."""

    def __init__(
        self,
        lr: float,
        factor: float = 0.1,
        patience: int = 10,
        cooldown: int = 5,
        threshold: float = 1e-4,
    ):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.cooldown = cooldown
        self.threshold = threshold
        self.best = float("inf")
        self.bad = 0
        self.cool = 0

    def step(self, loss: float) -> float:
        if loss < self.best * (1.0 - self.threshold):
            self.best = loss
            self.bad = 0
        else:
            self.bad += 1
        if self.cool > 0:
            self.cool -= 1
            self.bad = 0
        if self.bad > self.patience:
            self.lr *= self.factor
            self.cool = self.cooldown
            self.bad = 0
        return self.lr


def make_train_step(model, handler, render_cfg, optimizer, stack: int = STACK, mesh=None):
    """(variables, opt_state, batch arrays, cams, lr) -> updated + metrics.
    Jitted per (src_len, tgt_len) bucket shape. Pass ``mesh`` when params are
    sharded over it (FSDP) so the image-loss render block compiles on real
    TPUs (see make_loss_fn)."""
    loss_fn = make_loss_fn(model, handler, render_cfg, stack, mesh=mesh)

    @jax.jit
    def step(params, opt_state, src, trg_y, cams, lr, src_mask=None, dropout_rng=None):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, src, trg_y, cams, src_mask, dropout_rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * (lr / 1.0), updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return step


def make_dp_train_step(model, handler, render_cfg, optimizer, stack: int = STACK,
                       mesh=None, axis: str = "data", batch_size: int = 4):
    """Data-parallel train step over INDEPENDENT windows (one per device on
    mesh axis ``axis``): each device decodes + renders its own window with
    its own cameras, gradients pmean across the axis, one replicated
    optimizer update. Input batch comes from TrainingScene.make_batch_group;
    composes with bf16/Adafactor. (The reference is single-GPU; this is the
    ICI scale-out for the flagship generative trainer, alongside FSDP.)

    2D composition: pass a ("data", "fsdp") mesh with params/optimizer
    device_put to their fsdp shardings (parallel/fsdp.fsdp_shardings over
    this mesh) — only ``axis`` is manual in the shard_map; the fsdp axis
    stays auto, so the SPMD partitioner keeps parameters sharded inside the
    per-window region and inserts the per-layer gathers/reduce-scatters."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    # Inside the manual-`axis` region any REMAINING mesh axes (e.g. "fsdp")
    # are still auto — the render block needs an inner manual wrapper over
    # them so the Mosaic kernels never sit under auto partitioning.
    rest = set(mesh.axis_names) - {axis} if mesh is not None else set()
    loss_fn = make_loss_fn(
        model, handler, render_cfg, stack,
        mesh=mesh if rest else None, manual_axes=rest or None,
    )

    def local(params, src, trg_y, cams, src_mask, rng):
        # Local shard: src/trg_y [1, L, D]; camera leaves [1, B, ...].
        cam_list = [jax.tree.map(lambda a, b=b: a[0, b], cams) for b in range(batch_size)]
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, src[0:1], trg_y[0:1], cam_list, src_mask[0:1], rng
        )
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        return loss, grads, metrics

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        axis_names={axis},  # other mesh axes (e.g. "fsdp") stay auto/SPMD
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, src, trg_y, cams, lr, src_mask, dropout_rng=None):
        if dropout_rng is None:
            dropout_rng = jax.random.PRNGKey(0)
        loss, grads, metrics = sharded(params, src, trg_y, cams, src_mask, dropout_rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * (lr / 1.0), updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return step


def _np_save_view(x):
    """npz-safe view: numpy has no bfloat16, so bf16 leaves are stored as
    uint16 bit patterns (the like-tree's dtype restores them on load)."""
    a = np.asarray(x)
    if a.dtype == jnp.bfloat16:
        return a.view(np.uint16)
    return a


def _np_load_leaf(stored, like):
    dt = jnp.asarray(like).dtype
    if dt == jnp.bfloat16:
        return jnp.asarray(stored.view(jnp.bfloat16))
    return jnp.asarray(stored, dt)


def save_checkpoint(run_dir: str, epoch: int, params, opt_state) -> None:
    """model.pt/optim.pt analog: checkpoint_{epoch}/ npz pair
    (train_stacked_transformer.py:392-398). bf16 leaves round-trip via a
    uint16 view (numpy cannot serialize ml_dtypes natively)."""
    d = os.path.join(run_dir, f"checkpoint_{epoch}")
    os.makedirs(d, exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten(params)
    np.savez(os.path.join(d, "model.npz"), *[_np_save_view(x) for x in flat])
    oflat, _ = jax.tree_util.tree_flatten(opt_state)
    np.savez(os.path.join(d, "optim.npz"), *[_np_save_view(x) for x in oflat])


def load_checkpoint(run_dir: str, epoch: int, params_like, opt_state_like):
    d = os.path.join(run_dir, f"checkpoint_{epoch}")
    m = np.load(os.path.join(d, "model.npz"))
    flat, treedef = jax.tree_util.tree_flatten(params_like)
    params = jax.tree_util.tree_unflatten(
        treedef, [_np_load_leaf(m[f"arr_{i}"], l) for i, l in enumerate(flat)]
    )
    o = np.load(os.path.join(d, "optim.npz"))
    oflat, otreedef = jax.tree_util.tree_flatten(opt_state_like)
    opt_state = jax.tree_util.tree_unflatten(
        otreedef, [_np_load_leaf(o[f"arr_{i}"], l) for i, l in enumerate(oflat)]
    )
    return params, opt_state
