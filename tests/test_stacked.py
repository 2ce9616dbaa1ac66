"""Stacked-transformer trainer tests: batch assembly, masks, greedy decode,
loss step convergence on a tiny overfit task, checkpoint roundtrip."""

import math
import types

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gaussian_transformer_tpu.models.codec import TOKEN_DIM, fuzzy_token_equal
from gaussian_transformer_tpu.models.transformer import init_model, make_model
from gaussian_transformer_tpu.render import RenderConfig
from gaussian_transformer_tpu.train.stacked import (
    ReduceLROnPlateau,
    TrainingScene,
    dropout_schedule,
    greedy_decode,
    load_checkpoint,
    make_loss_fn,
    make_std_mask,
    make_train_step,
    pad_token,
    save_checkpoint,
    stacked_token_dim,
    start_token,
)

from tests.test_render import make_camera, make_scene
from tests.test_train import _synthetic_scene_and_cams

STACK_S = 2  # small stack for tests: token dim 104
D_S = stacked_token_dim(STACK_S)


def small_model():
    return make_model(STACK_S, D_S, D_S, N=1, d_model=D_S, dropout=0.0)


def make_tscene(n=256, n_cams=4, batch_size=2):
    scene, cams = _synthetic_scene_and_cams(n=n, n_cams=n_cams, width=48, height=32, seed=11)
    scene_obj = types.SimpleNamespace(
        gaussians=scene, get_train_cameras=lambda scale=1.0: cams
    )
    return TrainingScene(
        scene_obj, RenderConfig(max_per_tile=64), batch_size=batch_size, stack=STACK_S, bucket=4
    )


class TestSchedulesAndMasks:
    def test_dropout_schedule(self):
        assert dropout_schedule(0) == pytest.approx(1.30 - 1.0)
        assert dropout_schedule(10**6) == 0.6
        assert dropout_schedule(2000) == pytest.approx(1.30 - math.exp(-0.2))
        assert dropout_schedule(5000) == 0.6  # capped

    def test_make_std_mask(self):
        t = jnp.tile(pad_token(STACK_S), (1, 4, 1))
        t = t.at[0, 0].set(start_token(STACK_S))
        t = t.at[0, 1].set(jnp.ones(D_S))
        m = np.asarray(make_std_mask(t, STACK_S))[0]
        # Rows: causal; cols 2,3 are PAD => masked everywhere.
        assert m[1, 0] and m[1, 1] and not m[1, 2]
        assert not m[0, 1]  # causal
        assert not m[3, 2] and not m[3, 3]  # pad cols stay masked

    def test_reduce_lr_on_plateau(self):
        s = ReduceLROnPlateau(lr=1.0, patience=2, cooldown=1)
        for loss in [1.0, 0.9, 0.95, 0.95, 0.95]:
            s.step(loss)
        assert s.lr == pytest.approx(0.1)


class TestBatches:
    def test_batch_assembly(self):
        ts = make_tscene()
        ts.set_epoch(100)
        batch = ts.make_batch([0, 1])
        assert batch is not None
        fold = 2**STACK_S
        D = TOKEN_DIM * fold
        assert batch.src.shape[0] == 1 and batch.src.shape[2] == D
        assert batch.trg.shape[2] == D
        assert batch.trg_y.shape[1] == batch.trg.shape[1]
        assert batch.src.shape[1] % ts.bucket == 0
        # trg starts with START
        assert bool(fuzzy_token_equal(batch.trg[0, 0], start_token(STACK_S)))
        # trg/trg_y are shifted views of the same sequence
        np.testing.assert_array_equal(np.asarray(batch.trg[0, 1:]), np.asarray(batch.trg_y[0, :-1]))
        assert batch.ntokens > 0
        assert batch.trg_mask.shape == (1, batch.trg.shape[1], batch.trg.shape[1])

    def test_source_target_partition(self):
        """Non-pad src + tgt tokens exactly tile the folded visible sequence."""
        ts = make_tscene()
        ts.set_epoch(0)
        batch = ts.make_batch([0, 1])
        padt = np.asarray(pad_token(STACK_S))
        src = np.asarray(batch.src[0])
        src_real = src[np.abs(src - padt).sum(-1) > 0.5]
        tgt = np.asarray(batch.trg_y[0])
        tgt_real = tgt[np.abs(tgt - padt).sum(-1) > 0.5]
        assert len(tgt_real) == batch.ntokens
        assert len(src_real) + len(tgt_real) >= 2  # partition is non-trivial


class TestDecodeAndLoss:
    def test_greedy_decode_shapes_and_grad(self):
        model = small_model()
        variables = init_model(model, jax.random.PRNGKey(0))
        src = jnp.asarray(np.random.RandomState(0).randn(1, 6, D_S), jnp.float32)
        ys = greedy_decode(model, variables, src, None, max_len=5, stack=STACK_S)
        assert ys.shape == (1, 5, D_S)
        assert np.all(np.isfinite(np.asarray(ys)))

        def f(v):
            return jnp.sum(greedy_decode(model, v, src, None, 4, STACK_S) ** 2)

        g = jax.grad(f)(variables)
        leaves = jax.tree.leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
        assert any(np.abs(np.asarray(x)).max() > 0 for x in leaves)

    def test_loss_step_decreases(self):
        ts = make_tscene()
        ts.set_epoch(1000)
        batch = ts.make_batch([0, 1])
        model = small_model()
        variables = init_model(model, jax.random.PRNGKey(1))
        optimizer = optax.adam(1.0, eps=1e-4)
        opt_state = optimizer.init(variables)
        step = make_train_step(model, ts.handler, ts.render_cfg, optimizer, STACK_S)
        losses = []
        for _ in range(12):
            variables, opt_state, loss, metrics = step(
                variables, opt_state, batch.src, batch.trg_y, batch.cameras,
                jnp.asarray(5e-4),
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses

    def test_checkpoint_roundtrip(self, tmp_path):
        model = small_model()
        variables = init_model(model, jax.random.PRNGKey(2))
        optimizer = optax.adam(1.0, eps=1e-4)
        opt_state = optimizer.init(variables)
        save_checkpoint(str(tmp_path), 7, variables, opt_state)
        v2, o2 = load_checkpoint(str(tmp_path), 7, variables, opt_state)
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_roundtrip_bf16_adafactor(self, tmp_path):
        """The full-scale campaign recipe (bf16 params + Adafactor): numpy
        cannot serialize bfloat16, so leaves round-trip via a uint16 view."""
        variables = {
            "w": (jnp.arange(32).reshape(8, 4) / 7.0).astype(jnp.bfloat16),
            "b": jnp.zeros((4,), jnp.float32),
        }
        optimizer = optax.adafactor(learning_rate=1.0, min_dim_size_to_factor=2)
        opt_state = optimizer.init(variables)
        save_checkpoint(str(tmp_path), "step3", variables, opt_state)
        v2, o2 = load_checkpoint(str(tmp_path), "step3", variables, opt_state)
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32)
            )
        for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
            assert jnp.asarray(a).dtype == jnp.asarray(b).dtype


class TestLiveViewerStream:
    def test_stream_decode_matches_scan_and_renders(self):
        """The viewer's KV-cached streaming decode reproduces the training
        scan decode token-for-token, and every display() mode renders."""
        from gaussian_transformer_tpu.train.stacked import LiveViewerStream

        ts = make_tscene()
        ts.set_epoch(100)
        batch = ts.make_batch([0, 1])
        model = small_model()
        variables = init_model(model, jax.random.PRNGKey(5))
        stream = LiveViewerStream(model, ts.handler, ts.render_cfg, STACK_S)
        stream.set_batch(variables, batch)
        assert stream.n_steps == batch.trg_y.shape[1]

        carry = stream.start()
        for _ in range(stream.n_steps):
            carry = stream.step(carry)
        ys, _, pos = carry
        assert pos == stream.n_steps
        ref = greedy_decode(
            model, variables, batch.src, batch.src_mask,
            batch.trg_y.shape[1] + 1, STACK_S,
        )
        np.testing.assert_allclose(np.asarray(ys), np.asarray(ref), atol=5e-5)

        cam = batch.cameras[0]
        for show_prompt, show_pred in [(True, True), (True, False), (False, True), (False, False)]:
            img = stream.render(carry, cam, 1.0, show_prompt, show_pred)
            assert img.shape[0] == 3
            assert np.all(np.isfinite(np.asarray(img)))


class TestCachedDecode:
    def test_matches_scan_decode(self):
        """KV-cached inference decode must reproduce the trainers'
        backprop-able scan decode exactly."""
        from gaussian_transformer_tpu.models.decode_cache import greedy_decode_cached

        model = small_model()
        variables = init_model(model, jax.random.PRNGKey(3))
        src = jnp.asarray(np.random.RandomState(6).randn(1, 7, D_S), jnp.float32)
        ref = greedy_decode(model, variables, src, None, max_len=6, stack=STACK_S)
        out = greedy_decode_cached(
            model, variables, src, None, 6,
            jnp.tile(jnp.asarray(np.asarray(ref[0, 0])), (1, 1))[0],
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_cached_with_src_mask(self):
        from gaussian_transformer_tpu.models.decode_cache import greedy_decode_cached
        from gaussian_transformer_tpu.train.stacked import start_token

        model = small_model()
        variables = init_model(model, jax.random.PRNGKey(4))
        src = jnp.asarray(np.random.RandomState(7).randn(1, 8, D_S), jnp.float32)
        src_mask = jnp.asarray(np.ones((1, 1, 8), bool)).at[0, 0, 5:].set(False)
        ref = greedy_decode(model, variables, src, src_mask, max_len=5, stack=STACK_S)
        out = greedy_decode_cached(model, variables, src, src_mask, 5, start_token(STACK_S))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
