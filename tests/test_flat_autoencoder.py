"""Flat trainer + autoencoder tests: schedules, batching invariants, Noam
schedule parity, loss step runs and decreases, autoencoder modules."""

import math
import types

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from gaussian_transformer_tpu.models.autoencoder import (
    GAutoEncoder,
    GConvAutoEncoder,
    gaussian_unshuffle_1d,
)
from gaussian_transformer_tpu.models.codec import (
    END_GAUSSIAN,
    START_GAUSSIAN,
    TOKEN_DIM,
    fuzzy_token_equal,
)
from gaussian_transformer_tpu.models.transformer import subsequent_mask
from gaussian_transformer_tpu.render import RenderConfig
from gaussian_transformer_tpu.train.flat import (
    EmbeddedEncoderDecoder,
    FlatTrainingScene,
    dropout_schedule_flat,
    greedy_decode_flat,
    init_flat_model,
    make_flat_loss,
    make_noam_adamax,
    noam_rate,
)

from tests.test_train import _synthetic_scene_and_cams


def make_flat_tscene(n=400):
    scene, cams = _synthetic_scene_and_cams(n=n, n_cams=4, width=48, height=32, seed=21)
    scene_obj = types.SimpleNamespace(gaussians=scene, get_train_cameras=lambda scale=1.0: cams)
    # Tiny scene: loosen the visible-count window so cameras survive.
    return FlatTrainingScene(
        scene_obj, RenderConfig(max_per_tile=64), max_len=15000, min_len=10, bucket=32
    )


class TestFlatBatching:
    def test_noam_rate_matches_reference_formula(self):
        for step in (1, 100, 2000, 10000):
            ref = 0.5 * (1024 ** -0.5) * min(step ** -0.5, step * 2000 ** -1.5)
            assert noam_rate(step, 1024) == pytest.approx(ref)

    def test_dropout_schedule(self):
        assert dropout_schedule_flat(0) == pytest.approx(0.05)
        assert dropout_schedule_flat(10000) == pytest.approx(1.05 - math.exp(-5))

    def test_camera_prefilter(self):
        ts = make_flat_tscene()
        assert ts.size > 0
        for v in ts.visible:
            assert 10 < v.sum() < 15000

    def test_batch_invariants(self):
        ts = make_flat_tscene()
        ts.set_epoch(1000)  # dropout ~0.44
        b = ts.make_batch(0)
        assert b["src"].shape[1] % ts.bucket == 0
        assert bool(fuzzy_token_equal(b["src"][0, 0], START_GAUSSIAN))
        assert bool(fuzzy_token_equal(b["trg"][0, 0], START_GAUSSIAN))
        # trg_y contains the END token after the real targets.
        tgt_y = np.asarray(b["trg_y"][0])
        ends = np.asarray(fuzzy_token_equal(jnp.asarray(tgt_y), END_GAUSSIAN))
        assert ends.sum() == 1 and int(np.nonzero(ends)[0][0]) == b["n_tgt"]
        # src real tokens + tgt real tokens = visible count.
        assert b["n_src"] + b["n_tgt"] == ts.visible[0].sum()


class TestFlatLoss:
    def test_loss_step_decreases(self):
        ts = make_flat_tscene(n=200)
        ts.set_epoch(2000)
        b = ts.make_batch(0)
        model = EmbeddedEncoderDecoder(N=1, d_model=64, dropout=0.0)
        params = init_flat_model(model, jax.random.PRNGKey(0))
        loss_fn = make_flat_loss(model, ts.render_cfg, use_lpips=False)
        optimizer = make_noam_adamax(64, factor=2.0, warmup=10)
        opt_state = optimizer.init(params)

        @jax.jit
        def step(params, opt_state):
            (loss, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, b["src"], b["trg"], b["trg_y"], b["src_mask"], b["trg_mask"], b["cam"]
            )
            up, opt_state = optimizer.update(g, opt_state, params)
            params = optax.apply_updates(params, up)
            return params, opt_state, loss

        losses = []
        for _ in range(10):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

    def test_block_k_model_matches_dense(self):
        """--attn_block_k plumbing: the full flat model with blockwise
        attention reproduces the dense model bit-for-nearly-bit (same params,
        deterministic)."""
        rng = np.random.RandomState(11)
        src = jnp.asarray(rng.randn(2, 20, TOKEN_DIM), jnp.float32)
        tgt = jnp.asarray(rng.randn(2, 12, TOKEN_DIM), jnp.float32)
        src_mask = jnp.asarray(rng.rand(2, 1, 20) > 0.2)
        tgt_mask = subsequent_mask(12)
        dense = EmbeddedEncoderDecoder(N=1, d_model=64, dropout=0.0)
        blk = EmbeddedEncoderDecoder(N=1, d_model=64, dropout=0.0, block_k=8)
        params = init_flat_model(dense, jax.random.PRNGKey(2))
        a = dense.apply(params, src, tgt, src_mask, tgt_mask, True)
        b = blk.apply(params, src, tgt, src_mask, tgt_mask, True)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)

    def test_greedy_decode_flat(self):
        model = EmbeddedEncoderDecoder(N=1, d_model=64, dropout=0.0)
        params = init_flat_model(model, jax.random.PRNGKey(1))
        src = jnp.asarray(np.random.RandomState(0).randn(1, 8, TOKEN_DIM), jnp.float32)
        ys = greedy_decode_flat(model, params, src, None, 6)
        assert ys.shape == (1, 6, TOKEN_DIM)
        assert np.all(np.isfinite(np.asarray(ys)))


class TestAutoencoder:
    def test_scalar_stub(self):
        m = GAutoEncoder()
        p = m.init(jax.random.PRNGKey(0), jnp.ones((1, 26, 4)))
        x = jnp.asarray(np.random.RandomState(0).randn(1, 26, 4), jnp.float32)
        out = m.apply(p, x)
        np.testing.assert_allclose(np.asarray(out), 0.1 * np.asarray(x), rtol=1e-6)

    def test_unshuffle(self):
        x = jnp.arange(2 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 3)
        y = gaussian_unshuffle_1d(x)
        assert y.shape == (2, 4, 6)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x.reshape(2, 4, 6)))

    def test_conv_autoencoder_shapes(self):
        m = GConvAutoEncoder(factor=1)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 26, 16), jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(p, x)
        assert out.shape == (2, 26, 16)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_conv_autoencoder_can_fit(self):
        m = GConvAutoEncoder(factor=1)
        x = jnp.asarray(np.random.RandomState(2).randn(1, 26, 32) * 0.5, jnp.float32)
        p = m.init(jax.random.PRNGKey(0), x)
        opt = optax.adam(1e-2)
        st = opt.init(p)

        @jax.jit
        def step(p, st):
            loss, g = jax.value_and_grad(lambda p: jnp.mean((m.apply(p, x) - x) ** 2))(p)
            up, st = opt.update(g, st, p)
            return optax.apply_updates(p, up), st, loss

        losses = []
        for _ in range(40):
            p, st, loss = step(p, st)
            losses.append(float(loss))
        assert losses[-1] < 0.3 * losses[0]
