"""Model-layer tests: torch parity for the core modules (LayerNorm / FFN /
attention math), causality, codec roundtrips, box_sort ordering parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.models.transformer import (
    EncoderDecoder,
    FeedForward,
    MultiHeadedAttention,
    TorchLayerNorm,
    init_model,
    make_model,
    subsequent_mask,
)
from gaussian_transformer_tpu.models.codec import (
    END_GAUSSIAN,
    PAD_GAUSSIAN,
    START_GAUSSIAN,
    TOKEN_DIM,
    flatten_gaussians,
    fuzzy_token_equal,
    stack_tokens,
    unflatten_gaussians,
    unstack_tokens,
)
from gaussian_transformer_tpu.models.box_sort import GaussianHandler

from tests.test_render import make_scene


class TestTorchParity:
    def test_layernorm_matches_reference_math(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(0)
        x = rng.randn(2, 5, 16).astype(np.float32)
        ln = TorchLayerNorm()
        params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = ln.apply(params, jnp.asarray(x))
        # Reference LayerNorm (model/shared.py:13-24): a2*(x-mean)/(std+eps)+b2
        xt = torch.from_numpy(x)
        mean = xt.mean(-1, keepdim=True)
        std = xt.std(-1, keepdim=True)  # unbiased
        ref = (xt - mean) / (std + 1e-5)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    def test_ffn_matches_torch_swiglu(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(1)
        d = 8
        x = rng.randn(2, 3, d).astype(np.float32)
        ffn = FeedForward(d_model=d, d_ff=2 * d, dropout=0.0)
        params = ffn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        ours = np.asarray(ffn.apply(params, jnp.asarray(x)))

        w1 = np.asarray(params["params"]["w_1"]["kernel"])  # [d, 2d]
        b1 = np.asarray(params["params"]["w_1"]["bias"])
        w2 = np.asarray(params["params"]["w_2"]["kernel"])  # [d, d]
        b2 = np.asarray(params["params"]["w_2"]["bias"])
        # .copy(): jax arrays surface as non-writable numpy views, which
        # torch.from_numpy warns about.
        xt = torch.from_numpy(x.copy())
        h = xt @ torch.from_numpy(w1.copy()) + torch.from_numpy(b1.copy())
        a, b = h.chunk(2, -1)
        h = torch.nn.functional.silu(a) * b  # SwiGLU
        ref = (h @ torch.from_numpy(w2.copy()) + torch.from_numpy(b2.copy())).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_attention_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.RandomState(2)
        d, h, L = 16, 4, 6
        x = rng.randn(1, L, d).astype(np.float32)
        mha = MultiHeadedAttention(h=h, d_model=d, dropout=0.0)
        params = mha.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
            subsequent_mask(L),
        )
        ours = np.asarray(
            mha.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), subsequent_mask(L))
        )

        def lin(name, v):
            k = np.asarray(params["params"][name]["kernel"])
            b = np.asarray(params["params"][name]["bias"])
            return v @ torch.from_numpy(k) + torch.from_numpy(b)

        xt = torch.from_numpy(x)
        q = lin("q", xt).view(1, L, h, d // h).transpose(1, 2)
        k = lin("k", xt).view(1, L, h, d // h).transpose(1, 2)
        v = lin("v", xt).view(1, L, h, d // h).transpose(1, 2)
        scores = q @ k.transpose(-2, -1) / np.sqrt(d // h)
        mask = torch.from_numpy(np.asarray(subsequent_mask(L)))[:, None]
        scores = scores.masked_fill(mask == 0, -1e4)
        attn = torch.softmax(scores, -1)
        out = (attn @ v).transpose(1, 2).reshape(1, L, d)
        ref = lin("out", out).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestModel:
    def test_forward_shapes_and_generator(self):
        model = make_model(0, src_g_len=32, tgt_g_len=32, N=2, d_model=32)
        variables = init_model(model, jax.random.PRNGKey(0))
        src = jnp.asarray(np.random.RandomState(0).randn(2, 10, 32), jnp.float32)
        tgt = jnp.asarray(np.random.RandomState(1).randn(2, 7, 32), jnp.float32)
        out = model.apply(
            variables, src, tgt, jnp.ones((2, 1, 10), bool), subsequent_mask(7), True
        )
        assert out.shape == (2, 7, 32)
        gen = model.apply(variables, out, method=EncoderDecoder.generator)
        assert gen.shape == (2, 7, 32)
        assert np.all(np.isfinite(np.asarray(gen)))

    def test_causal_masking(self):
        """Decoder output at position i must not depend on tgt positions > i."""
        model = make_model(0, 32, 32, N=1, d_model=32, dropout=0.0)
        variables = init_model(model, jax.random.PRNGKey(0))
        rng = np.random.RandomState(3)
        src = jnp.asarray(rng.randn(1, 5, 32), jnp.float32)
        tgt = jnp.asarray(rng.randn(1, 6, 32), jnp.float32)
        mask = subsequent_mask(6)
        out1 = model.apply(variables, src, tgt, None, mask, True)
        tgt2 = tgt.at[0, 4].add(100.0)  # perturb a LATER position
        out2 = model.apply(variables, src, tgt2, None, mask, True)
        np.testing.assert_allclose(
            np.asarray(out1[0, :4]), np.asarray(out2[0, :4]), atol=1e-4
        )
        assert np.abs(np.asarray(out1[0, 4:]) - np.asarray(out2[0, 4:])).max() > 1e-3

    def test_dropout_only_in_training(self):
        model = make_model(0, 32, 32, N=1, d_model=32, dropout=0.5)
        variables = init_model(model, jax.random.PRNGKey(0))
        rng = np.random.RandomState(4)
        src = jnp.asarray(rng.randn(1, 4, 32), jnp.float32)
        tgt = jnp.asarray(rng.randn(1, 4, 32), jnp.float32)
        a = model.apply(variables, src, tgt, None, subsequent_mask(4), True)
        b = model.apply(variables, src, tgt, None, subsequent_mask(4), True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # deterministic
        c = model.apply(
            variables, src, tgt, None, subsequent_mask(4), False,
            rngs={"dropout": jax.random.PRNGKey(7)},
        )
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


class TestCodec:
    def test_flatten_unflatten_roundtrip(self):
        scene = make_scene(12, seed=0)
        tokens = flatten_gaussians(scene)
        assert tokens.shape == (12, TOKEN_DIM)
        back = unflatten_gaussians(tokens)
        np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(scene.xyz), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.scaling), np.asarray(scene.scaling), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.rotation), np.asarray(scene.rotation), atol=1e-6)
        np.testing.assert_allclose(np.asarray(back.opacity), np.asarray(scene.opacity), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(back.features_dc), np.asarray(scene.features_dc), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(back.features_rest), np.asarray(scene.features_rest), atol=1e-6
        )

    def test_special_tokens(self):
        # Layout parity: train_stacked_transformer.py:29-36.
        s = np.asarray(START_GAUSSIAN)
        assert s[23] == 1 and s[16] == -5 and np.all(s[20:23] == -5)
        assert np.asarray(PAD_GAUSSIAN)[24] == 1
        assert np.asarray(END_GAUSSIAN)[25] == 1
        toks = jnp.stack([START_GAUSSIAN, PAD_GAUSSIAN, END_GAUSSIAN])
        assert list(np.asarray(fuzzy_token_equal(toks, PAD_GAUSSIAN))) == [False, True, False]

    def test_stack_unstack_roundtrip(self):
        rng = np.random.RandomState(5)
        t = jnp.asarray(rng.randn(64, TOKEN_DIM), jnp.float32)
        for times in (1, 3):
            s = stack_tokens(t, times)
            assert s.shape == (64 // 2**times, TOKEN_DIM * 2**times)
            np.testing.assert_array_equal(np.asarray(unstack_tokens(s, times)), np.asarray(t))

    def test_stack_groups_contiguous(self):
        """Row i of the folded sequence is the concat of rows 2^k*i .. 2^k*(i+1)-1."""
        t = jnp.arange(8, dtype=jnp.float32)[:, None] * jnp.ones((1, 2))
        s = stack_tokens(t, 2)
        np.testing.assert_array_equal(
            np.asarray(s[0]), np.array([0, 0, 1, 1, 2, 2, 3, 3], np.float32)
        )


class TestBoxSort:
    def test_normalize_roundtrip_and_range(self):
        scene = make_scene(50, seed=6)
        h = GaussianHandler.create(scene, interval_num=5)
        norm = h.normalize(scene)
        xyzn = np.asarray(norm.xyz)
        assert xyzn.min() >= -1e-6 and xyzn.max() <= 1 + 1e-6
        back = h.denormalize(norm)
        np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(scene.xyz), atol=1e-4)
        np.testing.assert_allclose(np.asarray(back.scaling), np.asarray(scene.scaling), atol=1e-5)

    def test_box_sort_matches_reference_scan(self):
        """Stable argsort by voxel == the reference's per-voxel gather loop."""
        scene = make_scene(80, seed=7)
        n = 4
        h = GaussianHandler.create(scene, interval_num=n)
        tokens_sorted = np.asarray(h.box_sort(scene))

        # numpy reimplementation of the reference loop (box_sort.py:49-67),
        # with the boundary clamp our version applies.
        norm = h.normalize(scene)
        tokens = np.asarray(flatten_gaussians(norm))
        xyz = np.asarray(norm.xyz)
        cell = np.clip((xyz * n).astype(int), 0, n - 1)
        out = []
        for i in range(n**3):
            x, y, z = i % n, (i // n) % n, i // n**2
            mask = (cell[:, 0] == x) & (cell[:, 1] == y) & (cell[:, 2] == z)
            out.append(tokens[mask])
        ref = np.concatenate(out, axis=0)
        np.testing.assert_allclose(tokens_sorted, ref, atol=0)

    def test_dead_slots_sort_last(self):
        scene = make_scene(10, seed=8, capacity=16)
        h = GaussianHandler.create(scene, interval_num=3)
        tokens = np.asarray(h.box_sort(scene))
        assert tokens.shape == (16, TOKEN_DIM)


class TestBf16:
    def test_bf16_close_to_fp32(self):
        model32 = make_model(0, 32, 32, N=1, d_model=32, dropout=0.0)
        model16 = make_model(0, 32, 32, N=1, d_model=32, dropout=0.0, dtype=jnp.bfloat16)
        variables = init_model(model32, jax.random.PRNGKey(0))
        rng = np.random.RandomState(9)
        src = jnp.asarray(rng.randn(1, 6, 32), jnp.float32)
        tgt = jnp.asarray(rng.randn(1, 5, 32), jnp.float32)
        a = model32.apply(variables, src, tgt, None, subsequent_mask(5), True)
        b = model16.apply(variables, src, tgt, None, subsequent_mask(5), True)
        # Params stay fp32 and are shared; bf16 matmuls -> ~1e-2 relative noise.
        assert np.abs(np.asarray(b, np.float32) - np.asarray(a)).max() < 0.15
        # And the param trees are identical shapes (mixed precision, not cast).
        assert jax.tree.all(
            jax.tree.map(lambda x: x.dtype == jnp.float32, variables)
        )
