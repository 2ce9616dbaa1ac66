"""Blockwise + ring attention tests: exactness vs the reference O(L^2) math,
gradients, mask semantics, and multi-device ring execution on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.ops.attention import (
    blockwise_attention,
    reference_attention,
)


def rand_qkv(rng, B=2, H=2, Lq=33, Lk=57, D=16):
    return (
        jnp.asarray(rng.randn(B, H, Lq, D), jnp.float32),
        jnp.asarray(rng.randn(B, H, Lk, D), jnp.float32),
        jnp.asarray(rng.randn(B, H, Lk, D), jnp.float32),
    )


class TestBlockwise:
    @pytest.mark.parametrize("block_k", [8, 16, 64])
    def test_matches_reference_unmasked(self, block_k):
        q, k, v = rand_qkv(np.random.RandomState(0))
        ref = reference_attention(q, k, v)
        out = blockwise_attention(q, k, v, block_k=block_k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_matches_reference_causal_mask(self):
        rng = np.random.RandomState(1)
        q, k, v = rand_qkv(rng, Lq=40, Lk=40)
        mask = jnp.asarray(np.tril(np.ones((40, 40), bool)))[None, None]
        ref = reference_attention(q, k, v, mask)
        out = blockwise_attention(q, k, v, mask=mask, block_k=16)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_grads_match(self):
        rng = np.random.RandomState(2)
        q, k, v = rand_qkv(rng, Lq=24, Lk=31, D=8)
        mask = jnp.asarray(rng.rand(1, 1, 24, 31) > 0.3)

        def loss_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v, mask) ** 2)

        def loss_blk(q, k, v):
            return jnp.sum(blockwise_attention(q, k, v, mask=mask, block_k=8) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_blk = jax.grad(loss_blk, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ref, g_blk):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    def test_dropout_matches_dense_reconstruction(self):
        """Blockwise numerator-masked dropout == dense dropout(softmax(s)) @ V
        with the same per-block Bernoulli keep masks."""
        from gaussian_transformer_tpu.ops.attention import MASK_FILL

        rng = np.random.RandomState(6)
        B, H, Lq, Lk, D, block_k, rate = 2, 2, 16, 32, 8, 8, 0.3
        q, k, v = rand_qkv(rng, B=B, H=H, Lq=Lq, Lk=Lk, D=D)
        key = jax.random.PRNGKey(7)
        out = blockwise_attention(
            q, k, v, block_k=block_k, dropout_rate=rate, dropout_rng=key
        )
        # Rebuild the exact keep masks the kernel streams (fold_in per block).
        keeps = [
            jax.random.bernoulli(
                jax.random.fold_in(key, i), 1.0 - rate, (B, H, Lq, block_k)
            )
            for i in range(Lk // block_k)
        ]
        keep = jnp.concatenate(keeps, axis=-1)
        scores = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(jnp.asarray(D, q.dtype))
        p = jax.nn.softmax(scores, axis=-1)
        ref = jnp.einsum("...qk,...kd->...qd", p * keep / (1.0 - rate), v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_mha_blockwise_dropout_train_mode(self):
        """deterministic=False on the blockwise path applies dropout (output
        differs from eval mode) and stays finite."""
        from gaussian_transformer_tpu.models.transformer import MultiHeadedAttention

        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(1, 30, 32), jnp.float32)
        mha = MultiHeadedAttention(h=4, d_model=32, dropout=0.5, block_k=8)
        params = mha.init(jax.random.PRNGKey(0), x, x, x, None)
        eval_out = mha.apply(params, x, x, x, None, True)
        train_out = mha.apply(
            params, x, x, x, None, False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
        assert np.all(np.isfinite(np.asarray(train_out)))
        assert not np.allclose(np.asarray(train_out), np.asarray(eval_out), atol=1e-3)

    def test_mha_blockwise_matches_dense(self):
        from gaussian_transformer_tpu.models.transformer import MultiHeadedAttention

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 30, 32), jnp.float32)
        mask = jnp.asarray(np.tril(np.ones((1, 30, 30), bool)))
        dense = MultiHeadedAttention(h=4, d_model=32, dropout=0.0)
        blk = MultiHeadedAttention(h=4, d_model=32, dropout=0.0, block_k=8)
        params = dense.init(jax.random.PRNGKey(0), x, x, x, mask)
        a = dense.apply(params, x, x, x, mask)
        b = blk.apply(params, x, x, x, mask)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


class TestRing:
    def test_ring_matches_reference(self):
        from gaussian_transformer_tpu.parallel.mesh import make_mesh
        from gaussian_transformer_tpu.parallel.ring import ring_attention

        devices = jax.devices()
        n = min(4, len(devices))
        mesh = make_mesh(devices[:n], data=1)
        rng = np.random.RandomState(4)
        L = 8 * n
        q, k, v = rand_qkv(rng, B=1, H=2, Lq=L, Lk=L, D=8)
        ref = reference_attention(q, k, v)
        out = ring_attention(q, k, v, None, mesh, axis="gauss")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_ring_with_causal_mask(self):
        from gaussian_transformer_tpu.parallel.mesh import make_mesh
        from gaussian_transformer_tpu.parallel.ring import ring_attention

        devices = jax.devices()
        n = min(4, len(devices))
        mesh = make_mesh(devices[:n], data=1)
        rng = np.random.RandomState(5)
        L = 8 * n
        q, k, v = rand_qkv(rng, B=1, H=1, Lq=L, Lk=L, D=8)
        mask = jnp.asarray(np.tril(np.ones((L, L), bool)))[None, None]
        ref = reference_attention(q, k, v, mask)
        out = ring_attention(q, k, v, mask, mesh, axis="gauss")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


class TestUlysses:
    """All-to-all head-sharded sequence parallelism (parallel/ulysses.py) —
    must be EXACT vs the O(L^2) reference (dense math per head group)."""

    def _mesh(self, n):
        from gaussian_transformer_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        if len(devices) < n:
            pytest.skip(f"needs {n} virtual devices")
        return make_mesh(devices[:n], data=1)

    def test_matches_reference_unmasked(self):
        from gaussian_transformer_tpu.parallel.ulysses import ulysses_attention

        mesh = self._mesh(4)
        rng = np.random.RandomState(11)
        q, k, v = rand_qkv(rng, B=2, H=4, Lq=32, Lk=32, D=8)
        ref = reference_attention(q, k, v)
        out = ulysses_attention(q, k, v, None, mesh, axis="gauss")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_with_causal_mask_and_grads(self):
        from gaussian_transformer_tpu.parallel.ulysses import ulysses_attention

        mesh = self._mesh(4)
        rng = np.random.RandomState(12)
        L = 32
        q, k, v = rand_qkv(rng, B=1, H=4, Lq=L, Lk=L, D=8)
        mask = jnp.asarray(np.tril(np.ones((L, L), bool)))[None, None]

        def f_ref(q, k, v):
            return jnp.sum(reference_attention(q, k, v, mask) ** 2)

        def f_uly(q, k, v):
            return jnp.sum(ulysses_attention(q, k, v, mask, mesh) ** 2)

        ga = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(f_uly, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)

    def test_per_head_mask(self):
        from gaussian_transformer_tpu.parallel.ulysses import ulysses_attention

        mesh = self._mesh(4)
        rng = np.random.RandomState(13)
        L, H = 16, 8
        q, k, v = rand_qkv(rng, B=1, H=H, Lq=L, Lk=L, D=8)
        mask = jnp.asarray(rng.rand(1, H, L, L) > 0.3)
        ref = reference_attention(q, k, v, mask)
        out = ulysses_attention(q, k, v, mask, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
