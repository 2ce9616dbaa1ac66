import numpy as np
import jax
import jax.numpy as jnp

from gaussian_transformer_tpu.ops import l1_loss, ssim, mean_sq_dist_to_3nn, chamfer_distance


class TestSSIM:
    def test_identical_images(self):
        img = jnp.asarray(np.random.RandomState(0).rand(3, 32, 32).astype(np.float32))
        assert float(ssim(img, img)) > 0.999

    def test_different_images_lower(self):
        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
        b = jnp.asarray(rng.rand(3, 32, 32).astype(np.float32))
        assert float(ssim(a, b)) < 0.5

    def test_matches_torch_reference(self):
        """Cross-check against a direct torch implementation of the reference's
        SSIM (11x11 gaussian window, sigma 1.5, same conv)."""
        import torch
        import torch.nn.functional as F
        from math import exp

        def torch_ssim(img1, img2, window_size=11):
            gauss = torch.tensor([exp(-((x - window_size // 2) ** 2) / (2 * 1.5**2)) for x in range(window_size)])
            gauss = gauss / gauss.sum()
            w1 = gauss.unsqueeze(1)
            window = w1.mm(w1.t()).unsqueeze(0).unsqueeze(0)
            channel = img1.size(-3)
            window = window.expand(channel, 1, window_size, window_size).contiguous()
            pad = window_size // 2
            mu1 = F.conv2d(img1, window, padding=pad, groups=channel)
            mu2 = F.conv2d(img2, window, padding=pad, groups=channel)
            mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
            s1 = F.conv2d(img1 * img1, window, padding=pad, groups=channel) - mu1_sq
            s2 = F.conv2d(img2 * img2, window, padding=pad, groups=channel) - mu2_sq
            s12 = F.conv2d(img1 * img2, window, padding=pad, groups=channel) - mu1_mu2
            C1, C2 = 0.01**2, 0.03**2
            m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
            return m.mean().item()

        rng = np.random.RandomState(2)
        a = rng.rand(1, 3, 24, 24).astype(np.float32)
        b = np.clip(a + 0.1 * rng.randn(1, 3, 24, 24).astype(np.float32), 0, 1)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = torch_ssim(torch.from_numpy(a), torch.from_numpy(b))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    def test_grad_flows(self):
        rng = np.random.RandomState(3)
        a = jnp.asarray(rng.rand(3, 16, 16).astype(np.float32))
        b = jnp.asarray(rng.rand(3, 16, 16).astype(np.float32))
        g = jax.grad(lambda x: 1.0 - ssim(x, b))(a)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0


class TestKNN:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        pts = rng.randn(300, 3).astype(np.float32)
        d2 = pts[:, None, :] - pts[None, :, :]
        d2 = (d2**2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3].mean(1)
        got = np.asarray(mean_sq_dist_to_3nn(jnp.asarray(pts), block=128))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)

    def test_nonmultiple_of_block(self):
        rng = np.random.RandomState(1)
        pts = rng.randn(77, 3).astype(np.float32)
        got = np.asarray(mean_sq_dist_to_3nn(jnp.asarray(pts), block=32))
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        expected = np.sort(d2, axis=1)[:, :3].mean(1)
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)


class TestChamfer:
    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        a = rng.randn(2, 100, 8).astype(np.float32)
        b = rng.randn(2, 150, 8).astype(np.float32)
        d1, d2, i1, i2 = chamfer_distance(jnp.asarray(a), jnp.asarray(b), block=64)
        full = ((a[:, :, None, :] - b[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(d1), full.min(2), rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), full.min(1), rtol=1e-3, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), full.argmin(2))
        np.testing.assert_array_equal(np.asarray(i2), full.argmin(1))

    def test_zero_for_identical_sets(self):
        rng = np.random.RandomState(1)
        a = rng.randn(1, 64, 4).astype(np.float32)
        d1, d2, _, _ = chamfer_distance(jnp.asarray(a), jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(d1), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), 0.0, atol=1e-5)

    def test_larger_batches_unrolled(self):
        """B=8/16 on the Python-unrolled batch path (VERDICT r4 #9): values
        match the per-element bruteforce and grads stay finite. The unroll
        exists to dodge a pinned TPU scatter-fusion crash (see
        tests/test_chip.py::test_chamfer_vmap_scatter_repro)."""
        for B in (8, 16):
            rng = np.random.RandomState(B)
            a = jnp.asarray(rng.randn(B, 24, 5).astype(np.float32))
            b = jnp.asarray(rng.randn(B, 36, 5).astype(np.float32))
            d1, d2, i1, i2 = chamfer_distance(a, b)
            assert d1.shape == (B, 24) and d2.shape == (B, 36)
            an, bn = np.asarray(a), np.asarray(b)
            for i in range(0, B, max(1, B // 4)):
                full = ((an[i][:, None, :] - bn[i][None, :, :]) ** 2).sum(-1)
                np.testing.assert_allclose(np.asarray(d1[i]), full.min(1), rtol=1e-4, atol=1e-5)
                np.testing.assert_allclose(np.asarray(d2[i]), full.min(0), rtol=1e-4, atol=1e-5)

            g = jax.grad(
                lambda x, y: jnp.mean(chamfer_distance(x, y)[0])
                + jnp.mean(chamfer_distance(x, y)[1])
            )(a, b)
            assert np.isfinite(np.asarray(g)).all()

    def test_grad_matches_matched_pairs(self):
        rng = np.random.RandomState(2)
        a = jnp.asarray(rng.randn(1, 32, 3).astype(np.float32))
        b = jnp.asarray(rng.randn(1, 48, 3).astype(np.float32))

        def loss(a_, b_):
            d1, d2, _, _ = chamfer_distance(a_, b_)
            return jnp.mean(d1) + jnp.mean(d2)

        g = jax.grad(loss)(a, b)
        assert np.isfinite(np.asarray(g)).all()
        # Finite-difference check along one coordinate.
        eps = 1e-3
        da = np.zeros_like(np.asarray(a))
        da[0, 5, 1] = eps
        f1 = float(loss(a + da, b))
        f0 = float(loss(a - da, b))
        np.testing.assert_allclose((f1 - f0) / (2 * eps), float(g[0, 5, 1]), rtol=1e-2, atol=1e-3)


class TestFusedSSIM:
    """Fused Pallas SSIM (ops/fused_ssim.py) == the XLA ssim, value and grad.

    The TPU dispatch in losses.ssim routes the default 11x11/size-average
    case through this op; these tests pin both the analytic backward (jnp
    path) and the Pallas kernels (interpret mode) against jax.grad of the
    reference implementation."""

    def _pair(self, shape, seed=0):
        rng = np.random.RandomState(seed)
        return (
            jnp.asarray(rng.rand(*shape).astype(np.float32)),
            jnp.asarray(rng.rand(*shape).astype(np.float32)),
        )

    def test_jnp_backend_matches_reference(self):
        from gaussian_transformer_tpu.ops.fused_ssim import fused_ssim

        for shape in [(3, 37, 53), (3, 70, 129), (2, 3, 64, 200)]:
            a, b = self._pair(shape)
            ref = ssim(a, b)
            assert abs(float(fused_ssim(a, b, "jnp") - ref)) < 1e-6
            ga, gb = jax.grad(lambda x, y: ssim(x, y), argnums=(0, 1))(a, b)
            fa, fb = jax.grad(
                lambda x, y: fused_ssim(x, y, "jnp"), argnums=(0, 1)
            )(a, b)
            assert float(jnp.abs(fa - ga).max()) < 1e-8
            assert float(jnp.abs(fb - gb).max()) < 1e-8

    def test_pallas_interpret_matches_reference(self):
        from gaussian_transformer_tpu.ops.fused_ssim import fused_ssim

        a, b = self._pair((3, 70, 140), seed=1)
        ref = ssim(a, b)
        assert abs(float(fused_ssim(a, b, "pallas_interpret") - ref)) < 1e-6
        ga = jax.grad(lambda x: ssim(x, b))(a)
        fa = jax.grad(lambda x: fused_ssim(x, b, "pallas_interpret"))(a)
        assert float(jnp.abs(fa - ga).max()) < 1e-8
        # gt-side cotangent too (both come out of the same bwd kernel)
        gb = jax.grad(lambda y: ssim(a, y))(b)
        fb = jax.grad(lambda y: fused_ssim(a, y, "pallas_interpret"))(b)
        assert float(jnp.abs(fb - gb).max()) < 1e-8

    def test_band_boundaries_and_tiny_images(self):
        """H crossing the BH=64 band size exactly / by one, and tiny H/W."""
        from gaussian_transformer_tpu.ops.fused_ssim import fused_ssim

        for shape in [(1, 64, 128), (1, 65, 128), (1, 128, 131), (1, 9, 7)]:
            a, b = self._pair(shape, seed=2)
            ref = ssim(a, b)
            assert abs(float(fused_ssim(a, b, "pallas_interpret") - ref)) < 1e-6, shape

    def test_batch_trace_detection(self):
        """losses._under_batch_trace: True under vmap (incl. grad-of-vmap),
        False under plain jit/grad — the TPU dispatch must not route a
        vmapped trace into the fused kernel (no batching rule)."""
        from gaussian_transformer_tpu.ops.losses import _under_batch_trace

        seen = {}

        def probe(tag):
            def f(x):
                seen[tag] = _under_batch_trace(x)
                return jnp.sum(x * x)
            return f

        x = jnp.ones((4, 8))
        probe("plain")(x)
        jax.jit(probe("jit"))(x)
        jax.grad(lambda x: probe("grad")(x))(x)
        jax.vmap(probe("vmap"))(x)
        jax.grad(lambda x: jnp.sum(jax.vmap(probe("grad_vmap"))(x)))(x)
        jax.jit(lambda x: jax.vmap(probe("jit_vmap"))(x))(x)
        assert not seen["plain"] and not seen["jit"] and not seen["grad"]
        assert seen["vmap"] and seen["grad_vmap"] and seen["jit_vmap"]

    def test_vmap_dispatch_routes_to_xla(self, monkeypatch):
        """With the backend reported as TPU, a vmapped ssim must NOT engage
        the fused kernel (ADVICE r4: vmap of the pallas_call fails at Mosaic
        lowering) and must still produce the correct per-element values."""
        import gaussian_transformer_tpu.ops.losses as losses

        rng = np.random.RandomState(7)
        a = jnp.asarray(rng.rand(3, 3, 33, 47).astype(np.float32))
        b = jnp.asarray(rng.rand(3, 3, 33, 47).astype(np.float32))
        ref = jnp.stack([ssim(a[i], b[i]) for i in range(3)])

        import gaussian_transformer_tpu.ops.fused_ssim as fs

        def boom(*args, **kwargs):
            raise AssertionError("fused_ssim engaged under vmap")

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(fs, "fused_ssim", boom)
        out = jax.vmap(losses.ssim)(a, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
        # grad-of-vmap (the actual parallel/step.py shape) also stays off it
        g = jax.grad(lambda x: jnp.sum(jax.vmap(losses.ssim)(x, b)))(a)
        assert np.isfinite(np.asarray(g)).all()

    def test_mixed_dtype_skips_fused_dispatch(self, monkeypatch):
        """f32 prediction vs non-f32 gt must use the dtype-promoting XLA
        path, not the f32-scratch kernel (ADVICE r4 low)."""
        import gaussian_transformer_tpu.ops.losses as losses
        import gaussian_transformer_tpu.ops.fused_ssim as fs

        def boom(*args, **kwargs):
            raise AssertionError("fused_ssim engaged on mixed dtypes")

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(fs, "fused_ssim", boom)
        rng = np.random.RandomState(8)
        a = jnp.asarray(rng.rand(3, 32, 40).astype(np.float32))
        b = a.astype(jnp.bfloat16)
        out = losses.ssim(a, b)
        assert float(out) > 0.9  # near-identical images
