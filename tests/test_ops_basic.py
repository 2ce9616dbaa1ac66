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
