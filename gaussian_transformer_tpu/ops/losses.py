"""Training losses: L1/L2 and windowed SSIM.

Parity: ``/root/reference/utils/loss_utils.py`` — 11x11 Gaussian window with
sigma=1.5, depthwise 'same' convolution, C1=0.01^2, C2=0.03^2. Images are CHW or
BCHW float in [0,1].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def l1_loss(network_output, gt):
    return jnp.mean(jnp.abs(network_output - gt))


def l2_loss(network_output, gt):
    return jnp.mean((network_output - gt) ** 2)


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float):
    # numpy (not jnp) so the cached value is a host constant, never a tracer.
    import numpy as np

    xs = np.asarray(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    xs = xs / xs.sum()
    return np.outer(xs, xs)


def _filter2d_same(img, window):
    """Depthwise 'same' conv of BCHW images with a KxK window via two separable
    1D convs (cheaper on the VPU than a full KxK kernel; identical result since
    the window is an outer product)."""
    k = window.shape[0]
    b, c, h, w = img.shape
    g1 = jnp.sum(window, axis=1)  # recover the separable 1D factor (rows sum to g_i since sum(g)=1)
    # Rows then columns, grouped (depthwise) convolution.
    kern_row = jnp.tile(g1.reshape(1, 1, k, 1), (c, 1, 1, 1))
    kern_col = jnp.tile(g1.reshape(1, 1, 1, k), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(img.shape, kern_row.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        img, kern_row, (1, 1), [(k // 2, k // 2), (0, 0)], dimension_numbers=dn, feature_group_count=c
    )
    out = jax.lax.conv_general_dilated(
        out, kern_col, (1, 1), [(0, 0), (k // 2, k // 2)], dimension_numbers=dn, feature_group_count=c
    )
    return out


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    """Windowed SSIM. Accepts CHW or BCHW; returns scalar mean (size_average) or
    per-batch means."""
    squeeze = False
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
        squeeze = True
    window = _gaussian_window(window_size, 1.5).astype(img1.dtype)

    mu1 = _filter2d_same(img1, window)
    mu2 = _filter2d_same(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d_same(img1 * img1, window) - mu1_sq
    sigma2_sq = _filter2d_same(img2 * img2, window) - mu2_sq
    sigma12 = _filter2d_same(img1 * img2, window) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))

    if size_average:
        return jnp.mean(ssim_map)
    per_batch = jnp.mean(ssim_map, axis=(1, 2, 3))
    return per_batch[0] if squeeze else per_batch
