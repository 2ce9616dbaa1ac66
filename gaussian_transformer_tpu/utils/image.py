"""Image metrics (PSNR/MSE). Parity: /root/reference/utils/image_utils.py."""

from __future__ import annotations

import jax.numpy as jnp


def mse(img1, img2):
    """Per-image MSE over all but the leading axis; returns [B, 1]."""
    b = img1.shape[0]
    return jnp.mean((img1 - img2).reshape(b, -1) ** 2, axis=1, keepdims=True)


def psnr(img1, img2):
    """Peak SNR for [0,1] images, per leading-axis element; returns [B, 1]."""
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))
