"""Gaussian-token autoencoder family.

Parity: ``/root/reference/model/autoencoder.py`` — the ACTIVE reference model
is a degenerate scalar stub ``w * x`` (:15-23, w init 0.1); the real
architecture (strided-Conv1d ``GEncoder`` downsampler and ``GDecoder`` with a
pixel-shuffle-style ``GaussianUnshuffle1D`` upsampler, :27-62) exists but is
commented out / unused there. Both are implemented here — the stub as the
default (so the trainer reproduces the reference experiment exactly) and the
conv pair as working modules.

Sequence layout is channels-first [B, C=26, L] at the module boundary, like
the torch Conv1d modules (the trainer transposes around the call,
train_autoencoder.py:148).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class GAutoEncoder(nn.Module):
    """The reference's active model: a single scalar weight (autoencoder.py:15-23)."""

    factor: int = 1

    @nn.compact
    def __call__(self, x):
        w = self.param("w", lambda k: jnp.asarray([0.1]))
        return w * x


class GEncoder(nn.Module):
    """Strided-Conv1d downsampler (autoencoder.py:27-41): 26 -> 32 channels,
    then per level a stride-2 conv k=5 doubling channels + 3 residual-free
    k=3 convs, SiLU activations."""

    factor: int = 1

    @nn.compact
    def __call__(self, x):  # [B, 26, L]
        x = x.transpose(0, 2, 1)  # [B, L, C]
        x = nn.Conv(32, (1,), name="stem0")(x)
        x = nn.Conv(32, (1,), name="stem1")(x)
        for i in range(3):
            x = nn.Conv(32, (1,), name=f"stem2_{i}")(x)
        for i in range(0, self.factor - 1):
            out_d = 2**i * 32
            x = nn.Conv(out_d, (5,), strides=(2,), padding=[(2, 2)], name=f"down{i}")(x)
            x = jax.nn.silu(x)
            for j in range(3):
                x = nn.Conv(out_d, (3,), padding=[(1, 1)], name=f"down{i}_conv{j}")(x)
                x = jax.nn.silu(x)
        return x.transpose(0, 2, 1)


def gaussian_unshuffle_1d(x):
    """[B, C, L] -> [B, C/2, 2L] (autoencoder.py:43-49)."""
    b, c, l = x.shape
    return x.reshape(b, c // 2, l * 2)


class GDecoder(nn.Module):
    """Upsampler inverse of GEncoder (autoencoder.py:51-62)."""

    factor: int = 1

    @nn.compact
    def __call__(self, x):  # [B, C, L]
        for i in range(self.factor - 1, 0, -1):
            out_d = 2**i * 64
            x = gaussian_unshuffle_1d(x)
            x = jax.nn.silu(x)
            h = x.transpose(0, 2, 1)
            for j in range(3):
                h = nn.Conv(out_d, (3,), padding=[(1, 1)], name=f"up{i}_conv{j}")(h)
            x = h.transpose(0, 2, 1)
        h = x.transpose(0, 2, 1)
        h = nn.Conv(26, (1,), name="head")(h)
        return h.transpose(0, 2, 1)


class GConvAutoEncoder(nn.Module):
    """The full (reference-disabled) encoder-decoder pair, usable here."""

    factor: int = 1

    @nn.compact
    def __call__(self, x):
        return GDecoder(self.factor, name="decoder")(GEncoder(self.factor, name="encoder")(x))
