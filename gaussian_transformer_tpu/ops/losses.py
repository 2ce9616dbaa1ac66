"""Training losses: L1/L2 and windowed SSIM.

Parity: ``/root/reference/utils/loss_utils.py`` — 11x11 Gaussian window with
sigma=1.5, depthwise 'same' convolution, C1=0.01^2, C2=0.03^2. Images are CHW or
BCHW float in [0,1].
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp


def l1_loss(network_output, gt):
    return jnp.mean(jnp.abs(network_output - gt))


def l2_loss(network_output, gt):
    return jnp.mean((network_output - gt) ** 2)


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float):
    # numpy (not jnp) so the cached value is a host constant, never a tracer.
    xs = np.asarray(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)],
        dtype=np.float32,
    )
    xs = xs / xs.sum()
    return np.outer(xs, xs)


def _under_batch_trace(*xs) -> bool:
    """True when any arg is (or wraps) a vmap BatchTracer. The fused Pallas
    SSIM kernel has no batching rule — vmap of its pallas_call fails at Mosaic
    lowering — so the dispatch must route batched traces to the XLA path
    (parallel/step.py vmaps the per-camera loss on the mesh=None batched
    train step)."""
    from jax._src.interpreters import batching

    for x in xs:
        t = x
        for _ in range(32):  # descend through tracer wrappers (JVP etc.)
            if not isinstance(t, jax.core.Tracer):
                break
            if isinstance(t, batching.BatchTracer):
                return True
            nxt = getattr(t, "val", None)
            if nxt is None:
                nxt = getattr(t, "primal", None)
            if nxt is None:
                break
            t = nxt
    return False


def _filter2d_same(img, window):
    """Depthwise 'same' conv of BCHW images with a KxK separable window via
    explicit shift-and-accumulate (two 1-D passes of K fused multiply-adds).
    Depthwise grouped convolutions lower poorly on the TPU (no MXU mapping,
    ~10ms at 1080p); K slice-adds stay on the VPU and fuse to ~1ms."""
    k = window.shape[0]
    half = k // 2
    g1 = np.asarray(window).sum(axis=1)  # separable 1-D factor (sum(window)=1)

    def pass_along(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (half, half)
        xp = jnp.pad(x, pad)
        n = x.shape[axis]
        acc = None
        for i in range(k):
            sl = jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
            acc = sl * g1[i] if acc is None else acc + sl * g1[i]
        return acc

    return pass_along(pass_along(img, 2), 3)


def ssim(img1, img2, window_size: int = 11, size_average: bool = True):
    """Windowed SSIM. Accepts CHW or BCHW; returns scalar mean (size_average) or
    per-batch means.

    On TPU the default 11x11/size-average case dispatches to the fused Pallas
    forward/backward (ops.fused_ssim) — measured 5.6 -> 0.97 ms forward and
    12.9 -> 2.2 ms gradient at 1080p, bit-identical to ~1e-9 (the XLA path
    materializes the 5-field filtered intermediates in HBM; the kernel streams
    row bands through VMEM). GT_FUSED_SSIM=0 restores the XLA path."""
    if (
        window_size == 11
        and size_average
        and img1.dtype == jnp.float32
        and img2.dtype == jnp.float32
        and img1.shape == img2.shape
        and jax.default_backend() == "tpu"
        and os.environ.get("GT_FUSED_SSIM", "1") != "0"
        and not _under_batch_trace(img1, img2)
    ):
        from gaussian_transformer_tpu.ops.fused_ssim import fused_ssim

        return fused_ssim(img1, img2)
    squeeze = False
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
        squeeze = True
    window = _gaussian_window(window_size, 1.5).astype(img1.dtype)

    # One stacked filter pass over the five fields (means, raw second
    # moments, cross moment) instead of five separate ones — same bytes per
    # field but a single fused shift-accumulate pipeline.
    fields = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=1
    )
    filt = _filter2d_same(fields, window)
    nc = img1.shape[1]
    mu1, mu2, m11, m22, m12 = (
        filt[:, i * nc : (i + 1) * nc] for i in range(5)
    )
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))

    if size_average:
        return jnp.mean(ssim_map)
    per_batch = jnp.mean(ssim_map, axis=(1, 2, 3))
    return per_batch[0] if squeeze else per_batch
