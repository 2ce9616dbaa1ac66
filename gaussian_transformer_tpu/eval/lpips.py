"""LPIPS perceptual metric in JAX (vgg / alex backbones).

Architecture parity with the vendored ``/root/reference/lpipsPyTorch``
(modules/networks.py:12-97, modules/lpips.py:8-36): richzhang-scaled inputs
(z_score applied to the [0,1] tensors as metrics.py feeds them), conv-trunk
feature stages, per-stage unit-normalize on the channel axis, squared
difference, 1x1 linear heads, spatial mean, sum over stages.

Pretrained weights CANNOT be downloaded in this environment (zero egress), so
the trunks+heads load from an ``.npz`` produced by
``tools/convert_lpips_weights.py`` (torchvision VGG16/AlexNet features +
richzhang linear heads -> flat npz). ``available()`` reports whether a weights
file is present; callers (metrics.py) degrade to SSIM/PSNR-only when not.

Weight file search order: $GT_LPIPS_WEIGHTS, ./weights/lpips_<net>.npz,
~/.cache/gaussian_transformer_tpu/lpips_<net>.npz.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

# richzhang scaling-layer constants (reference lpipsPyTorch
# modules/networks.py:41-44 BaseNet.z_score). NOTE: the reference applies
# these DIRECTLY to the [0,1] tensors metrics.py feeds it (no 2x-1 remap),
# and we reproduce that exactly so results.json LPIPS values are comparable.
_MEAN = np.asarray([-0.030, -0.088, -0.188], np.float32)
_STD = np.asarray([0.458, 0.448, 0.450], np.float32)

# Conv configs: (out_channels, kernel, stride, pad) per layer; 'M' = maxpool.
# torchvision .features layouts.
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
# Stage boundaries: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
VGG16_STAGES = [2, 4, 7, 10, 13]  # conv counts at stage ends
ALEX_CFG = [
    (64, 11, 4, 2),
    "M",
    (192, 5, 1, 2),
    "M",
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
ALEX_STAGES = [1, 2, 3, 4, 5]


def weights_path(net: str = "vgg") -> Optional[str]:
    cands = [
        os.environ.get("GT_LPIPS_WEIGHTS"),
        os.path.join("weights", f"lpips_{net}.npz"),
        os.path.expanduser(f"~/.cache/gaussian_transformer_tpu/lpips_{net}.npz"),
    ]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def available(net: str = "vgg") -> bool:
    return weights_path(net) is not None


@functools.lru_cache(maxsize=4)
def _load(net: str):
    path = weights_path(net)
    if path is None:
        raise FileNotFoundError(
            f"LPIPS weights for '{net}' not found; run tools/convert_lpips_weights.py "
            "on a machine with torchvision + network access and set GT_LPIPS_WEIGHTS."
        )
    data = dict(np.load(path))
    return {k: jnp.asarray(v) for k, v in data.items()}


def _conv(x, w, b, stride=1, pad=1):
    # w stored torch-layout [out, in, kh, kw]; x is NCHW.
    out = jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


def _maxpool(x, k=2, s=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def _vgg_features(params, x) -> List[jnp.ndarray]:
    feats = []
    ci = 0
    stage_marks = set(VGG16_STAGES)
    for item in VGG16_CFG:
        if item == "M":
            x = _maxpool(x)
        else:
            x = _conv(x, params[f"conv{ci}.w"], params[f"conv{ci}.b"], 1, 1)
            x = jax.nn.relu(x)
            ci += 1
            if ci in stage_marks:
                feats.append(x)
    return feats


def _alex_features(params, x) -> List[jnp.ndarray]:
    feats = []
    ci = 0
    for item in ALEX_CFG:
        if item == "M":
            x = _maxpool(x, 3, 2)
        else:
            c, k, s, p = item
            x = _conv(x, params[f"conv{ci}.w"], params[f"conv{ci}.b"], s, p)
            x = jax.nn.relu(x)
            ci += 1
            feats.append(x)
    return feats


def _normalize_act(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))
    return x / (n + eps)


def lpips(x, y, net: str = "vgg"):
    """LPIPS distance between images in [0, 1], CHW or NCHW. Returns scalar
    (mean over batch), matching lpipsPyTorch/__init__.py:6-21 usage."""
    params = _load(net)
    if x.ndim == 3:
        x, y = x[None], y[None]
    mean = jnp.asarray(_MEAN)[None, :, None, None]
    std = jnp.asarray(_STD)[None, :, None, None]
    xn = (x - mean) / std
    yn = (y - mean) / std

    feats = _vgg_features if net == "vgg" else _alex_features
    fx = feats(params, xn)
    fy = feats(params, yn)

    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_normalize_act(a) - _normalize_act(b)) ** 2
        w = params[f"lin{i}.w"]  # [1, C, 1, 1]
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
    return jnp.mean(total)
