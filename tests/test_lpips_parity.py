"""LPIPS architecture parity: JAX port == the torch reference, on RANDOM
weights (VERDICT r4 #6).

Pretrained weights cannot be downloaded here (zero egress), but the
architecture is verifiable without them: build the torch reference pipeline
(``/root/reference/lpipsPyTorch/modules/networks.py:12-97`` — z_score, staged
trunk features, channel unit-normalize, squared diff, 1x1 heads, spatial
mean, stage sum) with randomly-initialized convs, export them through the
exact npz layout ``tools/convert_lpips_weights.py`` produces, and assert the
JAX forward matches torch to float32 tolerance. torchvision is absent from
this image, so the trunk Sequentials are reconstructed in plain torch with
torchvision's published .features layouts (architecture facts, not code).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import gaussian_transformer_tpu.eval.lpips as glpips  # noqa: E402

_MEAN = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
_STD = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]


def _vgg16_features():
    # torchvision vgg16().features layout; reference target layers [4,9,16,23,30]
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
    layers, cin = [], 3
    for item in cfg:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, item, 3, 1, 1), nn.ReLU(inplace=False)]
            cin = item
    return nn.Sequential(*layers), [4, 9, 16, 23, 30], [64, 128, 256, 512, 512]


def _alexnet_features():
    # torchvision alexnet().features layout; reference target layers [2,5,8,10,12]
    layers = [
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(inplace=False), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(inplace=False), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(inplace=False),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(inplace=False),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(inplace=False),
    ]
    return nn.Sequential(*layers), [2, 5, 8, 10, 12], [64, 192, 384, 256, 256]


def _normalize_activation(x, eps=1e-10):
    # reference modules/utils.py:6-8
    return x / (torch.sqrt(torch.sum(x**2, dim=1, keepdim=True)) + eps)


def _torch_lpips(trunk, targets, heads, x, y):
    """Reference forward (modules/lpips.py:30-36 + networks.py BaseNet.forward)."""

    def feats(img):
        out, t = [], (img - _MEAN) / _STD
        for i, layer in enumerate(trunk, 1):
            t = layer(t)
            if i in targets:
                out.append(_normalize_activation(t))
            if len(out) == len(targets):
                break
        return out

    fx, fy = feats(x), feats(y)
    res = [
        torch.sum((a - b) ** 2 * w[None, :, None, None], dim=1, keepdim=True).mean((2, 3), True)
        for a, b, w in zip(fx, fy, heads)
    ]
    return torch.sum(torch.cat(res, 0), 0, True)


def _export_npz(trunk, channels, heads, path):
    """Exactly the layout tools/convert_lpips_weights.py writes."""
    out, ci = {}, 0
    for m in trunk:
        if isinstance(m, nn.Conv2d):
            out[f"conv{ci}.w"] = m.weight.detach().numpy()
            out[f"conv{ci}.b"] = m.bias.detach().numpy()
            ci += 1
    for i, w in enumerate(heads):
        out[f"lin{i}.w"] = w[None, :, None, None].detach().numpy()  # [1, C, 1, 1]
    np.savez(path, **out)


@pytest.mark.parametrize("net", ["vgg", "alex"])
def test_jax_matches_torch_reference_on_random_weights(net, tmp_path, monkeypatch):
    torch.manual_seed(0 if net == "vgg" else 1)
    trunk, targets, channels = _vgg16_features() if net == "vgg" else _alexnet_features()
    # Random-positive heads (the real heads are non-negative 1x1 convs).
    heads = [torch.rand(c) * 0.1 for c in channels]

    path = tmp_path / f"lpips_{net}.npz"
    _export_npz(trunk, channels, heads, str(path))
    monkeypatch.setenv("GT_LPIPS_WEIGHTS", str(path))
    glpips._load.cache_clear()

    rng = np.random.RandomState(42)
    # AlexNet's stride-4 stem needs a reasonably sized input.
    x = rng.rand(3, 96, 128).astype(np.float32)
    y = rng.rand(3, 96, 128).astype(np.float32)

    with torch.no_grad():
        ref = float(
            _torch_lpips(
                trunk, targets, heads,
                torch.from_numpy(x)[None], torch.from_numpy(y)[None],
            )
        )
    got = float(glpips.lpips(x, y, net=net))
    glpips._load.cache_clear()

    assert ref > 0  # random nets on random images: nonzero distance
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-6)


def test_identical_images_zero(tmp_path, monkeypatch):
    torch.manual_seed(2)
    trunk, targets, channels = _alexnet_features()
    heads = [torch.rand(c) * 0.1 for c in channels]
    path = tmp_path / "lpips_alex.npz"
    _export_npz(trunk, channels, heads, str(path))
    monkeypatch.setenv("GT_LPIPS_WEIGHTS", str(path))
    glpips._load.cache_clear()
    x = np.random.RandomState(3).rand(3, 96, 96).astype(np.float32)
    assert float(glpips.lpips(x, x.copy(), net="alex")) < 1e-8
    glpips._load.cache_clear()
