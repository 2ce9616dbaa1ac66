#!/usr/bin/env python
"""Convert LPIPS weights (torchvision trunk + richzhang linear heads) to the
npz layout ``gaussian_transformer_tpu.eval.lpips`` loads.

Run on a machine WITH network access + torchvision:

    python tools/convert_lpips_weights.py --net vgg --out weights/lpips_vgg.npz

Layout: conv<i>.w [out,in,kh,kw], conv<i>.b [out] for each conv of the
torchvision ``.features`` trunk (vgg16 / alexnet), and lin<i>.w [1,C,1,1] for
the 5 LPIPS linear heads (downloaded from the richzhang/PerceptualSimilarity
release, as the reference's vendored copy does —
``/root/reference/lpipsPyTorch/modules/utils.py:11-30``).
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", choices=["vgg", "alex"], default="vgg")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch
    import torchvision

    if args.net == "vgg":
        trunk = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    else:
        trunk = torchvision.models.alexnet(weights="IMAGENET1K_V1").features

    out = {}
    ci = 0
    for m in trunk:
        if isinstance(m, torch.nn.Conv2d):
            out[f"conv{ci}.w"] = m.weight.detach().numpy()
            out[f"conv{ci}.b"] = m.bias.detach().numpy()
            ci += 1

    url = (
        "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
        f"master/lpips/weights/v0.1/{args.net}.pth"
    )
    heads = torch.hub.load_state_dict_from_url(url, progress=True, map_location="cpu")
    for i in range(5):
        out[f"lin{i}.w"] = heads[f"lin{i}.model.1.weight"].detach().numpy()

    np.savez(args.out, **out)
    print(f"wrote {args.out} ({ci} convs + 5 heads)")


if __name__ == "__main__":
    main()
