#!/usr/bin/env python
"""Metrics CLI.

Parity: ``/root/reference/metrics.py`` — walk ``<model>/test/<method>/{renders,gt}``,
compute per-view SSIM / PSNR / LPIPS(vgg), write ``results.json`` and
``per_view.json`` in the same format. LPIPS requires a converted weights file
(see tools/convert_lpips_weights.py); without one it is reported as null.
"""

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def read_images(renders_dir: Path, gt_dir: Path):
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        render = np.asarray(Image.open(renders_dir / fname), dtype=np.float32) / 255.0
        gt = np.asarray(Image.open(gt_dir / fname), dtype=np.float32) / 255.0
        renders.append(render[..., :3].transpose(2, 0, 1))
        gts.append(gt[..., :3].transpose(2, 0, 1))
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths):
    import jax.numpy as jnp

    from gaussian_transformer_tpu.eval import lpips as lpips_mod
    from gaussian_transformer_tpu.ops.losses import ssim
    from gaussian_transformer_tpu.utils.image import psnr

    full_dict = {}
    per_view_dict = {}
    use_lpips = lpips_mod.available("vgg")
    if not use_lpips:
        print("LPIPS weights not found — reporting SSIM/PSNR only (lpips = null)")

    for scene_dir in model_paths:
        try:
            print("Scene:", scene_dir)
            full_dict[scene_dir] = {}
            per_view_dict[scene_dir] = {}
            test_dir = Path(scene_dir) / "test"

            for method in sorted(os.listdir(test_dir)):
                print("Method:", method)
                full_dict[scene_dir][method] = {}
                per_view_dict[scene_dir][method] = {}
                method_dir = test_dir / method
                renders, gts, image_names = read_images(method_dir / "renders", method_dir / "gt")

                ssims, psnrs, lpipss = [], [], []
                for r, g in zip(renders, gts):
                    rj, gj = jnp.asarray(r), jnp.asarray(g)
                    ssims.append(float(ssim(rj, gj)))
                    psnrs.append(float(jnp.mean(psnr(rj, gj))))
                    lpipss.append(float(lpips_mod.lpips(rj, gj, "vgg")) if use_lpips else None)

                print("  SSIM : {:>12.7f}".format(np.mean(ssims)))
                print("  PSNR : {:>12.7f}".format(np.mean(psnrs)))
                if use_lpips:
                    print("  LPIPS: {:>12.7f}".format(np.mean(lpipss)))

                full_dict[scene_dir][method].update(
                    {
                        "SSIM": float(np.mean(ssims)),
                        "PSNR": float(np.mean(psnrs)),
                        "LPIPS": float(np.mean(lpipss)) if use_lpips else None,
                    }
                )
                per_view_dict[scene_dir][method].update(
                    {
                        "SSIM": dict(zip(image_names, ssims)),
                        "PSNR": dict(zip(image_names, psnrs)),
                        "LPIPS": dict(zip(image_names, lpipss)),
                    }
                )

            with open(scene_dir + "/results.json", "w") as fp:
                json.dump(full_dict[scene_dir], fp, indent=True)
            with open(scene_dir + "/per_view.json", "w") as fp:
                json.dump(per_view_dict[scene_dir], fp, indent=True)
        except Exception as e:
            print("Unable to compute metrics for model", scene_dir, ":", e)


def main():
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument(
        "--model_paths", "-m", required=True, nargs="+", type=str, default=[]
    )
    args = parser.parse_args()
    # Platform override that works even where PJRT plugins ignore
    # JAX_PLATFORMS (e.g. tunneled TPU images): set GT_PLATFORM=cpu.
    import os as _os

    if _os.environ.get("GT_PLATFORM"):
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["GT_PLATFORM"])
    evaluate(args.model_paths)


if __name__ == "__main__":
    main()
