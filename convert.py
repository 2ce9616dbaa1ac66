#!/usr/bin/env python
"""COLMAP conversion driver.

Parity: ``/root/reference/convert.py`` — shell out to the external ``colmap``
binary for feature extraction / exhaustive matching / mapping / undistortion,
move ``sparse/*`` into ``sparse/0``, and optionally produce 50/25/12.5%%
resized image sets. Resizing uses PIL when ImageMagick is absent (the
reference hard-requires ``magick``)."""

import logging
import os
import shutil
import subprocess
import sys
from argparse import ArgumentParser


def run(cmd: str) -> int:
    print("+", cmd)
    return subprocess.call(cmd, shell=True)


def resize_with_pil(src: str, dst: str, percent: float) -> None:
    from PIL import Image

    img = Image.open(src)
    w, h = img.size
    img.resize((max(1, round(w * percent)), max(1, round(h * percent)))).save(dst)


def main():
    parser = ArgumentParser("Colmap converter")
    parser.add_argument("--no_gpu", action="store_true")
    parser.add_argument("--skip_matching", action="store_true")
    parser.add_argument("--source_path", "-s", required=True, type=str)
    parser.add_argument("--camera", default="OPENCV", type=str)
    parser.add_argument("--colmap_executable", default="", type=str)
    parser.add_argument("--resize", action="store_true")
    parser.add_argument("--magick_executable", default="", type=str)
    args = parser.parse_args()

    colmap = f'"{args.colmap_executable}"' if args.colmap_executable else "colmap"
    magick = f'"{args.magick_executable}"' if args.magick_executable else "magick"
    use_gpu = 0 if args.no_gpu else 1
    sp = args.source_path

    if not args.skip_matching:
        os.makedirs(sp + "/distorted/sparse", exist_ok=True)

        code = run(
            f"{colmap} feature_extractor --database_path {sp}/distorted/database.db "
            f"--image_path {sp}/input --ImageReader.single_camera 1 "
            f"--ImageReader.camera_model {args.camera} --SiftExtraction.use_gpu {use_gpu}"
        )
        if code != 0:
            logging.error(f"Feature extraction failed with code {code}. Exiting.")
            sys.exit(code)

        code = run(
            f"{colmap} exhaustive_matcher --database_path {sp}/distorted/database.db "
            f"--SiftMatching.use_gpu {use_gpu}"
        )
        if code != 0:
            logging.error(f"Feature matching failed with code {code}. Exiting.")
            sys.exit(code)

        code = run(
            f"{colmap} mapper --database_path {sp}/distorted/database.db "
            f"--image_path {sp}/input --output_path {sp}/distorted/sparse "
            f"--Mapper.ba_global_function_tolerance=0.000001"
        )
        if code != 0:
            logging.error(f"Mapper failed with code {code}. Exiting.")
            sys.exit(code)

    code = run(
        f"{colmap} image_undistorter --image_path {sp}/input "
        f"--input_path {sp}/distorted/sparse/0 --output_path {sp} --output_type COLMAP"
    )
    if code != 0:
        logging.error(f"Undistortion failed with code {code}. Exiting.")
        sys.exit(code)

    os.makedirs(sp + "/sparse/0", exist_ok=True)
    for file in os.listdir(sp + "/sparse"):
        if file == "0":
            continue
        shutil.move(os.path.join(sp, "sparse", file), os.path.join(sp, "sparse", "0", file))

    if args.resize:
        print("Copying and resizing...")
        have_magick = shutil.which(args.magick_executable or "magick") is not None
        for sub, pct, pct_s in (
            ("images_2", 0.5, "50%"),
            ("images_4", 0.25, "25%"),
            ("images_8", 0.125, "12.5%"),
        ):
            os.makedirs(os.path.join(sp, sub), exist_ok=True)
        for file in os.listdir(sp + "/images"):
            src = os.path.join(sp, "images", file)
            for sub, pct, pct_s in (
                ("images_2", 0.5, "50%"),
                ("images_4", 0.25, "25%"),
                ("images_8", 0.125, "12.5%"),
            ):
                dst = os.path.join(sp, sub, file)
                if have_magick:
                    shutil.copy2(src, dst)
                    code = run(f"{magick} mogrify -resize {pct_s} {dst}")
                    if code != 0:
                        logging.error(f"{pct_s} resize failed with code {code}. Exiting.")
                        sys.exit(code)
                else:
                    resize_with_pil(src, dst, pct)

    print("Done.")


if __name__ == "__main__":
    main()
