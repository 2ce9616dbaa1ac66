#!/usr/bin/env python
"""Full-evaluation driver.

Parity: ``/root/reference/full_eval.py`` — train, render (7k/30k) and score the
13 standard scenes (MipNeRF360 x9 with images_4/images_2 for outdoor/indoor,
Tanks&Temples x2, DeepBlending x2) by chaining train.py / render.py /
metrics.py as subprocesses.
"""

import subprocess
import sys
from argparse import ArgumentParser

mipnerf360_outdoor_scenes = ["bicycle", "flowers", "garden", "stump", "treehill"]
mipnerf360_indoor_scenes = ["room", "counter", "kitchen", "bonsai"]
tanks_and_temples_scenes = ["truck", "train"]
deep_blending_scenes = ["drjohnson", "playroom"]


def run(cmd):
    print("+", " ".join(cmd))
    subprocess.run(cmd, check=False)


def main():
    parser = ArgumentParser(description="Full evaluation script parameters")
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_rendering", action="store_true")
    parser.add_argument("--skip_metrics", action="store_true")
    parser.add_argument("--output_path", default="./eval")
    args, _ = parser.parse_known_args()

    all_scenes = (
        mipnerf360_outdoor_scenes
        + mipnerf360_indoor_scenes
        + tanks_and_temples_scenes
        + deep_blending_scenes
    )

    if not args.skip_training or not args.skip_rendering:
        parser.add_argument("--mipnerf360", "-m360", required=True, type=str)
        parser.add_argument("--tanksandtemples", "-tat", required=True, type=str)
        parser.add_argument("--deepblending", "-db", required=True, type=str)
        args = parser.parse_args()

    py = sys.executable

    if not args.skip_training:
        common = ["--quiet", "--eval", "--test_iterations", "-1"]
        for scene in mipnerf360_outdoor_scenes:
            run([py, "train.py", "-s", f"{args.mipnerf360}/{scene}", "-i", "images_4",
                 "-m", f"{args.output_path}/{scene}"] + common)
        for scene in mipnerf360_indoor_scenes:
            run([py, "train.py", "-s", f"{args.mipnerf360}/{scene}", "-i", "images_2",
                 "-m", f"{args.output_path}/{scene}"] + common)
        for scene in tanks_and_temples_scenes:
            run([py, "train.py", "-s", f"{args.tanksandtemples}/{scene}",
                 "-m", f"{args.output_path}/{scene}"] + common)
        for scene in deep_blending_scenes:
            run([py, "train.py", "-s", f"{args.deepblending}/{scene}",
                 "-m", f"{args.output_path}/{scene}"] + common)

    if not args.skip_rendering:
        all_sources = (
            [f"{args.mipnerf360}/{s}" for s in mipnerf360_outdoor_scenes + mipnerf360_indoor_scenes]
            + [f"{args.tanksandtemples}/{s}" for s in tanks_and_temples_scenes]
            + [f"{args.deepblending}/{s}" for s in deep_blending_scenes]
        )
        common = ["--quiet", "--eval", "--skip_train"]
        for scene, source in zip(all_scenes, all_sources):
            for iteration in ("7000", "30000"):
                run([py, "render.py", "--iteration", iteration, "-s", source,
                     "-m", f"{args.output_path}/{scene}"] + common)

    if not args.skip_metrics:
        run([py, "metrics.py", "-m"] + [f"{args.output_path}/{s}" for s in all_scenes])


if __name__ == "__main__":
    main()
