"""End-to-end CLI integration: build a synthetic COLMAP text scene on disk,
run the real ``python train.py`` entry point on it, then ``render.py`` and
``metrics.py`` — the full user workflow (SURVEY.md §3.1/§3.4)."""

import json
import math
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.render import RenderConfig, render
from gaussian_transformer_tpu.scene.cameras import Camera
from gaussian_transformer_tpu.scene.colmap import rotmat2qvec

from tests.test_render import make_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_colmap_scene(root, n_points=96, n_cams=6, width=64, height=48):
    """Write a COLMAP-text scene whose images are renders of a known target."""
    from PIL import Image

    target = make_scene(n_points, seed=33, spread=1.2)
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)

    focal = width / (2 * math.tan(math.radians(60) / 2))
    with open(os.path.join(root, "sparse/0/cameras.txt"), "w") as f:
        f.write("# Camera list\n")
        f.write(f"1 PINHOLE {width} {height} {focal} {focal} {width/2} {height/2}\n")

    lines = ["# Image list"]
    for i in range(n_cams):
        ang = 2 * math.pi * i / n_cams
        Rw2c = np.array(
            [
                [math.cos(ang), 0, -math.sin(ang)],
                [0, 1, 0],
                [math.sin(ang), 0, math.cos(ang)],
            ]
        )
        tvec = np.array([0.0, 0.0, 5.0])
        cam = Camera.create(
            colmap_id=i, R=Rw2c.T, T=tvec, fovx=math.radians(60),
            fovy=2 * math.atan(height / (2 * focal)), image=None, gt_alpha_mask=None,
            image_name=f"im{i}", uid=i, width=width, height=height,
        )
        img = render(cam, target, RenderConfig(max_per_tile=96), bg_color=jnp.zeros(3))["render"]
        arr = (np.clip(np.asarray(img), 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        name = f"{i:03d}.png"
        Image.fromarray(arr).save(os.path.join(root, "images", name))
        q = rotmat2qvec(Rw2c)
        lines.append(
            f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {tvec[0]} {tvec[1]} {tvec[2]} 1 {name}"
        )
        lines.append("")  # empty 2D-points line
    with open(os.path.join(root, "sparse/0/images.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    xyz = np.asarray(target.xyz)
    with open(os.path.join(root, "sparse/0/points3D.txt"), "w") as f:
        f.write("# 3D point list\n")
        for i, p in enumerate(xyz):
            f.write(f"{i+1} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 1 0\n")
    return target


def run_cli(args, cwd=REPO):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GT_PLATFORM"] = "cpu"  # the axon TPU plugin ignores JAX_PLATFORMS
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env, capture_output=True, text=True, timeout=1500
    )
    assert out.returncode == 0, f"{args}\nSTDOUT:{out.stdout[-2000:]}\nSTDERR:{out.stderr[-2000:]}"
    return out


@pytest.mark.slow
def test_train_render_metrics_cli(tmp_path):
    scene_dir = str(tmp_path / "scene")
    model_dir = str(tmp_path / "model")
    build_colmap_scene(scene_dir)

    # 400 iterations with the demonstrated recovery LRs (test_quality.py's
    # recipe) so the end-to-end chain reaches real quality, not just "ran".
    it = "400"
    run_cli(
        [
            "train.py", "-s", scene_dir, "-m", model_dir, "--eval", "--quiet",
            "--iterations", it, "--test_iterations", it, "--save_iterations", it,
            "--densify_from_iter", "1000",
            "--feature_lr", "0.01", "--opacity_lr", "0.1", "--scaling_lr", "0.01",
        ]
    )
    ply = os.path.join(model_dir, f"point_cloud/iteration_{it}/point_cloud.ply")
    assert os.path.exists(ply)
    assert os.path.exists(os.path.join(model_dir, "cfg_args"))
    assert os.path.exists(os.path.join(model_dir, "cameras.json"))
    assert os.path.exists(os.path.join(model_dir, "input.ply"))

    run_cli(["render.py", "-m", model_dir, "--quiet"])
    renders = os.path.join(model_dir, f"test/ours_{it}/renders")
    assert len(os.listdir(renders)) > 0

    run_cli(["metrics.py", "-m", model_dir])
    with open(os.path.join(model_dir, "results.json")) as f:
        results = json.load(f)
    psnr = results[f"ours_{it}"]["PSNR"]
    # Quality gate on the WHOLE chain (train CLI -> render CLI -> metrics
    # CLI): the demonstrated recovery level, so a silent 15 dB regression in
    # any stage fails loudly (round-2 verdict item).
    assert np.isfinite(psnr) and psnr >= 25.0, results
