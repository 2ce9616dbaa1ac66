#!/usr/bin/env python
"""Reference-scale full-pipeline quality gate, on the real chip (VERDICT r4 #3).

Mirrors the reference's de-facto integration test (full_eval.py:39-75 +
train.py:156-191 in /root/reference): a multi-camera scene -> the REAL
``python train.py`` CLI for 7k iterations with densification growing the
scene -> ``render.py`` -> ``metrics.py`` -> results.json PSNR gate.

No real captured scenes exist in-env (images.bin stripped upstream), so the
scene is synthesized at reference scale: a densified-table GT model
(bench._densified_scene) renders N_CAMS ground-truth views at 1280x720; the
COLMAP text model gets a sparse subsample of the GT points (like SfM would
produce). Recovery training must then densify from the sparse seed toward
the GT's density — exercising the real growth path (scene/densify.py +
train.py's host-side capacity doubling) at 10-100x the old gate's scale.

Writes logs/r5/full_gate.md + copies results.json; exits nonzero if the
chain breaks or PSNR lands under the floor.

Usage: python -m tools.full_gate [--iters 7000] [--cams 24] [--seed-points 8000]
       [--gt-size 120000] [--width 1280] [--height 720] [--psnr-floor 25]
"""

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_scene_dir(root, args):
    import jax.numpy as jnp

    import bench
    from gaussian_transformer_tpu.render import RenderConfig, render, tune_config
    from gaussian_transformer_tpu.scene.cameras import Camera
    from gaussian_transformer_tpu.scene.colmap import rotmat2qvec
    from PIL import Image

    pcd, center, extent = bench._base_cloud()
    target = bench._densified_scene(pcd, args.gt_size)
    W, H = args.width, args.height
    focal = W / (2 * math.tan(math.radians(70) / 2))
    fovx = math.radians(70)
    fovy = 2 * math.atan(H / (2 * focal))

    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    with open(os.path.join(root, "sparse/0/cameras.txt"), "w") as f:
        f.write("# Camera list\n")
        f.write(f"1 PINHOLE {W} {H} {focal} {focal} {W/2} {H/2}\n")

    # Probe once to right-size the render budgets for the GT renders.
    cam0 = Camera.create(
        colmap_id=0, R=np.eye(3), T=np.asarray(-center + np.array([0, 0, extent * 2.0])),
        fovx=fovx, fovy=fovy, image=None, gt_alpha_mask=None,
        image_name="probe", uid=0, width=W, height=H,
    )
    cfg = RenderConfig(max_per_tile=256)
    probe = render(cam0, target, cfg)
    cfg = tune_config(cfg, {k: int(np.asarray(probe[k]))
                            for k in ("n_instances", "n_padded", "n_tiles") if k in probe})

    lines = ["# Image list"]
    for i in range(args.cams):
        ang = 2 * math.pi * i / args.cams
        tilt = 0.35 * math.sin(3 * ang)
        Ry = np.array([
            [math.cos(ang), 0, -math.sin(ang)],
            [0, 1, 0],
            [math.sin(ang), 0, math.cos(ang)],
        ])
        Rx = np.array([
            [1, 0, 0],
            [0, math.cos(tilt), -math.sin(tilt)],
            [0, math.sin(tilt), math.cos(tilt)],
        ])
        Rw2c = Rx @ Ry
        # Camera at distance 2*extent from the cloud center along the view axis.
        tvec = -Rw2c @ center + np.array([0.0, 0.0, 2.0 * extent])
        cam = Camera.create(
            colmap_id=i, R=Rw2c.T, T=tvec, fovx=fovx, fovy=fovy,
            image=None, gt_alpha_mask=None, image_name=f"im{i}", uid=i,
            width=W, height=H,
        )
        img = render(cam, target, cfg, bg_color=jnp.zeros(3))["render"]
        arr = (np.clip(np.asarray(img), 0, 1).transpose(1, 2, 0) * 255).astype(np.uint8)
        name = f"{i:03d}.png"
        Image.fromarray(arr).save(os.path.join(root, "images", name))
        q = rotmat2qvec(Rw2c)
        lines.append(
            f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} {tvec[0]} {tvec[1]} {tvec[2]} 1 {name}"
        )
        lines.append("")
        print(f"  GT view {i+1}/{args.cams}", flush=True)
    with open(os.path.join(root, "sparse/0/images.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # Sparse SfM-like seed: a random subsample of the GT points with colors.
    rng = np.random.RandomState(7)
    xyz = np.asarray(target.xyz)
    from gaussian_transformer_tpu.utils.sh import sh_to_rgb

    cols = np.clip(np.asarray(sh_to_rgb(target.features_dc[:, 0, :])), 0, 1)
    sel = rng.choice(xyz.shape[0], size=args.seed_points, replace=False)
    with open(os.path.join(root, "sparse/0/points3D.txt"), "w") as f:
        f.write("# 3D point list\n")
        for j, i in enumerate(sel):
            r, g, b = (cols[i] * 255).astype(np.uint8)
            f.write(f"{j+1} {xyz[i,0]} {xyz[i,1]} {xyz[i,2]} {r} {g} {b} 0.5 1 0\n")


def run_cli(args_list, log):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    out = subprocess.run([sys.executable] + args_list, cwd=REPO, env=env,
                         capture_output=True, text=True)
    dt = time.time() - t0
    log.write(f"\n$ {' '.join(args_list)}  ({dt:.0f}s, rc={out.returncode})\n")
    log.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:] + "\n")
    log.flush()
    if out.returncode != 0:
        print(out.stdout[-3000:], out.stderr[-3000:], sep="\n")
        raise SystemExit(f"CLI failed: {args_list}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=7000)
    ap.add_argument("--cams", type=int, default=24)
    ap.add_argument("--seed-points", type=int, default=8000)
    ap.add_argument("--gt-size", type=int, default=120_000)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--psnr-floor", type=float, default=25.0)
    ap.add_argument("--min-final", type=int, default=150_000)
    ap.add_argument("--grad-threshold", type=float, default=0.0002)
    ap.add_argument("--out", default="logs/r5")
    ap.add_argument("--work", default="/tmp/full_gate")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    os.makedirs(args.out, exist_ok=True)
    scene_dir = os.path.join(args.work, "scene")
    model_dir = os.path.join(args.work, "model")
    # A stale model dir from a previous attempt would satisfy the PLY parse
    # below even if this run's train crashed — start clean.
    import shutil
    shutil.rmtree(model_dir, ignore_errors=True)
    log_path = os.path.join(args.out, "full_gate.md")
    log = open(log_path, "w")
    log.write(
        "# Full-pipeline quality gate (reference scale, real chip)\n\n"
        f"date: {time.strftime('%Y-%m-%d %H:%M')} device: {jax.devices()[0]}\n\n"
        f"GT target: {args.gt_size} Gaussians (densified table_ds), "
        f"{args.cams} cameras at {args.width}x{args.height}; seed "
        f"{args.seed_points} points; train.py --iterations {args.iters} "
        "with the reference densify schedule, then render.py + metrics.py "
        "(match: /root/reference/full_eval.py:39-75, train.py:156-191).\n"
    )
    print("building GT scene...", flush=True)
    t0 = time.time()
    build_scene_dir(scene_dir, args)
    log.write(f"\nGT scene built in {time.time()-t0:.0f}s\n")

    it = str(args.iters)
    run_cli(["train.py", "-s", scene_dir, "-m", model_dir, "--eval", "--quiet",
             "--iterations", it, "--test_iterations", it, "--save_iterations", it,
             "--densify_grad_threshold", str(args.grad_threshold)], log)

    # Final scene size: parse the saved PLY header.
    ply = os.path.join(model_dir, f"point_cloud/iteration_{it}/point_cloud.ply")
    n_final = 0
    with open(ply, "rb") as f:
        for line in f:
            if line.startswith(b"element vertex"):
                n_final = int(line.split()[-1])
                break
    log.write(f"\nfinal scene size: {n_final} Gaussians (seed {args.seed_points})\n")

    run_cli(["render.py", "-m", model_dir, "--quiet"], log)
    run_cli(["metrics.py", "-m", model_dir], log)

    with open(os.path.join(model_dir, "results.json")) as f:
        results = json.load(f)
    psnr = results[f"ours_{it}"]["PSNR"]
    ssim = results[f"ours_{it}"].get("SSIM")
    log.write(f"\nresults.json: PSNR {psnr:.2f} dB, SSIM {ssim}\n")
    verdict = "PASS" if (np.isfinite(psnr) and psnr >= args.psnr_floor
                         and n_final >= args.min_final) else "FAIL"
    log.write(f"\n**{verdict}** (floors: PSNR >= {args.psnr_floor}, "
              f"final size >= {args.min_final})\n")
    log.close()
    with open(os.path.join(args.out, "full_gate_results.json"), "w") as f:
        json.dump({"psnr": psnr, "ssim": ssim, "n_final": n_final,
                   "iters": args.iters, "verdict": verdict}, f, indent=1)
    print(f"{verdict}: PSNR {psnr:.2f} dB, final {n_final} Gaussians — log at {log_path}")
    raise SystemExit(0 if verdict == "PASS" else 1)


if __name__ == "__main__":
    main()
