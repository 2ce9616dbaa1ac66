#!/usr/bin/env python
"""3DGS scene-optimization CLI.

Parity: ``/root/reference/train.py:193-222`` — same flags, same defaults, same
outputs (cfg_args, point_cloud/iteration_N/point_cloud.ply, chkpnt<N> full-state
checkpoints), driving the TPU-native trainer in
``gaussian_transformer_tpu.train.splat``.
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np

from gaussian_transformer_tpu.config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    save_cfg_args,
)
from gaussian_transformer_tpu.utils.general import safe_state


def main():
    parser = ArgumentParser(description="Training script parameters")
    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument(
        "--test_iterations", nargs="+", type=int, default=[1_000, 2_000, 5_000, 7_000, 30_000]
    )
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    # Orbax layer (async/atomic/bounded-history snapshots + auto-resume from
    # the latest one). 0 disables; the npz chkpnt path above stays for parity.
    parser.add_argument("--orbax_every", type=int, default=0)
    args = parser.parse_args(sys.argv[1:])
    args.save_iterations.append(args.iterations)

    print("Optimizing " + args.model_path)
    safe_state(args.quiet)
    # Platform override that works even where PJRT plugins ignore
    # JAX_PLATFORMS (e.g. tunneled TPU images): set GT_PLATFORM=cpu.
    import os as _os

    if _os.environ.get("GT_PLATFORM"):
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["GT_PLATFORM"])

    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)

    dataset = lp.extract(args)
    opt_args = op.extract(args)
    pipe = pp.extract(args)

    # Lazy imports so --help stays fast.
    from gaussian_transformer_tpu.render import RenderConfig
    from gaussian_transformer_tpu.scene import Scene, GaussianScene
    from gaussian_transformer_tpu.train.splat import OptConfig, evaluate_psnr, training

    os.makedirs(dataset.model_path, exist_ok=True)
    save_cfg_args(dataset.model_path, dataset)

    # Viewer service (reference train.py:211 network_gui.init).
    viewer_ok = False
    try:
        from gaussian_transformer_tpu.viewer import network_gui

        network_gui.init(args.ip, args.port)
        viewer_ok = True
    except OSError as e:
        print(f"viewer disabled: {e}")

    scene = Scene(dataset, sh_degree=dataset.sh_degree)
    opt = OptConfig.from_args(opt_args)
    render_cfg = RenderConfig(
        convert_SHs_python=pipe.convert_SHs_python,
        compute_cov3D_python=pipe.compute_cov3D_python,
        debug=pipe.debug,
    )

    # TensorBoard writer (train.py:141-153); torch is in the image.
    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(dataset.model_path)
    except Exception:
        print("Tensorboard not available: not logging progress")

    def log_fn(iteration, metrics, ema_loss, iter_time, gaussians, scene_obj, render_cfg, bg, testing):
        if tb_writer:
            tb_writer.add_scalar("train_loss_patches/l1_loss", float(metrics["l1"]), iteration)
            tb_writer.add_scalar("train_loss_patches/total_loss", float(metrics["loss"]), iteration)
            tb_writer.add_scalar("iter_time", iter_time * 1000.0, iteration)
        if testing:
            test_cams = scene_obj.get_test_cameras()
            train_cams = scene_obj.get_train_cameras()[:5]
            for name, cams in (("test", test_cams), ("train", train_cams)):
                if not cams:
                    continue
                p, l1 = evaluate_psnr(gaussians, cams, render_cfg, bg)
                print(f"\n[ITER {iteration}] Evaluating {name}: L1 {l1} PSNR {p}")
                if tb_writer:
                    tb_writer.add_scalar(f"{name}/loss_viewpoint - l1_loss", l1, iteration)
                    tb_writer.add_scalar(f"{name}/loss_viewpoint - psnr", p, iteration)
            if tb_writer:
                tb_writer.add_scalar(
                    "total_points", int(np.asarray(gaussians.num_alive)), iteration
                )

    training(
        scene,
        opt,
        render_cfg,
        white_background=dataset.white_background,
        testing_iterations=set(args.test_iterations),
        saving_iterations=set(args.save_iterations),
        checkpoint_iterations=set(args.checkpoint_iterations),
        start_checkpoint=args.start_checkpoint,
        log_fn=log_fn,
        progress=not args.quiet,
        viewer=viewer_ok,
        orbax_dir=dataset.model_path if args.orbax_every else None,
        orbax_every=args.orbax_every,
    )

    print("\nTraining complete.")


if __name__ == "__main__":
    main()
