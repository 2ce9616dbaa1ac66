#!/usr/bin/env python
"""Offline render CLI.

Parity: ``/root/reference/render.py`` — load a trained scene at ``--iteration``
(-1 = latest) and write train/test splits as PNG trees
``<model>/<split>/ours_<iter>/{renders,gt}/00000.png``.
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np


def render_set(model_path, name, iteration, views, gaussians, render_cfg, background):
    from PIL import Image
    import jax.numpy as jnp

    from gaussian_transformer_tpu.render import render

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)

    import jax

    render_fn = jax.jit(lambda view: render(view, gaussians, render_cfg, bg_color=background)["render"])
    for idx, view in enumerate(views):
        # anonymize: camera identity is static in the pytree — without it each
        # view would retrace/recompile render_fn.
        img = np.clip(np.asarray(render_fn(view.anonymize())), 0.0, 1.0)
        gt = np.clip(np.asarray(view.original_image), 0.0, 1.0)
        for arr, path in ((img, render_path), (gt, gts_path)):
            Image.fromarray((arr.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
                os.path.join(path, f"{idx:05d}.png")
            )


def render_sets(dataset, iteration, pipe_args, skip_train, skip_test):
    import jax.numpy as jnp

    from gaussian_transformer_tpu.render import RenderConfig
    from gaussian_transformer_tpu.scene import Scene

    scene = Scene(dataset, load_iteration=iteration, shuffle=False, sh_degree=dataset.sh_degree)
    gaussians = scene.gaussians
    background = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0])
    render_cfg = RenderConfig(
        convert_SHs_python=pipe_args.convert_SHs_python,
        compute_cov3D_python=pipe_args.compute_cov3D_python,
        debug=pipe_args.debug,
    )

    if not skip_train:
        render_set(
            dataset.model_path, "train", scene.loaded_iter, scene.get_train_cameras(),
            gaussians, render_cfg, background,
        )
    if not skip_test:
        render_set(
            dataset.model_path, "test", scene.loaded_iter, scene.get_test_cameras(),
            gaussians, render_cfg, background,
        )


def main():
    from gaussian_transformer_tpu.config import ModelParams, PipelineParams, get_combined_args
    from gaussian_transformer_tpu.utils.general import safe_state

    parser = ArgumentParser(description="Testing script parameters")
    model = ModelParams(parser, sentinel=True)
    pipeline = PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser)
    print("Rendering " + args.model_path)
    # Platform override that works even where PJRT plugins ignore
    # JAX_PLATFORMS (e.g. tunneled TPU images): set GT_PLATFORM=cpu.
    import os as _os

    if _os.environ.get("GT_PLATFORM"):
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["GT_PLATFORM"])

    safe_state(args.quiet)
    render_sets(
        model.extract(args), args.iteration, pipeline.extract(args), args.skip_train, args.skip_test
    )


if __name__ == "__main__":
    main()
