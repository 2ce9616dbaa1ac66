#!/usr/bin/env python
"""Autoencoder training CLI (LR sweep harness).

Parity: ``/root/reference/train_autoencoder.py`` — for each lr multiple in
[20, 100): load the latest trained scene, box-sort + denormalize it, and train
``GAutoEncoder`` on per-camera visible-Gaussian token sets; loss = token L1
for epochs <= 500, then image L1*0.6 + (1-SSIM)*0.2 + LPIPS(alex)*0.2
(:164-179 — the LPIPS term drops out when no converted weights are present).
Backward errors are swallowed per-step like the reference (:180-182,
translated to a non-finite-loss skip since JAX cannot throw mid-graph).
"""

import sys
from argparse import ArgumentParser

import numpy as np


def main():
    from gaussian_transformer_tpu.config import ModelParams, OptimizationParams, PipelineParams

    parser = ArgumentParser(description="Training script parameters")
    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--epochs", type=int, default=505)
    parser.add_argument("--lr_sweep_start", type=int, default=20)
    parser.add_argument("--lr_sweep_stop", type=int, default=100)
    parser.add_argument("--conv", action="store_true", help="use the conv autoencoder instead of the scalar stub")
    args = parser.parse_args(sys.argv[1:])
    print("Optimizing " + args.model_path)
    # Platform override that works even where PJRT plugins ignore
    # JAX_PLATFORMS (e.g. tunneled TPU images): set GT_PLATFORM=cpu.
    import os as _os

    if _os.environ.get("GT_PLATFORM"):
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["GT_PLATFORM"])

    import jax
    import jax.numpy as jnp
    import optax

    from gaussian_transformer_tpu.eval import lpips as lpips_mod
    from gaussian_transformer_tpu.models.autoencoder import GAutoEncoder, GConvAutoEncoder
    from gaussian_transformer_tpu.models.box_sort import GaussianHandler
    from gaussian_transformer_tpu.models.codec import flatten_gaussians, unflatten_gaussians
    from gaussian_transformer_tpu.ops.losses import l1_loss, ssim
    from gaussian_transformer_tpu.render import RenderConfig, render
    from gaussian_transformer_tpu.scene import Scene
    from gaussian_transformer_tpu.viewer import network_gui

    dataset = lp.extract(args)
    pipe = pp.extract(args)
    render_cfg = RenderConfig(debug=pipe.debug)
    network_gui.init(args.ip, args.port)

    use_lpips = lpips_mod.available("alex")
    if not use_lpips:
        print("LPIPS(alex) weights absent — image loss runs without the perceptual term")

    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        SummaryWriter = None

    for lrm in range(args.lr_sweep_start, args.lr_sweep_stop, 1):
        scene = Scene(dataset, load_iteration=-1, sh_degree=dataset.sh_degree)
        handler = GaussianHandler.create(scene.gaussians)
        scene.gaussians = handler.denormalize(
            unflatten_gaussians(handler.box_sort(scene.gaussians))
        )
        f_gaussians = flatten_gaussians(scene.gaussians)
        bg = jnp.zeros(3, jnp.float32)

        model = GConvAutoEncoder() if args.conv else GAutoEncoder()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 26, 8)))
        lr = 0.0000001 * lrm * 100
        optimizer = optax.adam(lr, eps=1e-15)
        opt_state = optimizer.init(params)

        writer = SummaryWriter(f"LRruns/gaussian_autoencoder_{lrm}") if SummaryWriter else None

        def token_loss(params, data):
            pred = model.apply(params, data.transpose(0, 2, 1)).transpose(0, 2, 1)
            return l1_loss(pred, data), pred

        def image_loss(params, data, cam):
            pred = model.apply(params, data.transpose(0, 2, 1)).transpose(0, 2, 1)
            in_im = render(cam, unflatten_gaussians(data[0]), render_cfg, bg_color=bg)["render"]
            out_im = render(cam, unflatten_gaussians(pred[0]), render_cfg, bg_color=bg)["render"]
            l1_i = l1_loss(out_im, in_im)
            s_los = 1.0 - ssim(in_im, out_im)
            loss = l1_i * 0.6 + s_los * 0.2
            if use_lpips:
                loss = loss + 0.2 * lpips_mod.lpips(
                    jnp.clip(in_im, 0, 1), jnp.clip(out_im, 0, 1), "alex"
                )
            return loss, pred

        tok_step = jax.jit(jax.value_and_grad(token_loss, has_aux=True))
        img_step = jax.jit(jax.value_and_grad(image_loss, has_aux=True))

        vis_fn = jax.jit(
            lambda cam: render(cam, scene.gaussians, render_cfg, bg_color=bg)["visibility_filter"]
        )
        rng = np.random.RandomState(0)
        step = 0
        for epoch in range(0, args.epochs, 1):
            print(epoch)
            viewpoint_stack = list(scene.get_train_cameras())
            for _ in range(len(viewpoint_stack)):
                # anonymize: camera identity is static in the pytree and would
                # otherwise key one jit trace per camera.
                cam = viewpoint_stack.pop(rng.randint(len(viewpoint_stack))).anonymize()
                vis = vis_fn(cam)
                data = f_gaussians[vis][None]  # [1, Lv, 26]

                if epoch > 500:
                    (loss, pred), grads = img_step(params, data, cam)
                else:
                    (loss, pred), grads = tok_step(params, data)

                # The reference swallows backward RuntimeErrors (:180-182).
                if np.isfinite(float(loss)):
                    updates, opt_state = optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)

                network_gui.pump(
                    lambda custom_cam, smod: render(
                        custom_cam,
                        unflatten_gaussians(np.asarray(pred[0])),
                        render_cfg,
                        bg_color=bg,
                        scaling_modifier=smod,
                    )["render"],
                    dataset.source_path,
                )
                if writer:
                    writer.add_scalar("loss", float(loss), step)
                    writer.add_scalar("lr", lr, step)
                step += 1

        print("\nTraining complete.")


if __name__ == "__main__":
    main()
