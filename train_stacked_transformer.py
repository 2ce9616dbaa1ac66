#!/usr/bin/env python
"""Stacked-transformer training CLI.

Parity: ``/root/reference/train_stacked_transformer.py:337-401`` — loads the
latest trained PLY of a scene, box-sorts it once, and trains the fat-token
encoder-decoder (STACK=8, d_model=26*2^8, N=2) with Adam(5e-4, eps=1e-4) +
ReduceLROnPlateau, saving crash/periodic checkpoints under
``runs/<name>/checkpoint_<epoch>``. ``--stack``/``--d_scale`` shrink the model
for smoke runs (the reference hardcodes STACK=8).
"""

import datetime
import os
import sys
import time
from argparse import ArgumentParser

import numpy as np


def main():
    parser = ArgumentParser(description="Training script parameters")
    from gaussian_transformer_tpu.config import ModelParams, OptimizationParams, PipelineParams

    lp = ModelParams(parser)
    op = OptimizationParams(parser)
    pp = PipelineParams(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--stack", type=int, default=8)
    parser.add_argument("--layers", type=int, default=2)
    parser.add_argument(
        "--attn_block_k", type=int, default=0,
        help="key-block size for blockwise (flash-style) attention; 0 = dense",
    )
    parser.add_argument("--epochs", type=int, default=20000)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--checkpoint_every", type=int, default=50)
    parser.add_argument(
        "--dp", type=int, default=0,
        help="data-parallel: one independent window per device over this many "
             "devices, grads pmean'd (train/stacked.make_dp_train_step). 0 = off",
    )
    parser.add_argument(
        "--fsdp", type=int, default=0,
        help="shard parameters + optimizer state FSDP-style over this many "
             "devices (parallel/fsdp.py); 0 = single-device",
    )
    parser.add_argument(
        "--orbax", action="store_true",
        help="checkpoint via Orbax (async/atomic/bounded history) under "
             "run_name/orbax and auto-resume from the latest snapshot",
    )
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

    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    from gaussian_transformer_tpu.models.transformer import EncoderDecoder, make_model, init_model
    from gaussian_transformer_tpu.render import RenderConfig
    from gaussian_transformer_tpu.scene import Scene
    from gaussian_transformer_tpu.train.stacked import (
        LiveViewerStream,
        ReduceLROnPlateau,
        TrainingScene,
        load_checkpoint,
        make_train_step,
        save_checkpoint,
        stacked_token_dim,
    )
    from gaussian_transformer_tpu.utils.system import search_for_max_iteration
    from gaussian_transformer_tpu.viewer import network_gui

    network_gui.init(args.ip, args.port)

    dataset = lp.extract(args)
    pipe = pp.extract(args)
    render_cfg = RenderConfig(debug=pipe.debug)

    scene = Scene(dataset, load_iteration=-1, sh_degree=1)
    tscene = TrainingScene(scene, render_cfg, batch_size=args.batch_size, stack=args.stack)

    D = stacked_token_dim(args.stack)
    model = make_model(args.stack, D, D, N=args.layers, d_model=D, block_k=args.attn_block_k)
    params = init_model(model, jax.random.PRNGKey(0))
    optimizer = optax.adam(1.0, b1=0.9, b2=0.999, eps=1e-4)  # lr injected per step
    opt_state = optimizer.init(params)
    scheduler = ReduceLROnPlateau(lr=0.0005)

    run_name = args.run_name or (
        "runs/" + datetime.datetime.fromtimestamp(time.time()).strftime("%a_%d_%b_%I_%M%p")
    )
    first_epoch = 0
    orbax_mgr = None
    if args.orbax:
        from gaussian_transformer_tpu.train import orbax_ckpt

        assert orbax_ckpt.available(), "--orbax requested but orbax.checkpoint missing"
        orbax_mgr = orbax_ckpt.make_manager(run_name)
        snap = orbax_ckpt.restore(
            orbax_mgr, {"params": params, "opt_state": opt_state}
        )
        if snap is not None:
            params, opt_state = snap["params"], snap["opt_state"]
            first_epoch = orbax_mgr.latest_step() + 1
            print(f"resumed from orbax epoch {first_epoch - 1}")
    if first_epoch == 0 and os.path.exists(run_name):
        max_iter = search_for_max_iteration(run_name)
        if max_iter is not None:
            print(f"loading Model iter {max_iter}")
            params, opt_state = load_checkpoint(run_name, max_iter, params, opt_state)
            first_epoch = max_iter + 1
    os.makedirs(run_name, exist_ok=True)

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter(f"logs/{run_name}/base/")
    except Exception:
        pass

    fsdp_mesh = None
    if args.fsdp and not args.dp:
        from gaussian_transformer_tpu.parallel.fsdp import (
            fsdp_shardings,
            make_fsdp_mesh,
            shard_tree,
        )

        fsdp_mesh = make_fsdp_mesh(jax.devices()[: args.fsdp])
        params = shard_tree(params, fsdp_mesh)
        opt_state = jax.device_put(opt_state, fsdp_shardings(opt_state, fsdp_mesh))
        print(f"FSDP: params+optimizer sharded over {args.fsdp} devices")

    dp_mesh = None
    if args.dp:
        from jax.sharding import Mesh

        from gaussian_transformer_tpu.train.stacked import make_dp_train_step

        if args.fsdp:
            # 2D composition: windows manual over "data", params auto-sharded
            # over "fsdp" inside the region (make_dp_train_step docstring).
            from gaussian_transformer_tpu.parallel.fsdp import fsdp_shardings

            n = args.dp * args.fsdp
            dp_mesh = Mesh(
                np.asarray(jax.devices()[:n]).reshape(args.dp, args.fsdp),
                ("data", "fsdp"),
            )
            params = jax.device_put(params, fsdp_shardings(params, dp_mesh, axis="fsdp"))
            opt_state = jax.device_put(
                opt_state, fsdp_shardings(opt_state, dp_mesh, axis="fsdp")
            )
            print(f"DPxFSDP: {args.dp} windows x {args.fsdp}-way param shards")
        else:
            dp_mesh = Mesh(np.asarray(jax.devices()[: args.dp]), ("data",))
            print(f"DP: one window per device over {args.dp} devices")
        step_fn = make_dp_train_step(
            model, tscene.handler, render_cfg, optimizer, args.stack,
            mesh=dp_mesh, batch_size=args.batch_size,
        )
    else:
        step_fn = make_train_step(
            model, tscene.handler, render_cfg, optimizer, args.stack, mesh=fsdp_mesh
        )
    drop_base = jax.random.PRNGKey(42)  # model.train(): dropout active per step

    # Viewer hooks (reference handleViewer, train_stacked_transformer.py:284-320):
    # while training continues, a teacher-forced composite of the LAST batch;
    # when the viewer pauses training, LIVE per-step autoregressive streaming
    # through the KV-cached decoder (LiveViewerStream).
    stream = LiveViewerStream(model, tscene.handler, render_cfg, args.stack)

    @jax.jit
    def _tf_pred(params, src, trg, src_mask, trg_mask):
        out = model.apply(params, src, trg, src_mask, trg_mask, True)
        return model.apply(params, out, method=EncoderDecoder.generator)

    def viewer_train_fn(cam, smod, show_prompt, show_pred):
        if stream.batch is None:
            return None
        b = stream.batch
        gen = _tf_pred(params, b.src, b.trg, b.src_mask, b.trg_mask)
        return stream.compose(gen, gen.shape[1], cam, smod, show_prompt, show_pred)

    global_step = 0
    for epoch in range(first_epoch, args.epochs):
        try:
            tscene.set_epoch(epoch)
            total_loss, total_tokens = 0.0, 0
            if dp_mesh is not None:
                # One group of args.dp independent windows per step.
                n_steps = max(1, tscene.size // (args.dp * args.batch_size))
                batch_iter = (tscene.make_batch_group(args.dp) for _ in range(n_steps))
            else:
                batch_iter = tscene.batches()
            for batch in batch_iter:
                if batch is None:
                    continue
                if dp_mesh is None:
                    stream.set_batch(params, batch)
                network_gui.pump_stacked(viewer_train_fn, stream, dataset.source_path)
                params, opt_state, loss, metrics = step_fn(
                    params, opt_state, batch.src, batch.trg_y, batch.cameras,
                    jnp.asarray(scheduler.lr), batch.src_mask,
                    jax.random.fold_in(drop_base, global_step),
                )
                loss = float(loss)
                total_loss += loss
                total_tokens += batch.ntokens
                if tb_writer:
                    tb_writer.add_scalar("loss", loss, global_step)
                    tb_writer.add_scalar("chamfer", float(metrics["chamfer"]), global_step)
                global_step += 1
            epoch_loss = total_loss / max(total_tokens, 1)
            print(f"Epoch: {epoch} Loss: {epoch_loss}")
            scheduler.step(epoch_loss)
            if tb_writer:
                tb_writer.add_scalar("lr", scheduler.lr, epoch)
                tb_writer.add_scalar("dropout", tscene.dropout, epoch)
            if epoch % args.checkpoint_every == 0 and epoch > first_epoch:
                if orbax_mgr is not None:
                    from gaussian_transformer_tpu.train import orbax_ckpt

                    # async: training does not stall on the snapshot write
                    orbax_ckpt.save(
                        orbax_mgr, epoch, {"params": params, "opt_state": opt_state}
                    )
                else:
                    save_checkpoint(run_name, epoch, params, opt_state)
        except (RuntimeError, FloatingPointError) as e:
            # Crash-save semantics (train_stacked_transformer.py:392-398).
            print(e)
            save_checkpoint(run_name, epoch, params, opt_state)

    if orbax_mgr is not None:
        orbax_mgr.wait_until_finished()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
