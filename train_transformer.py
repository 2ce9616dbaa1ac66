#!/usr/bin/env python
"""Flat transformer training CLI.

Parity: ``/root/reference/train_transformer.py:284-337`` — masked-Gaussian
modeling on a trained scene with NoamOpt(0.5, 2000) Adamax, d_model=1024, N=6,
best-loss checkpointing to ``best_model.npz``. The reference trains in fp16;
on TPU the matmuls run in bf16-friendly fp32 (see train/flat.py docstring for
why this CLI is the runnable equivalent of the stale reference script).
"""

import os
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
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--epochs", type=int, default=20000)
    parser.add_argument("--d_model", type=int, default=1024)
    parser.add_argument("--layers", type=int, default=6)
    parser.add_argument("--max_len", type=int, default=15000)
    parser.add_argument(
        "--attn_block_k", type=int, default=0,
        help="key-block size for blockwise (flash-style) attention; 0 = dense",
    )
    parser.add_argument(
        "--seq_shard", type=int, default=0,
        help="shard the token axis over this many devices with exact ring "
        "attention (parallel/ring.py); sequence lengths must divide it. 0 = off",
    )
    parser.add_argument(
        "--fsdp", type=int, default=0,
        help="shard parameters + optimizer state FSDP-style over this many "
        "devices (parallel/fsdp.py); composable with --attn_block_k. 0 = off",
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

    from gaussian_transformer_tpu.render import RenderConfig
    from gaussian_transformer_tpu.scene import Scene
    from gaussian_transformer_tpu.train.flat import (
        EmbeddedEncoderDecoder,
        FlatTrainingScene,
        init_flat_model,
        make_flat_loss,
        make_noam_adamax,
    )
    from gaussian_transformer_tpu.viewer import network_gui

    network_gui.init(args.ip, args.port)
    dataset = lp.extract(args)
    pipe = pp.extract(args)
    render_cfg = RenderConfig(debug=pipe.debug)

    scene = Scene(dataset, load_iteration=-1, sh_degree=1)
    tscene = FlatTrainingScene(scene, render_cfg, max_len=args.max_len)
    assert tscene.size > 0, "no cameras within the visible-count window"

    ring_axis, mesh = None, None
    if args.seq_shard > 1:
        from gaussian_transformer_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(jax.devices()[: args.seq_shard], data=1)
        ring_axis = "gauss"
        # Bucket padding must keep sequence lengths divisible by the axis.
        assert tscene.bucket % args.seq_shard == 0, (
            f"bucket {tscene.bucket} not divisible by seq_shard {args.seq_shard}"
        )
    model = EmbeddedEncoderDecoder(
        N=args.layers, d_model=args.d_model, block_k=args.attn_block_k,
        ring_axis=ring_axis, mesh=mesh,
    )
    params = init_flat_model(model, jax.random.PRNGKey(0))
    optimizer = make_noam_adamax(args.d_model)
    opt_state = optimizer.init(params)

    if os.path.exists("best_model.npz"):
        print("Loading Model")
        data = np.load("best_model.npz")
        flat, treedef = jax.tree_util.tree_flatten(params)
        params = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(data[f"arr_{i}"]) for i in range(len(flat))]
        )

    if args.fsdp:
        assert not args.seq_shard, "--fsdp and --seq_shard shard different axes; pick one"
        from gaussian_transformer_tpu.parallel.fsdp import (
            fsdp_shardings,
            make_fsdp_mesh,
            shard_tree,
        )

        fsdp_mesh = make_fsdp_mesh(jax.devices()[: args.fsdp])
        params = shard_tree(params, fsdp_mesh)
        opt_state = jax.device_put(opt_state, fsdp_shardings(opt_state, fsdp_mesh))
        print(f"FSDP: params+optimizer sharded over {args.fsdp} devices")

    loss_fn = make_flat_loss(model, render_cfg)
    import optax

    @jax.jit
    def step_fn(params, opt_state, src, trg, trg_y, src_mask, trg_mask, cam, drop_key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, src, trg, trg_y, src_mask, trg_mask, cam, drop_key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    drop_base = jax.random.PRNGKey(42)  # model.train(): dropout active per step

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter

        tb_writer = SummaryWriter("runs/gaussian_trainer_embed")
    except Exception:
        pass

    global_step = 0
    lowest_loss = 1e9
    rng = np.random.RandomState(0)
    for epoch in range(args.epochs):
        tscene.set_epoch(epoch)
        order = rng.permutation(tscene.size)
        total = 0.0
        for cam_idx in order:
            batch = tscene.make_batch(int(cam_idx))
            params, opt_state, loss, metrics = step_fn(
                params, opt_state, batch["src"], batch["trg"], batch["trg_y"],
                batch["src_mask"], batch["trg_mask"], batch["cam"],
                jax.random.fold_in(drop_base, global_step),
            )
            total += float(loss)
            if tb_writer:
                tb_writer.add_scalar("loss", float(loss), global_step)
                tb_writer.add_scalar("l2_loss", float(metrics["l2"]), global_step)
            global_step += 1
        epoch_loss = total / max(len(order), 1)
        print(f"Epoch: {epoch} Loss: {epoch_loss}")
        if epoch_loss < lowest_loss:
            lowest_loss = epoch_loss
            flat, _ = jax.tree_util.tree_flatten(params)
            np.savez("best_model.npz", *[np.asarray(x) for x in flat])

    print("\nTraining complete.")


if __name__ == "__main__":
    main()
