"""The sharded (multi-chip) training step.

Camera-batched, Gaussian-sharded version of ``train.splat.train_step``:
inputs arrive committed to their mesh shardings (``mesh.shard_scene`` /
``device_put``), the step is one ``jit``, and XLA's SPMD partitioner places the
ICI collectives (all-gather of the projected splat representation at the global
depth sort, psum of parameter grads across the data axis). Batch semantics of
the densification stats match B sequential reference iterations: gradient
norms and visit counts accumulate per camera, max radii take the batch max
(reference train.py:113-123 semantics, vectorized).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gaussian_transformer_tpu.ops.losses import l1_loss, ssim
from gaussian_transformer_tpu.render import render
from gaussian_transformer_tpu.scene.densify import DensifyStats
from gaussian_transformer_tpu.train.optim import (
    PARAM_LEAVES,
    adam_step,
    expon_lr,
    leaf_learning_rates,
)


def stack_cameras(cams):
    """Stack same-resolution Camera pytrees into one batched Camera (leading
    batch axis on every array leaf; static metadata from the first camera)."""
    c0 = cams[0]
    for c in cams[1:]:
        assert (c.image_width, c.image_height) == (c0.image_width, c0.image_height), (
            "stack_cameras requires equal resolutions"
        )
    batched = {
        "world_view_transform": jnp.stack([c.world_view_transform for c in cams]),
        "full_proj_transform": jnp.stack([c.full_proj_transform for c in cams]),
        "camera_center": jnp.stack([c.camera_center for c in cams]),
    }
    if all(c.original_image is not None for c in cams):
        batched["original_image"] = jnp.stack([c.original_image for c in cams])
    # anonymize: c0's identity metadata is static in the pytree; keeping it
    # would key a distinct jit trace per batch leader.
    return c0.replace(**batched).anonymize()


def make_sharded_train_step(opt, render_cfg, mesh=None, tile_axis=None):
    """Build the jitted batched train step. ``opt``/``render_cfg`` are baked in
    as static; shardings follow the (committed) input shardings.

    ``tile_axis``: when set (with ``mesh``), compositing work and its backward
    are explicitly sharded over that mesh axis via shard_map
    (parallel/tile_shard.py) instead of leaving the instance stream to the
    SPMD partitioner; cameras then run in an unrolled Python loop because
    shard_map does not vmap."""
    if tile_axis is not None:
        assert mesh is not None, "tile_axis requires a mesh"
        from gaussian_transformer_tpu.parallel.tile_shard import render_tile_sharded

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(scene, adam, stats, cams, bg, iteration, spatial_lr_scale):
        params = {k: getattr(scene, k) for k in PARAM_LEAVES}
        B = cams.world_view_transform.shape[0]
        offsets = jnp.zeros((B, scene.capacity, 2), scene.xyz.dtype)

        def loss_fn(params, offsets):
            s = scene.replace(**params)

            def one(cam, off):
                if tile_axis is not None:
                    out = render_tile_sharded(
                        cam, s, render_cfg, mesh, bg_color=bg,
                        axis=tile_axis, screenspace_offset=off,
                    )
                else:
                    out = render(cam, s, render_cfg, bg_color=bg, screenspace_offset=off)
                img = out["render"]
                gt = cam.original_image
                l1 = l1_loss(img, gt)
                loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim(img, gt))
                return loss, (out["visibility_filter"], out["radii"], l1)

            if tile_axis is None:
                losses, (vis, radii, l1s) = jax.vmap(one)(cams, offsets)
            else:
                outs = [
                    one(jax.tree.map(lambda a, i=i: a[i], cams), offsets[i])
                    for i in range(B)
                ]
                losses = jnp.stack([o[0] for o in outs])
                vis = jnp.stack([o[1][0] for o in outs])
                radii = jnp.stack([o[1][1] for o in outs])
                l1s = jnp.stack([o[1][2] for o in outs])
            return jnp.mean(losses), (vis, radii, jnp.mean(l1s))

        (loss, (vis, radii, l1)), (gparams, goffsets) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, offsets)

        xyz_lr = expon_lr(
            iteration,
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps,
        )
        scene, adam = adam_step(scene, gparams, adam, leaf_learning_rates(opt, xyz_lr))

        # Batched densification stats == B sequential reference iterations.
        # Pixel-unit grads -> NDC-half units (reference CUDA backward scales
        # dL_dmean2D by 0.5*W/0.5*H; densify_grad_threshold is calibrated to it).
        from gaussian_transformer_tpu.scene.densify import ndc_grad_scale

        goffsets = goffsets * ndc_grad_scale(cams.image_width, cams.image_height)[None, None, :]
        gnorm = jnp.linalg.norm(goffsets, axis=-1)  # [B, C]
        visf = vis.astype(jnp.float32)
        stats = DensifyStats(
            xyz_gradient_accum=stats.xyz_gradient_accum + jnp.sum(gnorm * visf, axis=0),
            denom=stats.denom + jnp.sum(visf, axis=0),
            max_radii2d=jnp.maximum(
                stats.max_radii2d,
                jnp.max(jnp.where(vis, radii.astype(jnp.float32), 0.0), axis=0),
            ),
        )
        metrics = {
            "loss": loss,
            "l1": l1,
            "n_visible": jnp.sum(jnp.any(vis, axis=0).astype(jnp.int32)),
        }
        return scene, adam, stats, metrics

    return step
