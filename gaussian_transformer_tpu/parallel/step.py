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


def _make_manual_loss(scene, cams, opt, render_cfg, mesh, data_axis="data", gauss_axis="gauss"):
    """The MANUAL multi-chip camera loss: a shard_map over the full mesh where
    each device projects its LOCAL Gaussian shard per local camera,
    all-gathers only the projected splat representation (the small [C, ~12]
    screen-space arrays, never raw parameters), and composites with the
    unmodified single-device Pallas kernel.

    This exists because XLA cannot auto-partition Mosaic custom calls: the
    jit-SPMD path compiles on the virtual CPU mesh (kernels interpret there)
    but is REJECTED by the real TPU compiler ("Mosaic kernels cannot be
    automatically partitioned") — caught by the deviceless AOT gate
    (tools/aot_check.py). The gather's AD transpose is the per-Gaussian grad
    reduce-scatter, exactly the BASELINE.md collective design."""
    import math

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from gaussian_transformer_tpu.render import _auto_chunk
    from gaussian_transformer_tpu.render.project import project_gaussians
    from gaussian_transformer_tpu.render.stream import stream_image
    from gaussian_transformer_tpu.render.tiles import bin_stream, num_tiles

    H, W = cams.image_height, cams.image_width
    tan_fovx = math.tan(cams.fovx * 0.5)
    tan_fovy = math.tan(cams.fovy * 0.5)
    gw, gh = num_tiles(W), num_tiles(H)
    C_total = scene.capacity
    B = cams.world_view_transform.shape[0]
    d_size = mesh.shape[data_axis]
    assert B % d_size == 0, f"camera batch {B} not divisible by data axis {d_size}"
    chunk = _auto_chunk(C_total, gw * gh, render_cfg)

    def local(params_l, alive_l, cams_l, offs_l, bg_r):
        s_l = scene.replace(alive=alive_l, **params_l)
        B_loc = cams_l.world_view_transform.shape[0]
        outs = []
        for b in range(B_loc):
            cam = jax.tree.map(lambda a, b=b: a[b], cams_l)
            proj = project_gaussians(
                s_l.get_xyz, s_l.get_scaling, s_l.get_rotation,
                s_l.get_opacity[:, 0], s_l.get_features, None,
                world_view_transform=cam.world_view_transform,
                full_proj_transform=cam.full_proj_transform,
                camera_center=cam.camera_center,
                image_width=W, image_height=H,
                tan_fovx=tan_fovx, tan_fovy=tan_fovy,
                active_sh_degree=scene.active_sh_degree,
            )
            means2d_l = proj.means2d + offs_l[b]
            gat = lambda x: jax.lax.all_gather(x, gauss_axis, axis=0, tiled=True)
            m2, dep, rad, radb, con, rgb, opa = (
                gat(means2d_l), gat(proj.depths), gat(proj.radii),
                gat(proj.rect_bin), gat(proj.conics), gat(proj.rgbs),
                gat(proj.opacities),
            )
            include = (rad > 0) & (opa >= 1.0 / 255.0)
            binned = bin_stream(
                m2, dep, radb, include, grid_w=gw, grid_h=gh,
                max_tiles_per_gaussian=render_cfg.max_tiles_per_gaussian,
                max_instances=render_cfg.max_instances,
                max_stream=render_cfg.max_stream, chunk=chunk,
            )
            # v4 stream layout indexes the original arrays — no order gathers.
            img_pad, _ = stream_image(
                binned, m2, con, rgb, opa, bg_r,
                grid_w=gw, grid_h=gh, precision=render_cfg.precision,
                block_rows=render_cfg.block_rows,
            )
            img = img_pad[:, :H, :W]
            gt = cam.original_image
            l1 = l1_loss(img, gt)
            loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim(img, gt))
            outs.append((loss, proj.radii > 0, proj.radii, l1))
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),  # [B_loc, C_loc] local-shard vis
            jnp.stack([o[2] for o in outs]),
            jnp.stack([o[3] for o in outs]),
        )

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(gauss_axis), P(gauss_axis), P(data_axis), P(data_axis, gauss_axis), P()),
        out_specs=(
            P(data_axis), P(data_axis, gauss_axis), P(data_axis, gauss_axis), P(data_axis),
        ),
        check_vma=False,
    )


def make_sharded_train_step(opt, render_cfg, mesh=None, tile_axis=None):
    """Build the jitted batched train step. ``opt``/``render_cfg`` are baked in
    as static; shardings follow the (committed) input shardings.

    ``mesh``: when given (tile_axis=None), the camera loss runs through the
    MANUAL shard_map path (_make_manual_loss): per-shard projection, explicit
    all-gather of the projected splat representation, per-device Pallas
    compositing. This is the path the REAL TPU compiler accepts — XLA cannot
    auto-partition Mosaic custom calls, so the mesh=None jit-SPMD form only
    works single-device (or on the interpret-mode CPU test mesh).

    ``tile_axis``: when set (with ``mesh``), compositing work and its backward
    are additionally sharded over that mesh axis via shard_map
    (parallel/tile_shard.py); cameras then run in an unrolled Python loop."""
    if tile_axis is not None:
        assert mesh is not None, "tile_axis requires a mesh"
        from gaussian_transformer_tpu.parallel.tile_shard import render_tile_sharded

    manual = mesh is not None and tile_axis is None

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(scene, adam, stats, cams, bg, iteration, spatial_lr_scale):
        params = {k: getattr(scene, k) for k in PARAM_LEAVES}
        B = cams.world_view_transform.shape[0]
        offsets = jnp.zeros((B, scene.capacity, 2), scene.xyz.dtype)

        if manual:
            manual_loss = _make_manual_loss(scene, cams, opt, render_cfg, mesh)

        def loss_fn(params, offsets):
            if manual:
                losses, vis, radii, l1s = manual_loss(
                    params, scene.alive, cams, offsets, bg
                )
                return jnp.mean(losses), (vis, radii, jnp.mean(l1s))
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
