"""Tile/pixel sharding for the splat compositor (the BASELINE.md north star:
primitives + tiles sharded over ICI, per-Gaussian grad reduction overlapped
with backward compositing by XLA's latency-hiding scheduler).

The padded-CSR instance stream (render/tiles.bin_stream) is ALREADY the right
layout for this: chunks are tile-pure and tile-sorted, so splitting the chunk
axis into contiguous per-device ranges splits the image into contiguous tile
ranges — each device composites its range with the unmodified Pallas stream
kernel. A tile whose run straddles a device boundary is handled exactly by
the associative front-to-back operator

    (C, T) o (C', T') = (C + T * C', T * T')

folded over devices in ring order (device order == chunk order == depth
order). Gradients flow through the fold and each shard's custom VJP; the
cross-device per-Gaussian grad reduction is the segment-add pullback of the
stream gather, which XLA overlaps with the backward compositing of later
shards.

Semantics note: early termination (T < 1e-4) is evaluated per shard, so a
straddled tile composites a few instances the single-device kernel would have
skipped; their weight is the incoming T < 1e-4, bounding the image delta at
~1e-4 (verified in tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_transformer_tpu.render.stream import (
    PROPS_F,
    _composite_stream_tiles,
    pack_props,
    stream_gather,
)
from gaussian_transformer_tpu.render.tiles import TILE


def _butterfly_fold(color, final_t, axis: str, D: int):
    """All-reduce of the ordered front-to-back operator
    ``(C, T) o (C', T') = (C + T*C', T*T')`` over mesh axis ``axis``.

    XOR recursive doubling: at step s each device exchanges its aligned
    2^s-segment product with partner ``idx ^ 2^s`` (one ppermute pair) and
    composes lower-index-first — associativity gives every device the full
    ordered product after log2(D) steps. Traffic per device is
    O(T*P*log D) vs the previous all-gather's O(T*P*D), and the fold work is
    no longer replicated D times. Falls back to the gather fold for
    non-power-of-two D (meshes here are 2^k).
    """
    if D & (D - 1):  # non-power-of-two: simple gather fold
        colors = jax.lax.all_gather(color, axis)
        ts = jax.lax.all_gather(final_t, axis)
        acc_c, acc_t = colors[0], ts[0]
        for d in range(1, D):
            acc_c = acc_c + acc_t * colors[d]
            acc_t = acc_t * ts[d]
        return acc_c, acc_t

    idx = jax.lax.axis_index(axis)
    acc_c, acc_t = color, final_t
    s = 1
    while s < D:
        perm = [(d, d ^ s) for d in range(D)]
        oth_c = jax.lax.ppermute(acc_c, axis, perm)
        oth_t = jax.lax.ppermute(acc_t, axis, perm)
        lower = (idx & s) != 0  # partner owns the lower-index segment
        lo_c = jnp.where(lower, oth_c, acc_c)
        lo_t = jnp.where(lower, oth_t, acc_t)
        hi_c = jnp.where(lower, acc_c, oth_c)
        hi_t = jnp.where(lower, acc_t, oth_t)
        acc_c = lo_c + lo_t * hi_c
        acc_t = lo_t * hi_t
        s *= 2
    return acc_c, acc_t


def stream_image_tile_sharded(
    binned,
    means2d_s: jnp.ndarray,
    conics_s: jnp.ndarray,
    rgbs_s: jnp.ndarray,
    opac_s: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    mesh: Mesh,
    axis: str = "gauss",
):
    """Drop-in for render.stream.stream_image with the compositing work (and
    its backward) sharded over ``mesh`` axis ``axis``."""
    T = grid_w * grid_h
    D = mesh.shape[axis]
    props_full = pack_props(means2d_s, conics_s, rgbs_s, opac_s)  # [C+1, 16]
    props = stream_gather(
        props_full, binned.stream_gauss, binned.pos_unsorted,
        binned.gauss_offsets, binned.gauss_cov,
    )  # [I_pad, 16]; bwd = permutation gather + cumsum segment sums

    I_pad = props.shape[0]
    G = binned.chunk_tile.shape[0]
    chunk = I_pad // G
    g_pad = (-G) % D
    chunk_tile = binned.chunk_tile
    if g_pad:
        # Pad the chunk axis to the device count with trash-tile chunks.
        chunk_tile = jnp.concatenate([chunk_tile, jnp.full((g_pad,), T, jnp.int32)])
        props = jnp.concatenate(
            [props, jnp.zeros((g_pad * chunk, PROPS_F), props.dtype)], axis=0
        )

    def local(props_l, ct_l):
        color, final_t = _composite_stream_tiles(props_l, ct_l, grid_w, grid_h)
        # Tiles this shard never wrote are identity under the operator.
        covered_l = jnp.zeros((T + 1,), bool).at[ct_l].set(True)[:T]
        final_t = jnp.where(covered_l[:, None, None], final_t, 1.0)
        color = jnp.where(covered_l[:, None, None], color, 0.0)
        return _butterfly_fold(color, final_t, axis, D)

    # check_vma off: pallas_call's out_shapes carry no varying-mesh-axes
    # annotation, which the new shard_map vma checker would reject.
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    color, final_t = fn(props, chunk_tile)

    covered = binned.covered[:, None]
    final_t = jnp.where(covered, final_t[:, 0, :], 1.0)  # [T, P]
    color = jnp.where(covered[:, :, None], color, 0.0)  # [T, 3, P]
    color = color + final_t[:, None, :] * bg[None, :, None]

    img = color.reshape(grid_h, grid_w, 3, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, grid_h * TILE, grid_w * TILE)
    t_map = final_t.reshape(grid_h, grid_w, TILE, TILE)
    t_map = t_map.transpose(0, 2, 1, 3).reshape(grid_h * TILE, grid_w * TILE)
    return img, t_map


def render_tile_sharded(
    viewpoint_camera,
    pc,
    cfg,
    mesh: Mesh,
    bg_color=None,
    axis: str = "gauss",
    screenspace_offset=None,
):
    """render() facade with tile-sharded compositing: project + bin once
    (XLA SPMD shards the per-Gaussian math over the scene sharding), then
    composite the instance stream across ``mesh`` axis ``axis``."""
    import math

    from gaussian_transformer_tpu.render import _auto_chunk
    from gaussian_transformer_tpu.render.project import project_gaussians
    from gaussian_transformer_tpu.render.tiles import bin_stream, num_tiles

    H, W = viewpoint_camera.image_height, viewpoint_camera.image_width
    tan_fovx = math.tan(viewpoint_camera.fovx * 0.5)
    tan_fovy = math.tan(viewpoint_camera.fovy * 0.5)
    bg = jnp.zeros(3, jnp.float32) if bg_color is None else jnp.asarray(bg_color)

    proj = project_gaussians(
        pc.get_xyz, pc.get_scaling, pc.get_rotation, pc.get_opacity[:, 0],
        pc.get_features, None,
        world_view_transform=viewpoint_camera.world_view_transform,
        full_proj_transform=viewpoint_camera.full_proj_transform,
        camera_center=viewpoint_camera.camera_center,
        image_width=W, image_height=H,
        tan_fovx=tan_fovx, tan_fovy=tan_fovy,
        active_sh_degree=pc.active_sh_degree,
    )
    means2d = proj.means2d
    if screenspace_offset is not None:
        means2d = means2d + screenspace_offset
    grid_w, grid_h = num_tiles(W), num_tiles(H)
    include = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)
    binned = bin_stream(
        means2d, proj.depths, proj.rect_bin, include,
        grid_w=grid_w, grid_h=grid_h,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        max_instances=cfg.max_instances, max_stream=cfg.max_stream,
        chunk=_auto_chunk(means2d.shape[0], grid_w * grid_h, cfg),
    )
    # v4 stream layout indexes the original arrays — no order gathers.
    img_pad, t_pad = stream_image_tile_sharded(
        binned, means2d, proj.conics, proj.rgbs,
        proj.opacities, bg, grid_w=grid_w, grid_h=grid_h,
        mesh=mesh, axis=axis,
    )
    return {
        "render": img_pad[:, :H, :W],
        "viewspace_points": screenspace_offset,
        "visibility_filter": proj.radii > 0,
        "radii": proj.radii,
        "final_T": t_pad[:H, :W],
        "overflow": binned.overflow,
        "n_instances": binned.n_instances,
        "n_padded": binned.n_padded,
    }
