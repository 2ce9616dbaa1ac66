"""Per-tile front-to-back alpha compositing (pure-JAX, fully differentiable).

TPU-native equivalent of the forward/backward render stage of the reference's
CUDA rasterizer (``/root/reference/gaussian_renderer/__init__.py:85-93``). The
CUDA kernel walks each tile's depth-sorted list sequentially per pixel and
saves transmittance state for a hand-written backward; here the recurrence is
expressed with an (exclusive) cumulative product over the list axis, which

  * reproduces the exact forward semantics, including the upstream skip rules
    (``power > 0``, ``alpha < 1/255``, saturation stop at ``T < 1e-4``), and
  * is differentiable by JAX AD out of the box — XLA turns the cumprod +
    masked reductions into VPU loops, so no custom VJP is required for
    correctness (a Pallas kernel with a replayed recurrence is the perf path).

All shapes are static: [T_tiles, K=max_per_tile, P=TILE*TILE pixels].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_transformer_tpu.render.tiles import TILE


class TileComposited(NamedTuple):
    colors: jnp.ndarray  # [T, 3, P] composited colors (background already blended)
    final_T: jnp.ndarray  # [T, P] remaining transmittance


def composite_tile_block(
    lists: jnp.ndarray,  # [B, K] indices into padded sorted arrays
    tx: jnp.ndarray,  # [B] tile x index
    ty: jnp.ndarray,  # [B] tile y index
    means2d_p: jnp.ndarray,  # [C+1, 2] sorted + sentinel-padded
    conics_p: jnp.ndarray,  # [C+1, 3]
    rgbs_p: jnp.ndarray,  # [C+1, 3]
    opac_p: jnp.ndarray,  # [C+1]
    bg: jnp.ndarray,  # [3]
):
    """Composite a block of B tiles. Returns (colors [B,3,P], final_T [B,P])."""
    sentinel = means2d_p.shape[0] - 1
    P = TILE * TILE

    # Per-tile pixel coordinates (pixel centers at integer coords, as upstream).
    row = jnp.arange(P, dtype=means2d_p.dtype) // TILE
    col = jnp.arange(P, dtype=means2d_p.dtype) % TILE
    pix_x = tx[:, None].astype(means2d_p.dtype) * TILE + col[None, :]  # [B, P]
    pix_y = ty[:, None].astype(means2d_p.dtype) * TILE + row[None, :]

    g_xy = means2d_p[lists]  # [B, K, 2]
    g_conic = conics_p[lists]  # [B, K, 3]
    g_rgb = rgbs_p[lists]  # [B, K, 3]
    g_opac = opac_p[lists]  # [B, K]
    is_pad = lists == sentinel  # [B, K]

    dx = g_xy[:, :, 0:1] - pix_x[:, None, :]  # [B, K, P]
    dy = g_xy[:, :, 1:2] - pix_y[:, None, :]
    a = g_conic[:, :, 0:1]
    b = g_conic[:, :, 1:2]
    c = g_conic[:, :, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy  # [B, K, P]

    alpha = jnp.minimum(0.99, g_opac[:, :, None] * jnp.exp(jnp.minimum(power, 0.0)))
    skip = (power > 0.0) | (alpha < (1.0 / 255.0)) | is_pad[:, :, None]
    alpha = jnp.where(skip, 0.0, alpha)

    # Exclusive cumulative transmittance along the depth-ordered list axis.
    one_minus = 1.0 - alpha
    cp = jnp.cumprod(one_minus, axis=1)
    T = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)  # [B, K, P]

    # Saturation stop: first non-skipped entry whose update would push T below
    # 1e-4 terminates the pixel (that entry itself does not contribute).
    trigger = (~skip) & (T * one_minus < 1e-4)
    done = jnp.cumsum(trigger.astype(jnp.int32), axis=1) > 0
    live = (~done).astype(alpha.dtype)

    weight = alpha * T * live  # [B, K, P]
    colors = jnp.einsum("bkp,bkc->bcp", weight, g_rgb, precision=jax.lax.Precision.HIGHEST)
    final_T = jnp.prod(1.0 - alpha * live, axis=1)  # [B, P]
    colors = colors + final_T[:, None, :] * bg[None, :, None]
    return colors, final_T


@functools.partial(jax.jit, static_argnames=("grid_w", "grid_h", "tile_block"))
def composite_image(
    tile_lists: jnp.ndarray,  # [T, K]
    means2d_s: jnp.ndarray,  # [C, 2] depth-sorted
    conics_s: jnp.ndarray,
    rgbs_s: jnp.ndarray,
    opac_s: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    tile_block: int = 64,
):
    """Composite all tiles and assemble the padded image [3, grid_h*16, grid_w*16]
    plus the final transmittance map."""
    T_tiles = grid_w * grid_h
    P = TILE * TILE

    def pad1(arr):
        pad_shape = (1,) + arr.shape[1:]
        return jnp.concatenate([arr, jnp.zeros(pad_shape, arr.dtype)], axis=0)

    means2d_p = pad1(means2d_s)
    conics_p = pad1(conics_s)
    rgbs_p = pad1(rgbs_s)
    opac_p = pad1(opac_s)

    tile_ids = jnp.arange(T_tiles, dtype=jnp.int32)
    tx = tile_ids % grid_w
    ty = tile_ids // grid_w

    n_blocks = (T_tiles + tile_block - 1) // tile_block
    pad = n_blocks * tile_block - T_tiles
    # Padded tiles read the sentinel list => all-background, cropped later.
    lists_pad = jnp.pad(tile_lists, ((0, pad), (0, 0)), constant_values=means2d_s.shape[0])
    tx_pad = jnp.pad(tx, (0, pad)).reshape(n_blocks, tile_block)
    ty_pad = jnp.pad(ty, (0, pad)).reshape(n_blocks, tile_block)
    lists_b = lists_pad.reshape(n_blocks, tile_block, -1)

    # Rematerialize per block: the [B, K, P] alpha/transmittance intermediates
    # are recomputed in the backward instead of stored across all blocks —
    # the AD analog of the CUDA backward's transmittance replay.
    @jax.checkpoint
    def block_fn(args):
        lists, bx, by = args
        return composite_tile_block(lists, bx, by, means2d_p, conics_p, rgbs_p, opac_p, bg)

    colors, final_T = jax.lax.map(block_fn, (lists_b, tx_pad, ty_pad))
    colors = colors.reshape(-1, 3, P)[:T_tiles]
    final_T = final_T.reshape(-1, P)[:T_tiles]

    # [T,3,P] -> [3, H_pad, W_pad]
    img = colors.reshape(grid_h, grid_w, 3, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, grid_h * TILE, grid_w * TILE)
    t_map = final_T.reshape(grid_h, grid_w, TILE, TILE)
    t_map = t_map.transpose(0, 2, 1, 3).reshape(grid_h * TILE, grid_w * TILE)
    return img, t_map
