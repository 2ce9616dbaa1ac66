"""Tile binning: depth ordering + static-shape per-tile Gaussian lists.

TPU-native replacement for the GPU radix-sort binning inside the reference's
CUDA rasterizer (consumed at ``/root/reference/gaussian_renderer/__init__.py:85-93``).
The GPU builds variable-length (tile, depth)-sorted instance lists; XLA needs
static shapes, so instead we:

  1. globally sort all C Gaussians by depth once (``jax.lax.sort``) — culled
     Gaussians sort to the back via an +inf key,
  2. for each tile, select the first ``max_per_tile`` depth-ordered Gaussians
     whose screen bounding rect overlaps the tile (``jnp.nonzero`` with a static
     ``size``) — front-to-back order is inherited from the global sort, and
     overflow drops the FARTHEST Gaussians, which the saturating compositor
     would weight least anyway.

Tile size is 16x16 pixels (matches the upstream BLOCK_X/BLOCK_Y); a 16x16 tile
flattens to 256 = 2x128 lanes, which keeps the compositor VPU-aligned.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # pixels per tile side


def num_tiles(size: int) -> int:
    return (size + TILE - 1) // TILE


class Binned(NamedTuple):
    order: jnp.ndarray  # [C] int32 — gaussian index by ascending depth
    tile_lists: jnp.ndarray  # [T, K] int32 — indices into the SORTED arrays; C = empty
    tile_counts: jnp.ndarray  # [T] int32 — number of valid entries (pre-truncation, capped at K)
    overflow: jnp.ndarray  # [] int32 — total entries dropped by the K cap


def compute_rects(means2d: jnp.ndarray, radii: jnp.ndarray, grid_w: int, grid_h: int):
    """Per-Gaussian covered tile range [min, max) (upstream getRect behavior)."""
    r = radii.astype(means2d.dtype)
    min_x = jnp.clip(jnp.floor((means2d[:, 0] - r) / TILE), 0, grid_w).astype(jnp.int32)
    min_y = jnp.clip(jnp.floor((means2d[:, 1] - r) / TILE), 0, grid_h).astype(jnp.int32)
    max_x = jnp.clip(jnp.floor((means2d[:, 0] + r + TILE - 1) / TILE), 0, grid_w).astype(jnp.int32)
    max_y = jnp.clip(jnp.floor((means2d[:, 1] + r + TILE - 1) / TILE), 0, grid_h).astype(jnp.int32)
    return min_x, min_y, max_x, max_y


@functools.partial(
    jax.jit, static_argnames=("grid_w", "grid_h", "max_per_tile", "tile_chunk")
)
def bin_gaussians(
    means2d: jnp.ndarray,
    depths: jnp.ndarray,
    radii: jnp.ndarray,
    include: jnp.ndarray,
    *,
    grid_w: int,
    grid_h: int,
    max_per_tile: int,
    tile_chunk: int = 256,
) -> Binned:
    """Build depth-ordered per-tile index lists.

    Args:
      include: [C] bool — which Gaussians may contribute at all (radius > 0,
        alive, opacity above the 1/255 contribution floor).

    Returns ``Binned``; ``tile_lists`` entries index into depth-sorted arrays
    (i.e. apply ``order`` to projection outputs first), with ``C`` as the
    padding sentinel.
    """
    C = means2d.shape[0]
    T = grid_w * grid_h

    sort_key = jnp.where(include, depths, jnp.inf)
    order = jnp.argsort(sort_key).astype(jnp.int32)

    means2d_s = means2d[order]
    radii_s = radii[order]
    include_s = include[order]

    min_x, min_y, max_x, max_y = compute_rects(means2d_s, radii_s, grid_w, grid_h)

    tile_ids = jnp.arange(T, dtype=jnp.int32)
    tx = tile_ids % grid_w
    ty = tile_ids // grid_w

    def one_chunk(tx_c, ty_c):
        # [chunk, C] overlap mask.
        m = (
            include_s[None, :]
            & (min_x[None, :] <= tx_c[:, None])
            & (tx_c[:, None] < max_x[None, :])
            & (min_y[None, :] <= ty_c[:, None])
            & (ty_c[:, None] < max_y[None, :])
        )
        counts = jnp.sum(m.astype(jnp.int32), axis=1)

        def select(row):
            (idx,) = jnp.nonzero(row, size=max_per_tile, fill_value=C)
            return idx.astype(jnp.int32)

        lists = jax.vmap(select)(m)
        return lists, counts

    n_chunks = (T + tile_chunk - 1) // tile_chunk
    pad = n_chunks * tile_chunk - T
    tx_p = jnp.pad(tx, (0, pad)).reshape(n_chunks, tile_chunk)
    ty_p = jnp.pad(ty, (0, pad), constant_values=grid_h).reshape(n_chunks, tile_chunk)

    lists, counts = jax.lax.map(lambda args: one_chunk(*args), (tx_p, ty_p))
    tile_lists = lists.reshape(-1, max_per_tile)[:T]
    tile_counts = counts.reshape(-1)[:T]
    overflow = jnp.sum(jnp.maximum(tile_counts - max_per_tile, 0))
    return Binned(order=order, tile_lists=tile_lists, tile_counts=jnp.minimum(tile_counts, max_per_tile), overflow=overflow)
