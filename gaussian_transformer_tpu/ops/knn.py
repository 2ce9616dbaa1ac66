"""3-nearest-neighbor mean squared distance — TPU-native replacement for the
reference's ``simple_knn._C.distCUDA2`` (used once at scene init to seed
log-scales, ``/root/reference/scene/gaussian_model.py:134``).

Implemented as a blockwise exact top-3 over the pairwise distance matrix: each
[block, N] distance panel is a single matmul (MXU) via the
|a-b|^2 = |a|^2 + |b|^2 - 2 a.b expansion, followed by a running 3-smallest
merge. O(N^2) flops but entirely MXU-resident; a one-shot init cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 1024


@functools.partial(jax.jit, static_argnames=("block",))
def mean_sq_dist_to_3nn(points, block: int = _BLOCK):
    """points [N, 3] -> [N] mean of squared distances to the 3 nearest others.

    Matches distCUDA2's contract: the mean over the 3 nearest neighbors of the
    squared euclidean distance, self excluded.
    """
    points = jnp.asarray(points, dtype=jnp.float32)
    n = points.shape[0]
    pad = (-n) % block
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    n_padded = pts.shape[0]
    sq = jnp.sum(pts * pts, axis=-1)  # [Np]

    # Padded rows/cols must never be picked as neighbors.
    valid = jnp.arange(n_padded) < n

    def body(carry, i):
        del carry
        rows = jax.lax.dynamic_slice_in_dim(pts, i * block, block)  # [B, 3]
        row_sq = jax.lax.dynamic_slice_in_dim(sq, i * block, block)  # [B]
        row_idx = i * block + jnp.arange(block)
        # [B, Np] squared distances via one matmul.
        d2 = row_sq[:, None] + sq[None, :] - 2.0 * rows @ pts.T
        d2 = jnp.maximum(d2, 0.0)
        # Mask self and padding.
        self_mask = row_idx[:, None] == jnp.arange(n_padded)[None, :]
        d2 = jnp.where(self_mask | ~valid[None, :], jnp.inf, d2)
        # 3 smallest: top_k on negated distances.
        neg_top3, _ = jax.lax.top_k(-d2, 3)
        return None, -neg_top3  # [B, 3]

    _, top3 = jax.lax.scan(body, None, jnp.arange(n_padded // block))
    top3 = top3.reshape(n_padded, 3)[:n]
    return jnp.mean(top3, axis=-1)


# Reference-spelling alias (the call sites in the reference use distCUDA2).
def dist_to_3nn_sq(points):
    return mean_sq_dist_to_3nn(points)
