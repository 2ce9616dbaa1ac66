"""Gaussian <-> token codec (26-dim layout) and special tokens.

Parity: the flatten/unflatten pair duplicated across the reference
(``/root/reference/train_stacked_transformer.py:43-64``,
``train_transformer.py:29-50``, ``model/box_sort.py:6-27``) — here defined
once. Token layout for sh_degree=1 (26 dims):

  [0:12)  SH features, [N, 4, 3] row-major ((1 DC + 3 rest) x 3 channels)
  [12:16) rotation (raw, unnormalized quaternion)
  [16:17) opacity (logit)
  [17:20) xyz
  [20:23) scaling (log)
  [23:26) flags — one-hot START(23) / PAD(24) / END(25)

Special tokens (train_stacked_transformer.py:29-36): START additionally sets
opacity = -5 and scaling = -5 so it renders invisible if decoded.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gaussian_transformer_tpu.scene.gaussians import GaussianScene

TOKEN_DIM = 26
FLAG_START, FLAG_PAD, FLAG_END = 23, 24, 25


def _special(opacity_scale_neg5: bool, flag: int) -> np.ndarray:
    t = np.zeros(TOKEN_DIM, np.float32)
    if opacity_scale_neg5:
        t[16:17] = -5.0
        t[20:23] = -5.0
    t[flag] = 1.0
    return t


START_GAUSSIAN = jnp.asarray(_special(True, FLAG_START))
PAD_GAUSSIAN = jnp.asarray(_special(False, FLAG_PAD))
END_GAUSSIAN = jnp.asarray(_special(False, FLAG_END))


def fuzzy_token_equal(gaussians, token):
    """L1 distance <= 0.5 (train_stacked_transformer.py:40-41); used to detect
    PAD/START/END rows when building masks."""
    return jnp.sum(jnp.abs(gaussians - token), -1) <= 0.5


def flatten_gaussians(scene: GaussianScene) -> jnp.ndarray:
    """[C, 26] tokens from the RAW (pre-activation) parameters, sh_degree=1."""
    feats = scene.get_features  # [C, 4, 3] raw dc+rest
    features = feats.reshape(feats.shape[0], -1)
    flags = jnp.zeros((features.shape[0], 3), features.dtype)
    return jnp.concatenate(
        [features, scene.rotation, scene.opacity, scene.xyz, scene.scaling, flags], axis=1
    )


def unflatten_gaussians(tokens: jnp.ndarray) -> GaussianScene:
    """Tokens -> GaussianScene with active_sh_degree=1, all slots alive."""
    n = tokens.shape[0]
    features = tokens[:, :12].reshape(n, 4, 3)
    return GaussianScene(
        xyz=tokens[:, 17:20],
        features_dc=features[:, 0:1, :],
        features_rest=features[:, 1:, :],
        scaling=tokens[:, 20:23],
        rotation=tokens[:, 12:16],
        opacity=tokens[:, 16:17],
        alive=jnp.ones((n,), bool),
        active_sh_degree=1,
        max_sh_degree=1,
    )


def stack_tokens(tokens: jnp.ndarray, times: int) -> jnp.ndarray:
    """Fold the sequence ``times`` times: [L, D] -> [L / 2^times, D * 2^times]
    via repeated concat(x[0::2], x[1::2]) on the feature axis
    (train_stacked_transformer.py:99-101). Length must be divisible by 2^times."""
    for _ in range(times):
        tokens = jnp.concatenate([tokens[0::2], tokens[1::2]], axis=-1)
    return tokens


def unstack_tokens(tokens: jnp.ndarray, times: int) -> jnp.ndarray:
    """Inverse fold (train_stacked_transformer.py:172-176)."""
    for _ in range(times):
        d = tokens.shape[-1] // 2
        tokens = jnp.stack([tokens[:, :d], tokens[:, d:]], axis=1).reshape(-1, d)
    return tokens
