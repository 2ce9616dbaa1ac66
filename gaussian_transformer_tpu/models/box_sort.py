"""Box-sort spatial ordering + normalization (GaussianHandler).

Parity: ``/root/reference/model/box_sort.py:30-82`` — capture world xyz and
log-scaling min/max once, affine-normalize both into [0, 1], and order
Gaussians by voxel in an ``interval_num``^3 grid scanned x-fastest, preserving
the original order within each voxel.

TPU-native differences:
  * the reference's per-voxel boolean-mask loop (box_num iterations of masked
    gathers) becomes ONE stable argsort by voxel id — identical ordering,
    O(N log N) on device;
  * Gaussians sitting exactly on the upper boundary (normalized coord 1.0)
    are clamped into the last voxel; the reference's half-open boxes drop them
    into uninitialized memory (torch.empty_like residue) — a latent bug we do
    not reproduce.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gaussian_transformer_tpu.models.codec import flatten_gaussians
from gaussian_transformer_tpu.scene.gaussians import GaussianScene


@struct.dataclass
class GaussianHandler:
    """Normalization constants captured from a scene (box_sort.py:31-38)."""

    world_min: jnp.ndarray  # [3]
    world_max: jnp.ndarray  # [3]
    scaling_min: jnp.ndarray  # []
    scaling_max: jnp.ndarray  # []
    interval_num: int = struct.field(pytree_node=False, default=10)

    @staticmethod
    def create(scene: GaussianScene, interval_num: int = 10) -> "GaussianHandler":
        coords = scene.get_xyz
        scalings = scene.scaling
        # Dead slots must not pollute the ranges.
        big = jnp.where(scene.alive[:, None], coords, jnp.inf)
        small = jnp.where(scene.alive[:, None], coords, -jnp.inf)
        s_big = jnp.where(scene.alive[:, None], scalings, jnp.inf)
        s_small = jnp.where(scene.alive[:, None], scalings, -jnp.inf)
        return GaussianHandler(
            world_min=jnp.min(big, axis=0),
            world_max=jnp.max(small, axis=0),
            scaling_min=jnp.min(s_big),
            scaling_max=jnp.max(s_small),
            interval_num=interval_num,
        )

    @property
    def box_num(self) -> int:
        return self.interval_num**3

    def normalize(self, scene: GaussianScene) -> GaussianScene:
        """Affine-map xyz and log-scaling into [0, 1] (box_sort.py:44-47)."""
        return scene.replace(
            xyz=(scene.get_xyz - self.world_min) / (self.world_max - self.world_min),
            scaling=(scene.scaling - self.scaling_min) / (self.scaling_max - self.scaling_min),
        )

    def denormalize(self, scene: GaussianScene) -> GaussianScene:
        """Inverse affine map (box_sort.py:75-82)."""
        return scene.replace(
            xyz=scene.get_xyz * (self.world_max - self.world_min) + self.world_min,
            scaling=scene.scaling * (self.scaling_max - self.scaling_min) + self.scaling_min,
        )

    # Reference spelling.
    denormalize_copy = denormalize

    def voxel_ids(self, xyz_norm: jnp.ndarray) -> jnp.ndarray:
        """Linear voxel id with x-fastest scan order (box_sort.py:53-58)."""
        n = self.interval_num
        cell = jnp.clip((xyz_norm * n).astype(jnp.int32), 0, n - 1)
        return cell[:, 0] + n * cell[:, 1] + n * n * cell[:, 2]

    def box_sort(self, scene: GaussianScene) -> jnp.ndarray:
        """Normalize, flatten to tokens, order by voxel (stable => original
        order within a voxel). Returns [C, 26] sorted tokens
        (box_sort.py:49-67). Dead slots sort to the end."""
        normalized = self.normalize(scene)
        tokens = flatten_gaussians(normalized)
        ids = self.voxel_ids(normalized.xyz)
        ids = jnp.where(scene.alive, ids, self.box_num)
        order = jnp.argsort(ids, stable=True)
        return tokens[order]
