"""GaussianScene — the core primitive store as an immutable JAX pytree.

TPU-native redesign of the reference's ``GaussianModel``
(``/root/reference/scene/gaussian_model.py``): same learnable tensors and
activation pairs (exp/log scaling, sigmoid opacity, normalized quaternion
rotation, SH features split DC/rest), but

  * arrays live at a STATIC CAPACITY with an ``alive`` mask instead of growing /
    shrinking (XLA needs static shapes; densify/prune become jitted slot edits
    plus an occasional host-side capacity bump), and
  * everything is functional — methods return new pytrees; the optimizer state
    lives beside it in the trainer.

PLY save/load keeps the reference's exact field order
(gaussian_model.py:177-189) so checkpoints interop with SIBR tooling.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from gaussian_transformer_tpu.utils.general import inverse_sigmoid
from gaussian_transformer_tpu.utils.graphics import (
    BasicPointCloud,
    build_covariance_3d,
    strip_symmetric,
)
from gaussian_transformer_tpu.utils.sh import rgb_to_sh
from gaussian_transformer_tpu.ops.knn import mean_sq_dist_to_3nn


@struct.dataclass
class GaussianScene:
    """Per-Gaussian parameters at fixed capacity.

    Shapes (C = capacity, R = (max_sh_degree+1)^2 - 1 rest coefficients):
      xyz [C,3], features_dc [C,1,3], features_rest [C,R,3], scaling [C,3] (log),
      rotation [C,4] (unnormalized wxyz), opacity [C,1] (logit), alive [C] bool.
    """

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    alive: jnp.ndarray
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ---- derived quantities (activation pairs, gaussian_model.py:26-41) ----

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))

    @property
    def get_scaling(self):
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self):
        n = jnp.linalg.norm(self.rotation, axis=-1, keepdims=True)
        return self.rotation / jnp.maximum(n, 1e-12)

    @property
    def get_xyz(self):
        return self.xyz

    @property
    def get_features(self):
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    @property
    def get_opacity(self):
        # Dead slots contribute zero opacity so they never render.
        return jax.nn.sigmoid(self.opacity) * self.alive[:, None].astype(self.opacity.dtype)

    def get_covariance(self, scaling_modifier: float = 1.0):
        """Packed symmetric 3D covariance [C, 6] (xx,xy,xz,yy,yz,zz)."""
        cov = build_covariance_3d(self.get_scaling, self.get_rotation, scaling_modifier)
        return strip_symmetric(cov)

    # ---- construction ----

    def oneup_sh_degree(self) -> "GaussianScene":
        if self.active_sh_degree < self.max_sh_degree:
            return dataclasses.replace(self, active_sh_degree=self.active_sh_degree + 1)
        return self

    @staticmethod
    def empty(capacity: int, max_sh_degree: int, dtype=jnp.float32) -> "GaussianScene":
        rest = (max_sh_degree + 1) ** 2 - 1
        return GaussianScene(
            xyz=jnp.zeros((capacity, 3), dtype),
            features_dc=jnp.zeros((capacity, 1, 3), dtype),
            features_rest=jnp.zeros((capacity, rest, 3), dtype),
            scaling=jnp.full((capacity, 3), -10.0, dtype),
            rotation=jnp.concatenate(
                [jnp.ones((capacity, 1), dtype), jnp.zeros((capacity, 3), dtype)], axis=1
            ),
            opacity=jnp.full((capacity, 1), -10.0, dtype),
            alive=jnp.zeros((capacity,), bool),
            active_sh_degree=0,
            max_sh_degree=max_sh_degree,
        )

    @staticmethod
    def from_pcd(
        pcd: BasicPointCloud,
        max_sh_degree: int,
        capacity: Optional[int] = None,
    ) -> "GaussianScene":
        """Initialize from a point cloud: colors -> SH DC band, log-scale seeded
        from sqrt(mean 3-NN squared distance), identity rotations, opacity 0.1
        (reference create_from_pcd, gaussian_model.py:124-147)."""
        points = np.asarray(pcd.points, dtype=np.float32)
        colors = np.asarray(pcd.colors, dtype=np.float32)
        n = points.shape[0]
        if capacity is None:
            capacity = n
        assert capacity >= n

        scene = GaussianScene.empty(capacity, max_sh_degree)
        dist2 = jnp.maximum(mean_sq_dist_to_3nn(points), 1e-7)
        log_scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

        scene = scene.replace(
            xyz=scene.xyz.at[:n].set(jnp.asarray(points)),
            features_dc=scene.features_dc.at[:n].set(rgb_to_sh(jnp.asarray(colors))[:, None, :]),
            scaling=scene.scaling.at[:n].set(log_scales),
            opacity=scene.opacity.at[:n].set(inverse_sigmoid(0.1 * jnp.ones((n, 1)))),
            alive=scene.alive.at[:n].set(True),
        )
        return scene

    def compact(self, capacity: Optional[int] = None) -> "GaussianScene":
        """Host-side: pack alive gaussians to the front (and optionally resize
        capacity). Used between jitted train segments when the scene outgrows
        its padding."""
        alive = np.asarray(self.alive)
        idx = np.nonzero(alive)[0]
        n = len(idx)
        if capacity is None:
            capacity = max(1, n)
        assert capacity >= n

        def pack(arr):
            arr = np.asarray(arr)
            out = np.zeros((capacity,) + arr.shape[1:], arr.dtype)
            out[:n] = arr[idx]
            return jnp.asarray(out)

        fresh = GaussianScene.empty(capacity, self.max_sh_degree)
        return fresh.replace(
            xyz=pack(self.xyz),
            features_dc=pack(self.features_dc),
            features_rest=pack(self.features_rest),
            scaling=pack(self.scaling),
            rotation=jnp.asarray(
                np.concatenate(
                    [np.asarray(self.rotation)[idx], np.asarray(fresh.rotation)[n:]], axis=0
                )
            ),
            opacity=pack(self.opacity),
            alive=jnp.asarray(np.arange(capacity) < n),
            active_sh_degree=self.active_sh_degree,
        )

    # ---- PLY interop (field order parity: gaussian_model.py:177-189) ----

    def ply_attribute_names(self):
        names = ["x", "y", "z", "nx", "ny", "nz"]
        names += [f"f_dc_{i}" for i in range(self.features_dc.shape[1] * self.features_dc.shape[2])]
        names += [f"f_rest_{i}" for i in range(self.features_rest.shape[1] * self.features_rest.shape[2])]
        names += ["opacity"]
        names += [f"scale_{i}" for i in range(self.scaling.shape[1])]
        names += [f"rot_{i}" for i in range(self.rotation.shape[1])]
        return names

    def save_ply(self, path: str) -> None:
        from gaussian_transformer_tpu.scene.ply import write_ply_vertex_table
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        alive = np.asarray(self.alive)
        idx = np.nonzero(alive)[0]
        xyz = np.asarray(self.xyz)[idx]
        normals = np.zeros_like(xyz)
        # Match the reference's layout: [N, 3, K] transposed flatten => channel-major.
        f_dc = np.asarray(self.features_dc)[idx].transpose(0, 2, 1).reshape(len(idx), -1)
        f_rest = np.asarray(self.features_rest)[idx].transpose(0, 2, 1).reshape(len(idx), -1)
        opacities = np.asarray(self.opacity)[idx]
        scale = np.asarray(self.scaling)[idx]
        rotation = np.asarray(self.rotation)[idx]
        attributes = np.concatenate([xyz, normals, f_dc, f_rest, opacities, scale, rotation], axis=1)
        write_ply_vertex_table(path, self.ply_attribute_names(), attributes.astype(np.float32))

    @staticmethod
    def load_ply(path: str, max_sh_degree: int, capacity: Optional[int] = None) -> "GaussianScene":
        from gaussian_transformer_tpu.scene.ply import read_ply_vertex_table

        data = read_ply_vertex_table(path)
        n = len(data["x"])
        xyz = np.stack([data["x"], data["y"], data["z"]], axis=1)
        opacity = data["opacity"][:, None]

        f_dc = np.zeros((n, 3, 1), dtype=np.float32)
        for i in range(3):
            f_dc[:, i, 0] = data[f"f_dc_{i}"]

        rest_names = sorted(
            [k for k in data if k.startswith("f_rest_")], key=lambda s: int(s.split("_")[-1])
        )
        assert len(rest_names) == 3 * (max_sh_degree + 1) ** 2 - 3
        f_rest = np.stack([data[k] for k in rest_names], axis=1).reshape(
            n, 3, (max_sh_degree + 1) ** 2 - 1
        )

        scale_names = sorted([k for k in data if k.startswith("scale_")], key=lambda s: int(s.split("_")[-1]))
        scaling = np.stack([data[k] for k in scale_names], axis=1)
        rot_names = sorted([k for k in data if k.startswith("rot_")], key=lambda s: int(s.split("_")[-1]))
        rotation = np.stack([data[k] for k in rot_names], axis=1)

        if capacity is None:
            capacity = n
        scene = GaussianScene.empty(capacity, max_sh_degree)
        # Stored channel-major [N, 3, K]; in-memory layout is [N, K, 3].
        scene = scene.replace(
            xyz=scene.xyz.at[:n].set(jnp.asarray(xyz, dtype=jnp.float32)),
            features_dc=scene.features_dc.at[:n].set(jnp.asarray(f_dc.transpose(0, 2, 1))),
            features_rest=scene.features_rest.at[:n].set(jnp.asarray(f_rest.transpose(0, 2, 1))),
            opacity=scene.opacity.at[:n].set(jnp.asarray(opacity, dtype=jnp.float32)),
            scaling=scene.scaling.at[:n].set(jnp.asarray(scaling, dtype=jnp.float32)),
            rotation=scene.rotation.at[:n].set(jnp.asarray(rotation, dtype=jnp.float32)),
            alive=scene.alive.at[:n].set(True),
            active_sh_degree=max_sh_degree,
        )
        return scene
