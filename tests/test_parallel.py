"""Multi-chip parallel step tests on the virtual CPU mesh: the sharded
camera-batched train step must match an unsharded single-device run bit-for-
bit in semantics (same grads, same stats), and scene sharding must be
transparent to the renderer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    stack_cameras,
)
from gaussian_transformer_tpu.parallel.mesh import (
    adam_sharding,
    camera_batch_sharding,
    replicated,
    shard_scene,
)
from gaussian_transformer_tpu.render import RenderConfig, render
from gaussian_transformer_tpu.scene.densify import DensifyStats
from gaussian_transformer_tpu.train.optim import AdamState
from gaussian_transformer_tpu.train.splat import OptConfig

from tests.test_train import _synthetic_scene_and_cams


def _setup(capacity_mult=8):
    scene, cams = _synthetic_scene_and_cams(n=120, n_cams=4, width=48, height=32, seed=31)
    # Round capacity to the mesh divisor.
    cap = ((scene.capacity + capacity_mult - 1) // capacity_mult) * capacity_mult
    scene = scene.compact(cap)
    return scene, cams


class TestShardedStep:
    def test_matches_unsharded(self):
        scene, cams = _setup()
        opt = OptConfig()
        cfg = RenderConfig(max_per_tile=64)
        step = make_sharded_train_step(opt, cfg)
        batch = stack_cameras(cams)
        bg = jnp.zeros(3)

        # Unsharded run (the step donates its inputs — rebuild for run 2).
        s1, a1, st1, m1 = step(
            scene, AdamState.init(scene), DensifyStats.init(scene.capacity),
            batch, bg, jnp.asarray(1.0), jnp.asarray(1.0),
        )

        # Sharded run on a 2x4 mesh, fresh (identical) inputs.
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        scene, cams = _setup()
        batch = stack_cameras(cams)
        mesh = make_mesh(devices[:8], data=2)
        scene_sh = shard_scene(scene, mesh)
        adam_sh = jax.device_put(AdamState.init(scene), replicated(mesh))
        stats_sh = jax.device_put(DensifyStats.init(scene.capacity), replicated(mesh))
        batch_sh = jax.device_put(batch, camera_batch_sharding(mesh))
        bg_sh = jax.device_put(bg, replicated(mesh))

        s2, a2, st2, m2 = step(
            scene_sh, adam_sh, stats_sh, batch_sh, bg_sh, jnp.asarray(1.0), jnp.asarray(1.0)
        )

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        np.testing.assert_allclose(np.asarray(s2.xyz), np.asarray(s1.xyz), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(st2.xyz_gradient_accum), np.asarray(st1.xyz_gradient_accum), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a2.mu["opacity"]), np.asarray(a1.mu["opacity"]), atol=1e-6
        )

    def test_render_transparent_to_sharding(self):
        scene, cams = _setup()
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(devices[:8], data=1)
        scene_sh = shard_scene(scene, mesh)
        cfg = RenderConfig(max_per_tile=64)
        a = render(cams[0], scene, cfg, bg_color=jnp.zeros(3))["render"]
        b = render(cams[0], scene_sh, cfg, bg_color=jnp.zeros(3))["render"]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)

    def test_stack_cameras(self):
        _, cams = _setup()
        batch = stack_cameras(cams)
        assert batch.world_view_transform.shape == (4, 4, 4)
        assert batch.original_image.shape[0] == 4
        np.testing.assert_array_equal(
            np.asarray(batch.camera_center[2]), np.asarray(cams[2].camera_center)
        )
