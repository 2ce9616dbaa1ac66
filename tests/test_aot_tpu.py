"""Deviceless TPU AOT compile gate (tools/aot_check.py as a test).

libtpu ships in the image; jax.experimental.topologies exposes a
compile-only v5e client, so the REAL TPU compiler (XLA + Mosaic backend)
validates the Pallas kernels' on-chip compilability in CI even with no
chip attached. Slow (~75 s cold, seconds when the persistent compile
cache is warm)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_render import make_camera, make_scene


@pytest.mark.slow
def test_train_step_compiles_for_v5e():
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    except Exception as e:  # libtpu absent or topology API unavailable
        pytest.skip(f"no deviceless TPU compile client: {e}")

    import gaussian_transformer_tpu.render.pallas_composite as pc

    orig = pc._use_interpret
    pc._use_interpret = lambda: False  # lower the REAL Mosaic kernels
    try:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from gaussian_transformer_tpu.render import RenderConfig
        from gaussian_transformer_tpu.scene.densify import DensifyStats
        from gaussian_transformer_tpu.train.optim import AdamState
        from gaussian_transformer_tpu.train.splat import OptConfig, train_step

        scene = make_scene(256, seed=3, spread=1.2)
        cam = make_camera(width=256, height=192)
        gt = jnp.zeros((3, 192, 256), jnp.float32)
        cam = cam.replace(original_image=gt).anonymize()
        cfg = RenderConfig()
        opt = OptConfig()
        adam = AdamState.init(scene)
        stats = DensifyStats.init(scene.capacity)
        bg = jnp.zeros(3, jnp.float32)

        def step(scene, adam, stats):
            return train_step(
                scene, adam, stats, cam, bg, jnp.float32(1.0),
                jnp.float32(1.0), opt, cfg,
            )[:3]

        dev_mesh = Mesh(np.asarray(topo.devices[:1]).reshape(1), ("x",))
        repl = NamedSharding(dev_mesh, P())
        shaped = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=repl),
            (scene, adam, stats),
        )
        compiled = jax.jit(step).lower(*shaped).compile()
        mem = compiled.memory_analysis()
        assert getattr(mem, "temp_size_in_bytes", 1) >= 0
    finally:
        pc._use_interpret = orig
