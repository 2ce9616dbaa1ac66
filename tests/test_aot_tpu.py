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


@pytest.mark.slow
def test_multichip_programs_compile_for_v5e_2x2():
    """The two deviceless-AOT-gate findings of round 3 as a permanent CI
    check: (1) the MANUAL sharded splat step (jit-SPMD form is rejected —
    Mosaic kernels cannot be auto-partitioned), (2) the stacked FSDP step
    (render-in-the-loss needs the manual wrapper). Both must compile with
    the real v5e 2x2 toolchain."""
    try:
        from jax.experimental import topologies

        topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    except Exception as e:
        pytest.skip(f"no deviceless TPU compile client: {e}")

    import types

    import optax

    import gaussian_transformer_tpu.render.pallas_composite as pc
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _tiny_scene_and_camera
    from gaussian_transformer_tpu.models.transformer import init_model, make_model
    from gaussian_transformer_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        stack_cameras,
    )
    from gaussian_transformer_tpu.parallel.fsdp import fsdp_shardings, make_fsdp_mesh
    from gaussian_transformer_tpu.parallel.mesh import (
        adam_sharding,
        camera_batch_sharding,
        replicated,
        scene_sharding,
    )
    from gaussian_transformer_tpu.render import RenderConfig
    from gaussian_transformer_tpu.scene.densify import DensifyStats
    from gaussian_transformer_tpu.train.optim import AdamState
    from gaussian_transformer_tpu.train.splat import OptConfig
    from gaussian_transformer_tpu.train.stacked import (
        TrainingScene,
        make_train_step,
        stacked_token_dim,
    )

    devices = list(topo.devices)[:4]
    scene, cams = _tiny_scene_and_camera(n=128, capacity=256, width=64, height=48)
    batch = stack_cameras(cams[:4])

    def shaped(tree, sh):
        return jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a), sharding=s),
            tree, sh,
        )

    orig = pc._use_interpret
    pc._use_interpret = lambda: False
    try:
        # (1) manual sharded splat step
        mesh = make_mesh(devices, data=2)
        sh = scene_sharding(mesh)
        scene_shaped = scene.replace(**{
            k: jax.ShapeDtypeStruct(getattr(scene, k).shape, getattr(scene, k).dtype, sharding=s)
            for k, s in sh.items()
        })
        adam0 = AdamState.init(scene)
        stats0 = DensifyStats.init(scene.capacity)
        step = make_sharded_train_step(OptConfig(), RenderConfig(), mesh=mesh)
        step.lower(
            scene_shaped,
            shaped(adam0, adam_sharding(mesh, adam0)),
            shaped(stats0, jax.tree.map(lambda _: replicated(mesh), stats0)),
            shaped(batch, jax.tree.map(lambda _: camera_batch_sharding(mesh), batch)),
            jax.ShapeDtypeStruct((3,), np.float32, sharding=replicated(mesh)),
            jax.ShapeDtypeStruct((), np.float32, sharding=replicated(mesh)),
            jax.ShapeDtypeStruct((), np.float32, sharding=replicated(mesh)),
        ).compile()
    finally:
        pc._use_interpret = orig

    # (2) stacked FSDP step (TrainingScene setup executes interpret renders)
    stack = 2
    D = stacked_token_dim(stack)
    ts = TrainingScene(
        types.SimpleNamespace(gaussians=scene, get_train_cameras=lambda scale=1.0: cams),
        RenderConfig(max_per_tile=64), batch_size=2, stack=stack, bucket=4,
    )
    ts.set_epoch(1000)
    b = ts.make_batch([0, 1])
    model = make_model(stack, D, D, N=1, d_model=D, dropout=0.0)
    params = init_model(model, jax.random.PRNGKey(3))
    optimizer = optax.adam(1.0, eps=1e-4)
    opt_state = optimizer.init(params)
    mesh4 = make_fsdp_mesh(devices)
    repl4 = NamedSharding(mesh4, P())
    pc._use_interpret = lambda: False
    try:
        sstep = make_train_step(model, ts.handler, ts.render_cfg, optimizer, stack, mesh=mesh4)
        sstep.lower(
            shaped(params, fsdp_shardings(params, mesh4, min_size=1024)),
            shaped(opt_state, fsdp_shardings(opt_state, mesh4, min_size=1024)),
            jax.ShapeDtypeStruct(b.src.shape, b.src.dtype, sharding=repl4),
            jax.ShapeDtypeStruct(b.trg_y.shape, b.trg_y.dtype, sharding=repl4),
            jax.tree.map(lambda a: jax.ShapeDtypeStruct(
                jnp.shape(a), jnp.result_type(a), sharding=repl4), b.cameras),
            jax.ShapeDtypeStruct((), np.float32, sharding=repl4),
            jax.ShapeDtypeStruct(b.src_mask.shape, b.src_mask.dtype, sharding=repl4),
        ).compile()
    finally:
        pc._use_interpret = orig
