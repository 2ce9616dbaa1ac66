#!/usr/bin/env python
"""Deviceless TPU AOT compile gate for the hot paths.

libtpu ships in this image, and ``jax.experimental.topologies`` exposes a
compile-only v5e client — so the REAL TPU compiler (XLA + Mosaic backend)
can build the actual executables with no chip attached. This catches every
class of on-chip compile failure (unsupported Pallas constructs, Mosaic
layout/lowering errors, VMEM overflows, HBM blowups) even when the tunnel
relay is down, and reports the compiler's memory analysis per config.

Usage: python tools/aot_check.py [--scale {none,test,17k,200k,1m,all}]
       [--precision fp32|bf16] [--sharded] [--stacked] [--flat]

Compiles the full train_step (render fwd + L1/SSIM loss + backward + Adam)
at the bench configuration. Exit 0 = everything compiled.
"""

import argparse
import math
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_step(scene, cam, extent, precision, use_stream=True):
    import jax
    import jax.numpy as jnp

    from gaussian_transformer_tpu.render import RenderConfig, tune_config
    from gaussian_transformer_tpu.scene.densify import DensifyStats
    from gaussian_transformer_tpu.train.optim import AdamState
    from gaussian_transformer_tpu.train.splat import OptConfig, train_step

    opt = OptConfig()
    cfg = RenderConfig(max_per_tile=256, precision=precision, use_stream=use_stream,
                       layout=os.environ.get("GT_LAYOUT", "rows"))
    # Budget tuning needs only the instance COUNTS; compute them with the
    # pure-XLA projection + binning (the full probe render would run the
    # interpret-mode kernel on CPU — hours at 1M Gaussians).
    from gaussian_transformer_tpu.render import _auto_chunk
    from gaussian_transformer_tpu.render.project import project_gaussians
    from gaussian_transformer_tpu.render.tiles import bin_stream, num_tiles

    import jax as _jax

    H, W = cam.image_height, cam.image_width
    proj = project_gaussians(
        scene.get_xyz, scene.get_scaling, scene.get_rotation,
        scene.get_opacity[:, 0], scene.get_features, None,
        world_view_transform=cam.world_view_transform,
        full_proj_transform=cam.full_proj_transform,
        camera_center=cam.camera_center, image_width=W, image_height=H,
        tan_fovx=math.tan(cam.fovx * 0.5), tan_fovy=math.tan(cam.fovy * 0.5),
        active_sh_degree=scene.active_sh_degree,
    )
    include = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)
    gw, gh = num_tiles(W), num_tiles(H)
    b = bin_stream(
        proj.means2d, proj.depths, proj.radii_bin, include, grid_w=gw, grid_h=gh,
        max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        max_instances=cfg.max_instances, max_stream=cfg.max_stream,
        chunk=_auto_chunk(scene.capacity, gw * gh, cfg),
    )
    counts = {"n_instances": int(np.asarray(b.n_instances)),
              "n_padded": int(np.asarray(b.n_padded)),
              "n_tiles": gw * gh}
    cfg = tune_config(cfg, counts)

    adam = AdamState.init(scene)
    stats = DensifyStats.init(scene.capacity)
    bg = jnp.zeros(3, jnp.float32)

    def step(scene, adam, stats):
        return train_step(
            scene, adam, stats, cam, bg, jnp.float32(1.0),
            jnp.asarray(extent, jnp.float32), opt, cfg,
        )[:3]

    return step, (scene, adam, stats), counts


def aot_compile(step, example_args, topo):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    dev_mesh = Mesh(np.asarray(topo.devices[:1]).reshape(1), ("x",))
    repl = NamedSharding(dev_mesh, P())
    shaped = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=repl), example_args
    )
    lowered = jax.jit(step).lower(*shaped)
    t0 = time.time()
    compiled = lowered.compile()
    dt = time.time() - t0
    mem = compiled.memory_analysis()
    return dt, mem


def aot_compile_sharded(topo):
    """Compile the MULTI-CHIP programs for a real v5e 2x2 slice: the
    camera-batched Gaussian-sharded train step and the tile-sharded
    (butterfly-fold) step — validating the collectives through the real
    ICI lowering, not just the virtual CPU mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _tiny_scene_and_camera
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
    from gaussian_transformer_tpu.render import RenderConfig
    from gaussian_transformer_tpu.scene.densify import DensifyStats
    from gaussian_transformer_tpu.train.optim import AdamState
    from gaussian_transformer_tpu.train.splat import OptConfig

    devices = list(topo.devices)[:4]
    scene, cams = _tiny_scene_and_camera(n=256, capacity=512, width=128, height=96)
    batch = stack_cameras(cams[:4])

    from gaussian_transformer_tpu.parallel.mesh import scene_sharding

    results = []
    for tile_axis, label in ((None, "gauss-sharded"), ("gauss", "tile-sharded butterfly")):
        mesh = make_mesh(devices, data=2 if tile_axis is None else 1)
        # Build shaped args structurally (no data movement — compile only).
        sh = scene_sharding(mesh)
        scene_shaped = scene.replace(**{
            k: jax.ShapeDtypeStruct(getattr(scene, k).shape, getattr(scene, k).dtype,
                                    sharding=s)
            for k, s in sh.items()
        })
        adam0 = AdamState.init(scene)
        adam_shaped = jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            adam0, adam_sharding(mesh, adam0),
        )
        stats0 = DensifyStats.init(scene.capacity)
        stats_shaped = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=replicated(mesh)),
            stats0,
        )
        batch_shaped = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                           sharding=camera_batch_sharding(mesh)),
            batch,
        )
        step = make_sharded_train_step(
            OptConfig(), RenderConfig(max_per_tile=64), mesh=mesh, tile_axis=tile_axis,
        )
        shaped = (
            scene_shaped, adam_shaped, stats_shaped, batch_shaped,
            jax.ShapeDtypeStruct((3,), np.float32, sharding=replicated(mesh)),
            jax.ShapeDtypeStruct((), np.float32, sharding=replicated(mesh)),
            jax.ShapeDtypeStruct((), np.float32, sharding=replicated(mesh)),
        )
        t0 = time.time()
        compiled = step.lower(*shaped).compile()
        results.append((label, time.time() - t0, compiled.memory_analysis()))
    return results


def aot_compile_stacked(topo):
    """Compile the stacked-transformer training steps for v5e: single-chip,
    FSDP-sharded (4-way), and DPxFSDP (2x2) — the render-in-the-loss means
    Mosaic kernels sit under these shardings too."""
    import types

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _tiny_scene_and_camera
    from gaussian_transformer_tpu.models.transformer import init_model, make_model
    from gaussian_transformer_tpu.parallel.fsdp import fsdp_shardings, make_fsdp_mesh
    from gaussian_transformer_tpu.render import RenderConfig
    from gaussian_transformer_tpu.train.stacked import (
        TrainingScene,
        make_dp_train_step,
        make_train_step,
        stacked_token_dim,
    )

    stack = 2
    D = stacked_token_dim(stack)
    scene, cams = _tiny_scene_and_camera(n=192, capacity=256, width=64, height=48, seed=11)
    # TrainingScene construction EXECUTES visibility renders on the CPU host —
    # those must run the interpret kernels; only the .lower() calls below
    # should trace the real Mosaic kernels.
    import gaussian_transformer_tpu.render.pallas_composite as pc

    not_interp = pc._use_interpret
    pc._use_interpret = lambda: True
    try:
        ts = TrainingScene(
            types.SimpleNamespace(gaussians=scene, get_train_cameras=lambda scale=1.0: cams),
            RenderConfig(max_per_tile=64), batch_size=2, stack=stack, bucket=4,
        )
        ts.set_epoch(1000)
        batch = ts.make_batch([0, 1])
        group = ts.make_batch_group(2)  # also executes visibility renders
    finally:
        pc._use_interpret = not_interp
    model = make_model(stack, D, D, N=1, d_model=D, dropout=0.0)
    params = init_model(model, jax.random.PRNGKey(3))
    optimizer = optax.adam(1.0, eps=1e-4)
    opt_state = optimizer.init(params)
    devices = list(topo.devices)[:4]

    def shaped_tree(tree, sh_tree):
        return jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a), sharding=s),
            tree, sh_tree,
        )

    results = []

    # (a) single-chip step
    mesh1 = Mesh(np.asarray(devices[:1]), ("x",))
    rep1 = NamedSharding(mesh1, P())
    step = make_train_step(model, ts.handler, ts.render_cfg, optimizer, stack)
    shaped = (
        shaped_tree(params, jax.tree.map(lambda _: rep1, params)),
        shaped_tree(opt_state, jax.tree.map(lambda _: rep1, opt_state)),
        jax.ShapeDtypeStruct(batch.src.shape, batch.src.dtype, sharding=rep1),
        jax.ShapeDtypeStruct(batch.trg_y.shape, batch.trg_y.dtype, sharding=rep1),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a), sharding=rep1),
                     batch.cameras),
        jax.ShapeDtypeStruct((), np.float32, sharding=rep1),
        jax.ShapeDtypeStruct(batch.src_mask.shape, batch.src_mask.dtype, sharding=rep1),
    )
    t0 = time.time()
    step.lower(*shaped).compile()
    results.append(("stacked single-chip", time.time() - t0))

    # (b) FSDP over 4 devices (mesh= wraps the render block in a manual
    # region — required for the TPU compiler)
    mesh4 = make_fsdp_mesh(devices)
    step = make_train_step(model, ts.handler, ts.render_cfg, optimizer, stack, mesh=mesh4)
    repl4 = NamedSharding(mesh4, P())
    p_sh = fsdp_shardings(params, mesh4, min_size=1024)
    o_sh = fsdp_shardings(opt_state, mesh4, min_size=1024)
    shaped = (
        shaped_tree(params, p_sh),
        shaped_tree(opt_state, o_sh),
        jax.ShapeDtypeStruct(batch.src.shape, batch.src.dtype, sharding=repl4),
        jax.ShapeDtypeStruct(batch.trg_y.shape, batch.trg_y.dtype, sharding=repl4),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a), sharding=repl4),
                     batch.cameras),
        jax.ShapeDtypeStruct((), np.float32, sharding=repl4),
        jax.ShapeDtypeStruct(batch.src_mask.shape, batch.src_mask.dtype, sharding=repl4),
    )
    t0 = time.time()
    step.lower(*shaped).compile()
    results.append(("stacked FSDP 4-way", time.time() - t0))

    # (c) DPxFSDP on a 2x2 mesh
    mesh22 = Mesh(np.asarray(devices).reshape(2, 2), ("data", "fsdp"))
    p22 = fsdp_shardings(params, mesh22, axis="fsdp", min_size=1024)
    o22 = fsdp_shardings(opt_state, mesh22, axis="fsdp", min_size=1024)
    data_sh = NamedSharding(mesh22, P("data"))
    repl22 = NamedSharding(mesh22, P())
    dp_step = make_dp_train_step(model, ts.handler, ts.render_cfg, optimizer,
                                 stack, mesh=mesh22, batch_size=2)
    shaped = (
        shaped_tree(params, p22),
        shaped_tree(opt_state, o22),
        jax.ShapeDtypeStruct(group.src.shape, group.src.dtype, sharding=data_sh),
        jax.ShapeDtypeStruct(group.trg_y.shape, group.trg_y.dtype, sharding=data_sh),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a), sharding=data_sh),
                     group.cameras),
        jax.ShapeDtypeStruct((), np.float32, sharding=repl22),
        jax.ShapeDtypeStruct(group.src_mask.shape, group.src_mask.dtype, sharding=data_sh),
    )
    t0 = time.time()
    dp_step.lower(*shaped).compile()
    results.append(("stacked DPxFSDP 2x2", time.time() - t0))
    return results


def aot_compile_flat_ring(topo):
    """Compile the flat trainer's sequence-parallel step (ring attention over
    2 devices + render-in-the-loss) for v5e."""
    import types

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _tiny_scene_and_camera
    from gaussian_transformer_tpu.parallel.mesh import make_mesh
    from gaussian_transformer_tpu.render import RenderConfig
    from gaussian_transformer_tpu.train.flat import (
        EmbeddedEncoderDecoder,
        FlatTrainingScene,
        init_flat_model,
        make_flat_loss,
        make_noam_adamax,
    )

    import gaussian_transformer_tpu.render.pallas_composite as pc

    scene, cams = _tiny_scene_and_camera(n=192, capacity=256, width=64, height=48, seed=11)
    cfg = RenderConfig(max_per_tile=64)
    not_interp = pc._use_interpret
    pc._use_interpret = lambda: True  # FlatTrainingScene executes renders
    try:
        ts = FlatTrainingScene(
            types.SimpleNamespace(gaussians=scene, get_train_cameras=lambda scale=1.0: cams),
            cfg, max_len=10_000, min_len=1, bucket=8,
        )
        batch = ts.make_batch(0)
    finally:
        pc._use_interpret = not_interp

    # init EXECUTES (ring shard_map included) — run it on a 2-device CPU
    # mesh; the step then lowers against the topology mesh (params are
    # mesh-independent pytrees).
    cpu_devs = jax.devices("cpu")
    assert len(cpu_devs) >= 2, (
        "aot_check --flat needs XLA_FLAGS=--xla_force_host_platform_device_count>=2"
    )
    cpu_mesh = make_mesh(cpu_devs[:2], data=1)
    model_cpu = EmbeddedEncoderDecoder(N=1, d_model=64, ring_axis="gauss", mesh=cpu_mesh)
    params = init_flat_model(model_cpu, jax.random.PRNGKey(0))

    devices = list(topo.devices)[:2]
    mesh = make_mesh(devices, data=1)  # ("data", "gauss"): ring over "gauss"
    model = EmbeddedEncoderDecoder(N=1, d_model=64, ring_axis="gauss", mesh=mesh)
    optimizer = make_noam_adamax(64)
    opt_state = optimizer.init(params)
    loss_fn = make_flat_loss(model, cfg)

    @jax.jit
    def step(params, opt_state, src, trg, trg_y, src_mask, trg_mask, cam, key):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, src, trg, trg_y, src_mask, trg_mask, cam, key
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    rep = NamedSharding(mesh, P())
    sh = lambda a: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x), sharding=rep), a
    )
    t0 = time.time()
    step.lower(
        sh(params), sh(opt_state), sh(batch["src"]), sh(batch["trg"]),
        sh(batch["trg_y"]), sh(batch["src_mask"]), sh(batch["trg_mask"]),
        sh(batch["cam"]),
        jax.ShapeDtypeStruct((2,), np.uint32, sharding=rep),
    ).compile()
    return [("flat ring seq-parallel (2-dev)", time.time() - t0)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", default="17k",
                        choices=["none", "test", "17k", "200k", "1m", "all"])
    parser.add_argument("--precision", default="fp32", choices=["fp32", "bf16"])
    parser.add_argument("--sharded", action="store_true",
                        help="also compile the multi-chip programs for v5e 2x2")
    parser.add_argument("--stacked", action="store_true",
                        help="also compile the stacked transformer steps for v5e")
    parser.add_argument("--flat", action="store_true",
                        help="also compile the flat ring-attention step for v5e")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from jax.experimental import topologies

    # Force the REAL Mosaic kernels through lowering (not interpret mode).
    import gaussian_transformer_tpu.render.pallas_composite as pc

    pc._use_interpret = lambda: False

    from bench import WIDTH, HEIGHT, _base_cloud, _camera, _densified_scene, _table_scene

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    if args.scale == "test":
        # tiny quick-compile config for CI (subprocess-isolated gate test)
        from __graft_entry__ import _tiny_scene_and_camera

        t_scene, t_cams = _tiny_scene_and_camera(n=128, capacity=256, width=128, height=96)
        cam = t_cams[0]
        extent = 2.0
        scales = {"test": lambda: t_scene}
        todo = ["test"]
    elif args.scale == "none":
        scales, todo = {}, []
        cam = extent = None
    else:
        rng = np.random.RandomState(0)
        pcd, center, extent = _base_cloud()
        cam = _camera(center, extent, rng)
        scales = {
            "17k": lambda: _table_scene(pcd),
            "200k": lambda: _densified_scene(pcd, 200_000),
            "1m": lambda: _densified_scene(pcd, 1_000_000),
        }
        todo = list(scales) if args.scale == "all" else [args.scale]
    for name in todo:
        scene = scales[name]()
        step, ex, counts = build_step(scene, cam, extent, args.precision)
        dt, mem = aot_compile(step, ex, topo)
        tb = getattr(mem, "temp_size_in_bytes", 0)
        ab = getattr(mem, "argument_size_in_bytes", 0)
        print(
            f"AOT OK [{name} {args.precision}] {WIDTH}x{HEIGHT} "
            f"instances={counts.get('n_instances', '?')} padded={counts.get('n_padded', '?')} "
            f"compile {dt:.0f}s; temp {tb/1e9:.2f} GB + args {ab/1e9:.2f} GB "
            f"(v5e HBM 16 GB)",
            flush=True,
        )
        assert tb + ab < 15e9, f"{name}: memory analysis exceeds one v5e chip"

    if args.sharded:
        for label, dt, mem in aot_compile_sharded(topo):
            tb = getattr(mem, "temp_size_in_bytes", 0)
            print(f"AOT OK [multi-chip v5e 2x2: {label}] compile {dt:.0f}s; "
                  f"temp {tb/1e9:.2f} GB/device", flush=True)

    if args.stacked:
        for label, dt in aot_compile_stacked(topo):
            print(f"AOT OK [{label}] compile {dt:.0f}s", flush=True)

    if args.flat:
        for label, dt in aot_compile_flat_ring(topo):
            print(f"AOT OK [{label}] compile {dt:.0f}s", flush=True)


if __name__ == "__main__":
    main()
