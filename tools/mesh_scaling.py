"""Virtual-mesh strong-scaling measurement for the sharded train step.

Runs the SAME global problem (fixed capacity, fixed camera batch) on 1/2/4/8
virtual CPU devices, measures steady-state step time, and audits the
collectives XLA placed at each mesh size. This is the in-env proxy for the
BASELINE.md north star (>=80% scaling efficiency over ICI): real ICI scaling
needs a pod, but the virtual mesh proves the sharded program (a) partitions
(per-device peak memory shrinks with the mesh), (b) communicates only the
small projected-splat representation + grad psum, and (c) adds no
pathological serialization as devices are added.

CPU caveat, recorded in the output: all virtual devices share one host's
cores, so wall-clock here measures partitioning overhead, not ICI speedup —
flat-or-better times at fixed global work are the pass signal.

Usage: python tools/mesh_scaling.py [--out MULTICHIP_SCALING.md]
"""

import argparse
import math
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# The axon TPU PJRT plugin ignores JAX_PLATFORMS; force the CPU mesh.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: each mesh config's step takes minutes to compile
# on the virtual mesh; a killed/rerun sweep should pay it once.
jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


CAPACITY = 16_384
BATCH = 8
WIDTH, HEIGHT = 160, 96
WARMUP, ITERS = 3, 15


def build_problem():
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_scene_and_camera
    from gaussian_transformer_tpu.parallel import stack_cameras

    scene, cams = _tiny_scene_and_camera(
        n=CAPACITY // 2, capacity=CAPACITY, width=WIDTH, height=HEIGHT, sh_degree=2
    )
    reps = [cams[i % len(cams)] for i in range(BATCH)]
    batch = stack_cameras(reps)
    return scene, batch


def run_config(scene, batch, data, gauss):
    import jax
    import jax.numpy as jnp

    from gaussian_transformer_tpu.parallel import make_mesh, make_sharded_train_step
    from gaussian_transformer_tpu.parallel.audit import (
        collective_report,
        hlo_of_compiled,
        summarize,
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

    n = data * gauss
    mesh = make_mesh(jax.devices()[:n], data=data)
    # Fresh buffers per config: on a 1-device mesh device_put ALIASES the
    # input arrays, and the donating step would delete the shared originals.
    scene = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), scene)
    scene_s = shard_scene(scene, mesh)
    batch_s = jax.device_put(batch, camera_batch_sharding(mesh))
    adam = jax.device_put(AdamState.init(scene_s), adam_sharding(mesh, AdamState.init(scene_s)))
    stats = jax.device_put(DensifyStats.init(scene.capacity), replicated(mesh))
    bg = jax.device_put(jnp.zeros(3, jnp.float32), replicated(mesh))
    slrs = jnp.asarray(1.0, jnp.float32)

    # mesh= -> manual shard_map path (the real-TPU-compilable form) on
    # multi-device configs; single-device keeps the plain jit step.
    step = make_sharded_train_step(
        OptConfig(), RenderConfig(max_per_tile=128, tile_block=32),
        mesh=mesh if n > 1 else None,
    )
    lowered = step.lower(scene_s, adam, stats, batch_s, bg, jnp.asarray(1.0), slrs)
    compiled = lowered.compile()
    try:
        hlo = hlo_of_compiled(compiled)
    except Exception:
        hlo = compiled.as_text()
    report = collective_report(hlo)
    mem = compiled.memory_analysis()
    peak = getattr(mem, "temp_size_in_bytes", 0) + getattr(mem, "argument_size_in_bytes", 0)

    # Drive the jit callable, not the AOT executable: XLA may emit output
    # shardings (e.g. gauss-sharded stats) that differ from the replicated
    # inputs, and the AOT object rejects its own outputs on the next call;
    # jit simply specializes once more and reaches a steady state.
    state = (scene_s, adam, stats)
    it = 1.0
    for _ in range(WARMUP):
        state = step(*state, batch_s, bg, jnp.asarray(it), slrs)[:3]
        it += 1.0
    jax.block_until_ready(state[0].xyz)
    t0 = time.time()
    for _ in range(ITERS):
        state = step(*state, batch_s, bg, jnp.asarray(it), slrs)[:3]
        it += 1.0
    jax.block_until_ready(state[0].xyz)
    dt = (time.time() - t0) / ITERS
    loss = float(step(*state, batch_s, bg, jnp.asarray(it), slrs)[3]["loss"])
    summary = summarize(report).splitlines()[0] if report else "none"
    return {
        "devices": n, "data": data, "gauss": gauss, "ms": dt * 1e3,
        "peak_mb": peak / 1e6, "loss": loss, "collectives": summary,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="MULTICHIP_SCALING.md")
    args = parser.parse_args()

    scene, batch = build_problem()
    configs = [(1, 1), (1, 2), (2, 2), (2, 4)]
    rows = [run_config(scene, batch, d, g) for d, g in configs]

    base_loss = rows[0]["loss"]
    lines = [
        "# Virtual-mesh strong scaling (8 virtual CPU devices, one host)",
        "",
        f"Fixed global work: capacity={CAPACITY} Gaussians, batch={BATCH} cameras "
        f"at {WIDTH}x{HEIGHT}, full sharded train step (fwd+bwd+Adam+stats).",
        "",
        f"CPU caveat: this host has {os.cpu_count()} cores, so larger virtual",
        "meshes run oversubscribed (plus interpret-mode Pallas kernels) —",
        "wall-clock here measures partitioning + oversubscription overhead,",
        "not ICI speedup. Pass signals: identical losses across mesh sizes,",
        "shrinking per-device argument memory, and the collective audit",
        "(payloads bounded by the projected-splat representation).",
        "",
        "| devices | mesh (data x gauss) | ms/step | vs 1-dev | peak arg+temp MB | collectives |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        rel = rows[0]["ms"] / r["ms"]
        lines.append(
            f"| {r['devices']} | {r['data']}x{r['gauss']} | {r['ms']:.0f} "
            f"| {rel:.2f}x | {r['peak_mb']:.0f} | {r['collectives']} |"
        )
        assert np.isfinite(r["loss"]), r
        assert abs(r["loss"] - base_loss) < 1e-3 + 0.05 * abs(base_loss), (
            f"sharded loss diverged from 1-device run: {r['loss']} vs {base_loss}"
        )
    lines += ["", f"Losses agree across mesh sizes (1-dev {base_loss:.5f})."]
    text = "\n".join(lines) + "\n"
    print(text)
    with open(args.out, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
