#!/usr/bin/env python
"""Deviceless probe: HBM staging cost of the stream kernel's narrow operand.

Uses the compile-only v5e client to measure the compiler's temp allocation
for a minimal kernel reading a [N, 16] property stream vs a lane-native
[N/8, 128] layout. Finding (2026-08-18, libtpu 0.0.34):

    [N, 16] fp32   -> temp 1655 MB   (= 8 x the 207 MB array!)
    [N, 16] bf16   -> temp  828 MB   (same 8x)
    [N/8, 128] bf16 -> temp    0 MB  (streams directly)

i.e. XLA/Mosaic stages any narrow-minor operand through a 128-lane-padded
HBM copy before the Pallas pipeline can consume it — an 8x write+read
amplification on the stream compositor's DOMINANT operand (both v2 and v3
kernels, fp32 and bf16). Manual ANY-space DMA of narrow refs is rejected
outright ("Slice shape along dimension 1 must be aligned to tiling (128)"),
and in-kernel (B,128)->(8B,16) reshapes are unsupported ("unsupported shape
cast"), so the only real fix is a TRANSPOSED kernel layout — properties
[16, I_pad] with instances on lanes and pixels on sublanes, lane-wise
scans (pltpu.roll) for the transmittance recurrence. That is the #1
measured-at-the-compiler perf lever for the next session (KNOWN_GAPS.md).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental import topologies
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    topo = topologies.get_topology_desc("v5e:2x2", platform="tpu")
    mesh = Mesh(np.asarray(topo.devices[:1]).reshape(1), ("x",))
    repl = NamedSharding(mesh, P())
    N = 3_232_768  # ~1M-Gaussian-scale padded stream rows

    def probe(shape, dt, blk):
        def kernel(x_ref, o_ref):
            o_ref[0, 0] = jnp.sum(x_ref[:].astype(jnp.float32))

        def f(x):
            return pl.pallas_call(
                kernel,
                grid_spec=pl.GridSpec(
                    grid=(shape[0] // blk[0],),
                    in_specs=[pl.BlockSpec(blk, lambda g: (g, 0), memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
                ),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            )(x)

        sh = jax.ShapeDtypeStruct(shape, dt, sharding=repl)
        c = jax.jit(f).lower(sh).compile()
        return c.memory_analysis().temp_size_in_bytes / 1e6

    for name, shape, dt, blk in (
        ("[N,16] fp32 (current stream layout)", (N, 16), jnp.float32, (2048, 16)),
        ("[N,16] bf16", (N, 16), jnp.bfloat16, (2048, 16)),
        ("[N/8,128] bf16 (lane-native)", (N // 8, 128), jnp.bfloat16, (256, 128)),
        ("[16,N] fp32 (transposed, lane-native)", (16, N), jnp.float32, (16, 2048)),
    ):
        try:
            print(f"{name}: temp {probe(shape, dt, blk):.0f} MB")
        except Exception as e:
            print(f"{name}: failed: {str(e)[:120]}")


if __name__ == "__main__":
    main()
