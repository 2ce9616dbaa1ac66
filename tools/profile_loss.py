#!/usr/bin/env python
"""Microbenchmark the L1+SSIM loss forward/backward at 1080p on the chip.

The train-step attribution (tools/profile_rest.py) measured the loss AD at
~14.5 ms — scale-independent, so it taxes every bench point. This tool
splits that cost: L1 grad, SSIM forward, SSIM grad, combined-loss grad.

Usage: PYTHONPATH=/root/repo python tools/profile_loss.py [iters]
"""

import sys
import time

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/gt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from gaussian_transformer_tpu.ops.losses import l1_loss, ssim

    H, W = 1080, 1920
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    gt = jnp.asarray(rng.rand(3, H, W).astype(np.float32))

    def timeit(name, fn):
        run = jax.jit(lambda n, x: lax.fori_loop(
            0, n, lambda i, s: s + fn(x + s * 1e-38) * 1e-30, jnp.float32(0.0)))
        float(run(2, img))
        t0 = time.time(); float(run(2, img)); t_base = time.time() - t0
        t0 = time.time(); float(run(2 + iters, img))
        dt = (time.time() - t0 - t_base) / iters
        print(f"{name:28s} {dt*1e3:9.3f} ms", flush=True)
        return dt

    lam = 0.2

    def combined(x):
        return (1.0 - lam) * l1_loss(x, gt) + lam * (1.0 - ssim(x, gt))

    timeit("l1 fwd", lambda x: l1_loss(x, gt))
    timeit("l1 grad", lambda x: jnp.sum(jax.grad(lambda y: l1_loss(y, gt))(x)))
    timeit("ssim fwd", lambda x: ssim(x, gt))
    timeit("ssim grad", lambda x: jnp.sum(jax.grad(lambda y: ssim(y, gt))(x)))
    timeit("combined fwd", combined)
    timeit("combined grad", lambda x: jnp.sum(jax.grad(combined)(x)))


if __name__ == "__main__":
    main()
