"""Real-TPU-chip tests (pytest -m chip, gated on GT_CHIP_TESTS=1).

The default suite runs on a virtual CPU mesh (conftest.py forces
JAX_PLATFORMS=cpu); everything here needs the physical chip and runs in a
SUBPROCESS with the TPU backend enabled, so Mosaic's block-shape/alignment
checks and the backend's fusion passes — which interpret mode skips — are
actually exercised (ADVICE r4: unaligned fused_ssim shapes were only
interpret-tested; VERDICT r4 #9: the pinned chamfer scatter crash had no
tracked repro).

Run on a chip host:  GT_CHIP_TESTS=1 python -m pytest tests/test_chip.py -m chip -v
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.chip,
    pytest.mark.skipif(
        os.environ.get("GT_CHIP_TESTS", "0") != "1",
        reason="needs the real TPU chip (set GT_CHIP_TESTS=1)",
    ),
]


def _run_on_chip(code: str, timeout=900):
    """Run a python snippet in a fresh process with the TPU backend live."""
    # Restore the launch-time platform (conftest.py forces this process to
    # cpu but records the original): on this image the chip is reached via
    # the axon PJRT plugin, which needs JAX_PLATFORMS=axon AND
    # /root/.axon_site on the PYTHONPATH (overwriting either loses the chip).
    env = dict(os.environ)
    orig = env.pop("GT_ORIG_JAX_PLATFORMS", None)
    if orig:
        env["JAX_PLATFORMS"] = orig
    else:
        env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )


def test_fused_ssim_unaligned_shapes_compiled():
    """Compiled (non-interpret) Mosaic kernels over non-128-multiple widths
    and non-band-aligned heights, value+grad vs the XLA path (ADVICE r4)."""
    out = _run_on_chip(
        """
        import numpy as np, jax, jax.numpy as jnp
        assert jax.default_backend() == "tpu", jax.default_backend()
        from gaussian_transformer_tpu.ops.fused_ssim import fused_ssim
        from gaussian_transformer_tpu.ops.losses import ssim as ssim_ref
        import os; os.environ["GT_FUSED_SSIM"] = "0"  # reference = pure XLA

        for shape in [(1, 128, 131), (3, 65, 97), (1, 9, 7), (3, 70, 140),
                      (1, 63, 256), (3, 129, 130)]:
            rng = np.random.RandomState(sum(shape))
            a = jnp.asarray(rng.rand(*shape).astype(np.float32))
            b = jnp.asarray(rng.rand(*shape).astype(np.float32))
            ref = float(ssim_ref(a, b, 11, True))
            got = float(fused_ssim(a, b, "pallas"))
            assert abs(got - ref) < 1e-5, (shape, got, ref)
            ga = jax.grad(lambda x: ssim_ref(x, b, 11, True))(a)
            fa = jax.grad(lambda x: fused_ssim(x, b, "pallas"))(a)
            err = float(jnp.abs(fa - ga).max())
            assert err < 1e-6, (shape, err)
        print("UNALIGNED-OK")
        """
    )
    assert out.returncode == 0 and "UNALIGNED-OK" in out.stdout, (
        f"STDOUT:{out.stdout[-2000:]}\nSTDERR:{out.stderr[-4000:]}"
    )


def test_chamfer_vmap_scatter_repro():
    """Tracked repro of the pinned TPU batched-scatter pathology
    (KNOWN_GAPS.md): vmapping the chamfer matched-pair re-gather makes its
    backward a BATCHED scatter-add. On jax 0.9.0 / v5-lite this originally
    ABORTED the backend (SortedScatterEmitter bad_optional_access); measured
    2026-08-20 the simple pattern now compiles but the REAL blockwise-scan
    chamfer (this repro) HANGS the compiler (>15 min, no progress), so
    ops/chamfer.py keeps the Python batch unroll. If this test FAILS (the
    repro compiles+runs inside its 5-minute budget), the compiler is fixed —
    switch chamfer_distance back to jax.vmap and delete this repro."""
    try:
        out = _run_on_chip(
            """
            import numpy as np, jax, jax.numpy as jnp, functools
            assert jax.default_backend() == "tpu", jax.default_backend()
            from gaussian_transformer_tpu.ops.chamfer import _min_dist_one_way

            def one(a1, b1):
                _, idx1 = _min_dist_one_way(
                    jax.lax.stop_gradient(a1), jax.lax.stop_gradient(b1), 512)
                return jnp.sum((a1 - b1[idx1]) ** 2)

            rng = np.random.RandomState(0)
            a = jnp.asarray(rng.randn(4, 512, 26).astype(np.float32))
            b = jnp.asarray(rng.randn(4, 768, 26).astype(np.float32))
            g = jax.jit(jax.grad(
                lambda x, y: jnp.sum(jax.vmap(one)(x, y)), argnums=1))(a, b)
            g.block_until_ready()
            print("VMAP-SCATTER-OK")
            """,
            timeout=300,
        )
    except subprocess.TimeoutExpired:
        return  # compile hang == the pin still holds; test passes
    if out.returncode == 0 and "VMAP-SCATTER-OK" in out.stdout:
        pytest.fail(
            "pinned TPU batched-scatter pathology appears FIXED on this "
            "backend: remove the Python batch unroll in ops/chamfer.py "
            "(use jax.vmap) and delete this repro test."
        )
    # Crash (SIGABRT / nonzero rc) == the pin still holds; test passes.
