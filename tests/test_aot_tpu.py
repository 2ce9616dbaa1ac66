"""Deviceless TPU AOT compile gate (tools/aot_check.py as a test).

libtpu ships in the image; jax.experimental.topologies exposes a
compile-only v5e client, so the REAL TPU compiler (XLA + Mosaic backend)
validates the Pallas kernels' on-chip compilability in CI even with no
chip attached. Three latent multi-chip compile bugs were found this way in
round 3 (ROUND3.md).

Runs in a SUBPROCESS: creating the topology client flips
``jax.default_backend()`` to "tpu" for the rest of the process, which
would break every later interpret-mode kernel test in the suite.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_gate(args, timeout=1500):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "aot_check.py")] + args,
        capture_output=True, text=True, timeout=timeout, cwd=REPO, env=env,
    )
    if out.returncode != 0 and "get_topology_desc" in out.stderr:
        pytest.skip("no deviceless TPU compile client available")
    assert out.returncode == 0, (
        f"aot_check {args} failed:\nSTDOUT:{out.stdout[-2000:]}\nSTDERR:{out.stderr[-3000:]}"
    )
    return out.stdout


@pytest.mark.slow
def test_train_step_compiles_for_v5e():
    out = _run_gate(["--scale", "test"])
    assert "AOT OK [test" in out


@pytest.mark.slow
def test_multichip_programs_compile_for_v5e_2x2():
    out = _run_gate(["--scale", "none", "--sharded", "--stacked", "--flat"], timeout=2400)
    assert "gauss-sharded" in out and "butterfly" in out
    assert "FSDP" in out and "DPxFSDP" in out and "flat ring" in out
