"""Two-process jax.distributed runtime test (CPU backend).

The multi-host story (SURVEY §2.3 / parallel/mesh.init_distributed) has to
work beyond a single process: this spawns 2 coordinator-connected processes,
each contributing 2 virtual CPU devices, builds a global 4-device mesh, and
runs a psum + a gauss-sharded scene reduction across process boundaries.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid,
    local_device_ids=None,
)
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from gaussian_transformer_tpu.parallel.mesh import make_mesh

mesh = make_mesh(jax.devices(), data=2)  # 2 x 2 (data, gauss) across processes
x = jnp.arange(8.0)
sh = NamedSharding(mesh, P("gauss"))
xs = jax.device_put(x, NamedSharding(mesh, P(("data", "gauss"))))
total = jax.jit(lambda v: jnp.sum(v) * jnp.ones(()))(xs)
np.testing.assert_allclose(float(total), 28.0)

# Cross-process collective through shard_map; replicated scalar out so every
# process can fetch it (non-replicated global arrays are not locally
# addressable in multi-process mode).
f = jax.shard_map(
    lambda v: jax.lax.psum(jnp.sum(v), ("data", "gauss")),
    mesh=mesh, in_specs=P(("data", "gauss")), out_specs=P(),
)
out = jax.jit(f)(xs)
np.testing.assert_allclose(float(out), 28.0)
print(f"worker {pid} OK", flush=True)
"""


def test_two_process_psum(tmp_path):
    # Bounded by the 240s communicate() timeout below (pytest-timeout is not
    # in this image, so a timeout mark would be an unregistered no-op).
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    assert "worker 0 OK" in outs[0]
    assert "worker 1 OK" in outs[1]


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
