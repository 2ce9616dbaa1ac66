"""Auxiliary-subsystem tests: profiling timer/trace, heartbeat, crash saver,
viewer protocol roundtrip (SURVEY.md §5)."""

import json
import os
import socket
import threading
import time

import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.parallel.health import CrashSaver, HeartbeatTimeout, heartbeat
from gaussian_transformer_tpu.utils.profiling import StepTimer, device_memory_stats, trace


class TestProfiling:
    def test_step_timer_ema(self):
        t = StepTimer(ema=0.5)
        with t:
            time.sleep(0.01)
        first = t.ema_ms
        assert first >= 10
        with t:
            time.sleep(0.03)
        assert t.ema_ms > first
        assert t.last_ms >= 30

    def test_trace_produces_files(self, tmp_path):
        with trace(str(tmp_path)):
            jnp.sum(jnp.ones((128, 128))).block_until_ready()
        found = []
        for root, _, files in os.walk(tmp_path):
            found.extend(files)
        assert found, "no trace files written"

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)


class TestHealth:
    def test_heartbeat_completes(self):
        assert heartbeat(timeout_s=120.0)

    def test_crash_saver(self):
        saved = []
        cs = CrashSaver(lambda: saved.append(1), swallow=True)

        def bad_step():
            raise RuntimeError("boom")

        assert cs(bad_step) is None
        assert saved == [1]
        assert cs.crash_count == 1
        assert cs(lambda: 42) == 42

    def test_crash_saver_reraise(self):
        cs = CrashSaver(lambda: None, swallow=False)
        with pytest.raises(RuntimeError):
            cs(lambda: (_ for _ in ()).throw(RuntimeError("x")))


class TestViewerProtocol:
    def test_stacked_live_streaming(self):
        """pump_stacked: while the client requests train=False, one image is
        sent per decode step (live autoregressive streaming); train=True
        returns control to the trainer."""
        from gaussian_transformer_tpu.viewer import network_gui

        port = 16611
        network_gui.init("127.0.0.1", port)

        H, W = 6, 10

        class FakeStream:
            n_steps = 3

            def start(self):
                return 0

            def step(self, carry):
                return carry + 1

            def render(self, carry, cam, smod, show_prompt, show_pred):
                # Encode the step index into the pixel value to observe order.
                v = carry / 255.0
                return jnp.broadcast_to(jnp.float32(v), (3, H, W))

        def render_train_fn(cam, smod, show_prompt, show_pred):
            return jnp.broadcast_to(jnp.float32(200 / 255.0), (3, H, W))

        def request(train):
            msg = {
                "resolution_x": W, "resolution_y": H, "train": train, "fov_y": 0.8,
                "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0, "shs_python": True,
                "rot_scale_python": False, "keep_alive": True, "scaling_modifier": 1.0,
                "view_matrix": list(np.eye(4).ravel().astype(float)),
                "view_projection_matrix": list(np.eye(4).ravel().astype(float)),
            }
            payload = json.dumps(msg).encode()
            return len(payload).to_bytes(4, "little") + payload

        def recv_reply(s):
            want = H * W * 3
            img = b""
            while len(img) < want:
                chunk = s.recv(want - len(img))
                assert chunk, "connection closed mid-image"
                img += chunk
            ln = int.from_bytes(s.recv(4), "little")
            s.recv(ln)
            return img[0]  # first byte encodes the step index

        got = []

        def client():
            time.sleep(0.1)
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            s.sendall(request(False))  # pause training -> server streams
            got.append(recv_reply(s))  # step 1
            s.sendall(request(False))
            got.append(recv_reply(s))  # step 2
            s.sendall(request(False))
            got.append(recv_reply(s))  # step 3
            s.sendall(request(True))  # resume training
            got.append(recv_reply(s))  # final (repeat of last) image
            s.close()

        th = threading.Thread(target=client)
        th.start()
        deadline = time.time() + 15
        while time.time() < deadline and len(got) < 4:
            network_gui.pump_stacked(render_train_fn, FakeStream(), "/scene")
            time.sleep(0.02)
        th.join(timeout=5)
        network_gui.conn = None

        assert got == [1, 2, 3, 3], got

    def test_wire_roundtrip(self):
        """Drive the network_gui server with a fake SIBR client over a real
        socket: JSON request -> image bytes + source path reply."""
        from gaussian_transformer_tpu.viewer import network_gui

        port = 16609
        network_gui.init("127.0.0.1", port)

        H, W = 8, 12
        img = jnp.broadcast_to(jnp.asarray([0.25, 0.5, 0.75])[:, None, None], (3, H, W))
        served = {}

        def render_fn(cam, smod):
            served["cam"] = cam
            served["smod"] = smod
            return img

        def client():
            time.sleep(0.1)
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            msg = {
                "resolution_x": W, "resolution_y": H, "train": True, "fov_y": 0.8,
                "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0, "shs_python": False,
                "rot_scale_python": False, "keep_alive": False, "scaling_modifier": 1.0,
                "view_matrix": list(np.eye(4).ravel().astype(float)),
                "view_projection_matrix": list(np.eye(4).ravel().astype(float)),
            }
            payload = json.dumps(msg).encode()
            s.sendall(len(payload).to_bytes(4, "little") + payload)
            img_bytes = b""
            want = H * W * 3
            while len(img_bytes) < want:
                img_bytes += s.recv(want - len(img_bytes))
            ln = int.from_bytes(s.recv(4), "little")
            verify = s.recv(ln).decode()
            s.close()
            return img_bytes, verify

        result = {}
        th = threading.Thread(target=lambda: result.update(zip(("img", "verify"), client())))
        th.start()
        deadline = time.time() + 10
        while time.time() < deadline and not result:
            network_gui.pump(render_fn, source_path="/scene/path")
            time.sleep(0.02)
        th.join(timeout=5)
        network_gui.conn = None

        assert served["smod"] == 1.0
        assert served["cam"].image_width == W and served["cam"].image_height == H
        arr = np.frombuffer(result["img"], np.uint8).reshape(H, W, 3)
        np.testing.assert_array_equal(arr[0, 0], [63, 127, 191])
        assert result["verify"] == "/scene/path"


class TestOrbaxCheckpoint:
    """Async Orbax checkpointing (train/orbax_ckpt.py) — roundtrip, history
    retention, and latest-step discovery."""

    def test_roundtrip_and_retention(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from gaussian_transformer_tpu.train import orbax_ckpt

        if not orbax_ckpt.available():
            import pytest

            pytest.skip("orbax not installed")
        tree = {
            "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(4)},
            "count": jnp.asarray(7),
        }
        mgr = orbax_ckpt.make_manager(str(tmp_path), max_to_keep=2)
        for step in (1, 2, 3):
            orbax_ckpt.save(mgr, step, jax.tree.map(lambda a: a + step, tree))
        mgr.wait_until_finished()
        assert mgr.latest_step() == 3
        # Bounded history: step 1 evicted.
        assert 1 not in mgr.all_steps()

        restored = orbax_ckpt.restore(mgr, tree)
        np.testing.assert_allclose(
            np.asarray(restored["params"]["w"]),
            np.asarray(tree["params"]["w"]) + 3,
        )
        assert int(restored["count"]) == 10
        mgr.close()

    def test_restore_empty_returns_none(self, tmp_path):
        from gaussian_transformer_tpu.train import orbax_ckpt

        if not orbax_ckpt.available():
            import pytest

            pytest.skip("orbax not installed")
        mgr = orbax_ckpt.make_manager(str(tmp_path))
        assert orbax_ckpt.restore(mgr, {"x": np.zeros(2)}) is None
        mgr.close()
