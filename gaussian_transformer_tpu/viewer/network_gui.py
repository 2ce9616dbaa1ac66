"""SIBR remote-viewer TCP bridge.

Byte-compatible with the reference's ``gaussian_renderer/network_gui.py``:
non-blocking listener, 4-byte little-endian length + JSON request carrying
resolution / train flag / FoVs / znear / zfar / python-path toggles /
keep_alive / scaling_modifier / view and view-projection matrices (with the
protocol's Y/Z column flips), reply = raw RGB bytes then 4-byte length +
source-path string. The wire format is preserved exactly so the external SIBR
C++ viewer keeps working; only the tensor plumbing is JAX.
"""

from __future__ import annotations

import json
import socket
import traceback

import numpy as np

from gaussian_transformer_tpu.scene.cameras import MiniCam

host = "127.0.0.1"
port = 6009

conn = None
addr = None

listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)


def init(wish_host: str, wish_port: int) -> None:
    """Bind the non-blocking listener (network_gui.py:26-32). Re-initializable:
    an already-bound listener is replaced so trainers (and tests) can rebind."""
    global host, port, listener
    host = wish_host
    port = wish_port
    try:
        listener.close()
    except OSError:
        pass
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect() -> None:
    global conn, addr, listener
    try:
        conn, addr = listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def read():
    global conn
    message_length = conn.recv(4)
    message_length = int.from_bytes(message_length, "little")
    message = conn.recv(message_length)
    return json.loads(message.decode("utf-8"))


def send(message_bytes, verify: str) -> None:
    global conn
    if message_bytes is not None:
        conn.sendall(message_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive():
    """Parse one request into a MiniCam + flags (network_gui.py:57-86)."""
    message = read()

    width = message["resolution_x"]
    height = message["resolution_y"]

    if width != 0 and height != 0:
        try:
            do_training = bool(message["train"])
            fovy = message["fov_y"]
            fovx = message["fov_x"]
            znear = message["z_near"]
            zfar = message["z_far"]
            do_shs_python = bool(message["shs_python"])
            do_rot_scale_python = bool(message["rot_scale_python"])
            keep_alive = bool(message["keep_alive"])
            scaling_modifier = message["scaling_modifier"]
            world_view_transform = np.reshape(
                np.asarray(message["view_matrix"], dtype=np.float32), (4, 4)
            )
            world_view_transform[:, 1] = -world_view_transform[:, 1]
            world_view_transform[:, 2] = -world_view_transform[:, 2]
            full_proj_transform = np.reshape(
                np.asarray(message["view_projection_matrix"], dtype=np.float32), (4, 4)
            )
            full_proj_transform[:, 1] = -full_proj_transform[:, 1]
            custom_cam = MiniCam.create(
                width, height, fovy, fovx, znear, zfar, world_view_transform, full_proj_transform
            )
        except Exception as e:
            print("")
            traceback.print_exc()
            raise e
        return custom_cam, do_training, do_shs_python, do_rot_scale_python, keep_alive, scaling_modifier
    else:
        return None, None, None, None, None, None


def image_to_bytes(image) -> memoryview:
    """[3, H, W] float render -> the protocol's raw HWC byte buffer
    (train.py:59-60 semantics)."""
    arr = np.asarray(image)
    arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8).transpose(1, 2, 0)
    return memoryview(np.ascontiguousarray(arr))


def pump_stacked(render_train_fn, stream, source_path: str = "") -> None:
    """One stacked-trainer viewer tick (reference handleViewer,
    train_stacked_transformer.py:284-320). The stacked protocol REPURPOSES two
    request slots: ``shs_python`` carries show_pred and ``keep_alive`` carries
    show_prompt.

    ``render_train_fn(cam, smod, show_prompt, show_pred) -> image | None`` —
    teacher-forced composite served while training continues (train=True).

    ``stream`` — None, or an object with ``.start() -> carry``,
    ``.step(carry) -> carry``, ``.render(carry, cam, smod, show_prompt,
    show_pred) -> image`` and ``.n_steps``. When the viewer PAUSES training
    (train=False), the decode runs live: each step's partial reconstruction is
    rendered and sent immediately, re-receiving between steps so the viewer
    can interrupt (the reference's per-step send/receive loop, :300-314).

    Deviation from the reference: its handleViewer only exits via exception;
    we return to training as soon as the viewer requests train=True, matching
    the base-trainer pump semantics."""
    global conn
    if conn is None:
        try_connect()
    while conn is not None:
        try:
            net_image_bytes = None
            cam, do_training, show_pred, _, show_prompt, smod = receive()
            if cam is not None and (do_training or stream is None or stream.n_steps == 0):
                image = render_train_fn(cam, smod, show_prompt, show_pred)
                if image is not None:
                    net_image_bytes = image_to_bytes(image)
            elif cam is not None:
                carry = stream.start()
                for _ in range(stream.n_steps):
                    carry = stream.step(carry)
                    image = stream.render(carry, cam, smod, show_prompt, show_pred)
                    net_image_bytes = image_to_bytes(image)
                    send(net_image_bytes, source_path)
                    cam, do_training, show_pred, _, show_prompt, smod = receive()
                    if cam is None or do_training:
                        break
            send(net_image_bytes, source_path)
            if do_training:
                break
        except Exception:
            conn = None


def pump(render_fn, source_path: str = "", keep_alive_default: bool = False) -> None:
    """One viewer service tick, matching the trainer pump (train.py:52-65):
    accept a pending connection, then serve requests until the client stops or
    errors. ``render_fn(custom_cam, scaling_modifier) -> [3,H,W] image or None``.
    """
    global conn
    if conn is None:
        try_connect()
    while conn is not None:
        try:
            net_image_bytes = None
            custom_cam, do_training, _, _, keep_alive, scaling_modifier = receive()
            if custom_cam is not None:
                image = render_fn(custom_cam, scaling_modifier)
                if image is not None:
                    net_image_bytes = image_to_bytes(image)
            send(net_image_bytes, source_path)
            if do_training or not keep_alive:
                break
        except Exception:
            conn = None
