"""ctypes bindings for the native IO runtime (native/libgt_native.so).

The native tier: COLMAP binary parsers, float32 PLY vertex tables, and a
thread-pool JPEG/PNG decoder with bilinear resize — C++ replacements for the
reference's pure-Python struct loops (``/root/reference/scene/colmap_loader.py``)
and single-threaded PIL loading. All callers fall back to the Python
implementations when the library is absent; build it with ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_CANDIDATES = [
    os.environ.get("GT_NATIVE_LIB"),
    os.path.join(_REPO, "native", "libgt_native.so"),
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "libgt_native.so"),
]

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    for cand in _CANDIDATES:
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
            except OSError:
                continue
            _bind(lib)
            _lib = lib
            break
    return _lib


def _bind(lib):
    c = ctypes
    lib.gt_free.argtypes = [c.c_void_p]
    lib.gt_read_points3d_bin.argtypes = [
        c.c_char_p, c.POINTER(c.POINTER(c.c_double)), c.POINTER(c.POINTER(c.c_uint8)),
        c.POINTER(c.POINTER(c.c_double)), c.POINTER(c.c_uint64),
    ]
    lib.gt_read_images_bin.argtypes = [
        c.c_char_p, c.POINTER(c.POINTER(c.c_int32)), c.POINTER(c.POINTER(c.c_double)),
        c.POINTER(c.POINTER(c.c_double)), c.POINTER(c.POINTER(c.c_int32)),
        c.POINTER(c.c_char_p), c.POINTER(c.c_uint64), c.POINTER(c.c_uint64),
    ]
    lib.gt_read_ply_f32.argtypes = [
        c.c_char_p, c.POINTER(c.POINTER(c.c_float)), c.POINTER(c.c_char_p),
        c.POINTER(c.c_uint64), c.POINTER(c.c_uint32),
    ]
    lib.gt_write_ply_f32.argtypes = [c.c_char_p, c.c_char_p, c.POINTER(c.c_float), c.c_uint64, c.c_uint32]
    lib.gt_load_images.argtypes = [
        c.c_char_p, c.c_int, c.c_int, c.c_int, c.c_int,
        c.POINTER(c.c_uint8), c.POINTER(c.c_int32),
    ]
    lib.gt_image_size.argtypes = [c.c_char_p, c.POINTER(c.c_int), c.POINTER(c.c_int)]


def available() -> bool:
    return _load() is not None


def build(verbose: bool = False) -> bool:
    """Compile the library in-tree (requires g++, libjpeg-dev, libpng-dev)."""
    global _tried
    r = subprocess.run(
        ["make", "-C", os.path.join(_REPO, "native")],
        capture_output=not verbose,
    )
    _tried = False
    return r.returncode == 0 and available()


def _take(ptr, shape, dtype, lib):
    """Copy a malloc'd C buffer into numpy and free it."""
    n = int(np.prod(shape))
    ctype = np.ctypeslib.as_array(ptr, shape=(n,))
    out = np.array(ctype, dtype=dtype, copy=True).reshape(shape)
    lib.gt_free(ctypes.cast(ptr, ctypes.c_void_p))
    return out


def read_points3d_bin(path: str):
    """COLMAP points3D.bin -> (xyz [N,3] f64, rgb [N,3] u8, err [N] f64)."""
    lib = _load()
    assert lib is not None
    xyz_p = ctypes.POINTER(ctypes.c_double)()
    rgb_p = ctypes.POINTER(ctypes.c_uint8)()
    err_p = ctypes.POINTER(ctypes.c_double)()
    n = ctypes.c_uint64()
    rc = lib.gt_read_points3d_bin(path.encode(), xyz_p, rgb_p, err_p, n)
    if rc != 0:
        raise IOError(f"gt_read_points3d_bin({path}) failed: {rc}")
    n = int(n.value)
    return (
        _take(xyz_p, (n, 3), np.float64, lib),
        _take(rgb_p, (n, 3), np.uint8, lib),
        _take(err_p, (n,), np.float64, lib),
    )


def read_images_bin(path: str):
    """COLMAP images.bin -> (ids [N], qvecs [N,4], tvecs [N,3], cam_ids [N],
    names list[str])."""
    lib = _load()
    assert lib is not None
    ids_p = ctypes.POINTER(ctypes.c_int32)()
    q_p = ctypes.POINTER(ctypes.c_double)()
    t_p = ctypes.POINTER(ctypes.c_double)()
    cam_p = ctypes.POINTER(ctypes.c_int32)()
    names_p = ctypes.c_char_p()
    names_len = ctypes.c_uint64()
    n = ctypes.c_uint64()
    rc = lib.gt_read_images_bin(path.encode(), ids_p, q_p, t_p, cam_p, names_p, names_len, n)
    if rc != 0:
        raise IOError(f"gt_read_images_bin({path}) failed: {rc}")
    n = int(n.value)
    names = names_p.value.decode().split("\n")[:n]
    lib.gt_free(ctypes.cast(names_p, ctypes.c_void_p))
    return (
        _take(ids_p, (n,), np.int32, lib),
        _take(q_p, (n, 4), np.float64, lib),
        _take(t_p, (n, 3), np.float64, lib),
        _take(cam_p, (n,), np.int32, lib),
        names,
    )


def read_ply_f32(path: str) -> Tuple[np.ndarray, List[str]]:
    """float32 vertex PLY -> (data [rows, cols] f32, property names)."""
    lib = _load()
    assert lib is not None
    data_p = ctypes.POINTER(ctypes.c_float)()
    names_p = ctypes.c_char_p()
    rows = ctypes.c_uint64()
    cols = ctypes.c_uint32()
    rc = lib.gt_read_ply_f32(path.encode(), data_p, names_p, rows, cols)
    if rc != 0:
        raise IOError(f"gt_read_ply_f32({path}) failed: {rc}")
    names = names_p.value.decode().rstrip("\n").split("\n")
    lib.gt_free(ctypes.cast(names_p, ctypes.c_void_p))
    return _take(data_p, (int(rows.value), int(cols.value)), np.float32, lib), names


def write_ply_f32(path: str, names: List[str], data: np.ndarray) -> None:
    lib = _load()
    assert lib is not None
    data = np.ascontiguousarray(data, np.float32)
    rows, cols = data.shape
    assert len(names) == cols
    rc = lib.gt_write_ply_f32(
        path.encode(), "\n".join(names).encode(),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rows, cols,
    )
    if rc != 0:
        raise IOError(f"gt_write_ply_f32({path}) failed: {rc}")


def image_size(path: str) -> Tuple[int, int]:
    lib = _load()
    assert lib is not None
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.gt_image_size(path.encode(), w, h)
    if rc != 0:
        raise IOError(f"gt_image_size({path}) failed: {rc}")
    return int(w.value), int(h.value)


def load_images(paths: List[str], width: int, height: int, threads: int = 0) -> np.ndarray:
    """Decode + resize a batch of JPEG/PNG files on a thread pool ->
    [N, height, width, 3] uint8."""
    lib = _load()
    assert lib is not None
    n = len(paths)
    out = np.empty((n, height, width, 3), np.uint8)
    status = np.zeros(n, np.int32)
    rc = lib.gt_load_images(
        "\n".join(paths).encode(), n, width, height, threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0 or np.any(status != 0):
        bad = [paths[i] for i in np.nonzero(status)[0]]
        raise IOError(f"gt_load_images failed (rc={rc}, bad={bad[:3]})")
    return out
