"""Native IO runtime tests: C++ parsers vs the Python implementations,
threaded image decode, and PLY roundtrips. Builds the library if needed;
skips when no toolchain is available."""

import os
import struct

import numpy as np
import pytest

from gaussian_transformer_tpu import native

if not native.available():
    native.build()

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain?)"
)

REF_SPARSE = "/root/reference/table_ds/sparse/0"


def _write_points3d_bin(path, n, rng):
    xyz = rng.randn(n, 3)
    rgb = rng.randint(0, 256, (n, 3)).astype(np.uint8)
    err = rng.rand(n)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            track_len = int(rng.randint(0, 4))
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<ddd", *xyz[i]))
            f.write(struct.pack("<BBB", *rgb[i]))
            f.write(struct.pack("<d", err[i]))
            f.write(struct.pack("<Q", track_len))
            f.write(b"\x00" * (8 * track_len))
    return xyz, rgb, err


def _write_images_bin(path, n, rng):
    recs = []
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            q = rng.randn(4)
            t = rng.randn(3)
            name = f"img_{i:03d}.jpg"
            f.write(struct.pack("<I", i + 1))
            f.write(struct.pack("<dddd", *q))
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<I", (i % 2) + 1))
            f.write(name.encode() + b"\x00")
            npts = int(rng.randint(0, 3))
            f.write(struct.pack("<Q", npts))
            f.write(b"\x00" * (24 * npts))
            recs.append((i + 1, q, t, (i % 2) + 1, name))
    return recs


class TestColmapNative:
    def test_points3d_matches_python(self, tmp_path):
        from gaussian_transformer_tpu.scene import colmap

        path = str(tmp_path / "points3D.bin")
        xyz, rgb, err = _write_points3d_bin(path, 37, np.random.RandomState(0))
        nx, nr, ne = native.read_points3d_bin(path)
        np.testing.assert_allclose(nx, xyz)
        np.testing.assert_array_equal(nr, rgb)
        np.testing.assert_allclose(ne, err)
        # And the integrated reader agrees.
        px, pr, pe = colmap.read_points3D_binary(path)
        np.testing.assert_allclose(px, xyz)

    def test_images_matches_python(self, tmp_path):
        from gaussian_transformer_tpu.scene import colmap

        path = str(tmp_path / "images.bin")
        recs = _write_images_bin(path, 9, np.random.RandomState(1))
        images = colmap.read_extrinsics_binary(path)
        assert len(images) == 9
        for (iid, q, t, cid, name) in recs:
            im = images[iid]
            np.testing.assert_allclose(im.qvec, q)
            np.testing.assert_allclose(im.tvec, t)
            assert im.camera_id == cid and im.name == name

    @pytest.mark.skipif(
        not os.path.exists(f"{REF_SPARSE}/points3D.bin"), reason="reference data absent"
    )
    def test_reference_points3d(self):
        xyz, rgb, err = native.read_points3d_bin(f"{REF_SPARSE}/points3D.bin")
        assert xyz.shape == (17618, 3)


class TestPlyNative:
    def test_float_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.ply")
        rng = np.random.RandomState(2)
        data = rng.randn(123, 7).astype(np.float32)
        names = [f"p{i}" for i in range(7)]
        native.write_ply_f32(path, names, data)
        back, back_names = native.read_ply_f32(path)
        assert back_names == names
        np.testing.assert_array_equal(back, data)

    def test_python_reader_reads_native_output(self, tmp_path):
        from gaussian_transformer_tpu.scene.ply import read_ply_vertex_table

        path = str(tmp_path / "t2.ply")
        data = np.arange(12, dtype=np.float32).reshape(4, 3)
        native.write_ply_f32(path, ["x", "y", "z"], data)
        table = read_ply_vertex_table(path)
        np.testing.assert_array_equal(table["x"], data[:, 0])

    def test_gaussian_scene_ply_roundtrip_via_native(self, tmp_path):
        from tests.test_render import make_scene
        from gaussian_transformer_tpu.scene.gaussians import GaussianScene

        scene = make_scene(20, seed=3)
        path = str(tmp_path / "pc.ply")
        scene.save_ply(path)
        back = GaussianScene.load_ply(path, max_sh_degree=1)
        np.testing.assert_allclose(np.asarray(back.xyz), np.asarray(scene.xyz), atol=1e-6)


class TestImagesNative:
    def test_decode_and_resize(self, tmp_path):
        from PIL import Image

        rng = np.random.RandomState(4)
        paths = []
        arrs = []
        grad = np.linspace(0, 255, 40, dtype=np.uint8)
        smooth = np.broadcast_to(grad[None, :, None], (32, 40, 3)).copy()
        for i, ext in enumerate(["png", "jpg", "png"]):
            # JPEG is lossy: random noise compresses awfully, a gradient doesn't.
            arr = smooth if ext == "jpg" else (rng.rand(32, 40, 3) * 255).astype(np.uint8)
            p = str(tmp_path / f"im{i}.{ext}")
            Image.fromarray(arr).save(p, quality=98)
            paths.append(p)
            arrs.append(arr)

        for p, arr in zip(paths, arrs):
            assert native.image_size(p) == (40, 32)

        out = native.load_images(paths, 40, 32, threads=2)
        assert out.shape == (3, 32, 40, 3)
        # PNGs must roundtrip exactly; JPEG within compression noise.
        np.testing.assert_array_equal(out[0], arrs[0])
        np.testing.assert_array_equal(out[2], arrs[2])
        assert np.abs(out[1].astype(int) - arrs[1].astype(int)).mean() < 6

        half = native.load_images(paths, 20, 16)
        assert half.shape == (3, 16, 20, 3)

    def test_batch_decode_in_reader(self, tmp_path):
        from PIL import Image
        from gaussian_transformer_tpu.scene.dataset_readers import _batch_decode_images

        p = str(tmp_path / "a.png")
        arr = (np.random.RandomState(5).rand(8, 9, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(p)
        out = _batch_decode_images([p])
        assert out is not None
        np.testing.assert_array_equal(np.asarray(out[p]), arr)
