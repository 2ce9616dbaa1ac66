import os

import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.scene.gaussians import GaussianScene
from gaussian_transformer_tpu.scene.ply import (
    fetch_point_cloud,
    read_ply_vertex_table,
    store_point_cloud,
    write_ply_vertex_table,
)
from gaussian_transformer_tpu.scene import colmap
from gaussian_transformer_tpu.scene.cameras import Camera
from gaussian_transformer_tpu.utils.graphics import BasicPointCloud

REF_SPARSE = "/root/reference/table_ds/sparse/0"


class TestPlyIO:
    def test_float_table_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.ply")
        rng = np.random.RandomState(0)
        attrs = rng.randn(17, 4).astype(np.float32)
        write_ply_vertex_table(path, ["a", "b", "c", "d"], attrs)
        data = read_ply_vertex_table(path)
        for i, k in enumerate("abcd"):
            np.testing.assert_array_equal(data[k], attrs[:, i])

    def test_point_cloud_roundtrip(self, tmp_path):
        path = str(tmp_path / "pc.ply")
        rng = np.random.RandomState(1)
        xyz = rng.randn(50, 3).astype(np.float32)
        rgb = (rng.rand(50, 3) * 255).astype(np.uint8)
        store_point_cloud(path, xyz, rgb)
        pcd = fetch_point_cloud(path)
        np.testing.assert_allclose(pcd.points, xyz, rtol=1e-6)
        np.testing.assert_allclose(pcd.colors * 255, rgb, atol=0.5)

    @pytest.mark.skipif(not os.path.exists(f"{REF_SPARSE}/points3D.ply"), reason="reference data absent")
    def test_reads_reference_points3d(self):
        pcd = fetch_point_cloud(f"{REF_SPARSE}/points3D.ply")
        assert pcd.points.shape == (17618, 3)
        assert pcd.colors.min() >= 0 and pcd.colors.max() <= 1


class TestColmap:
    @pytest.mark.skipif(not os.path.exists(f"{REF_SPARSE}/cameras.bin"), reason="reference data absent")
    def test_reads_reference_cameras_bin(self):
        cams = colmap.read_intrinsics_binary(f"{REF_SPARSE}/cameras.bin")
        assert len(cams) >= 1
        cam = next(iter(cams.values()))
        assert cam.model in ("SIMPLE_PINHOLE", "PINHOLE", "SIMPLE_RADIAL", "OPENCV")
        assert cam.width > 0 and cam.height > 0

    @pytest.mark.skipif(not os.path.exists(f"{REF_SPARSE}/points3D.bin"), reason="reference data absent")
    def test_points3d_bin_matches_ply(self):
        xyz, rgb, err = colmap.read_points3D_binary(f"{REF_SPARSE}/points3D.bin")
        pcd = fetch_point_cloud(f"{REF_SPARSE}/points3D.ply")
        assert xyz.shape == pcd.points.shape
        np.testing.assert_allclose(np.sort(xyz[:, 0]), np.sort(pcd.points[:, 0].astype(np.float64)), atol=1e-5)

    def test_qvec_rotmat_roundtrip(self):
        rng = np.random.RandomState(0)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = colmap.qvec2rotmat(q)
        np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-6)

    def test_text_parsers(self, tmp_path):
        (tmp_path / "cameras.txt").write_text("# comment\n1 PINHOLE 640 480 500.0 500.0 320 240\n")
        cams = colmap.read_intrinsics_text(str(tmp_path / "cameras.txt"))
        assert cams[1].model == "PINHOLE" and cams[1].width == 640

        (tmp_path / "images.txt").write_text(
            "# comment\n1 0.9 0.1 0.2 0.3 1.0 2.0 3.0 1 img.png\n1.0 2.0 5 3.0 4.0 -1\n"
        )
        imgs = colmap.read_extrinsics_text(str(tmp_path / "images.txt"))
        assert imgs[1].name == "img.png"
        np.testing.assert_allclose(imgs[1].tvec, [1, 2, 3])
        assert imgs[1].point3D_ids.tolist() == [5, -1]


class TestGaussianScene:
    def _pcd(self, n=100, seed=0):
        rng = np.random.RandomState(seed)
        return BasicPointCloud(
            points=rng.randn(n, 3).astype(np.float32),
            colors=rng.rand(n, 3).astype(np.float32),
            normals=np.zeros((n, 3), np.float32),
        )

    def test_from_pcd_shapes_and_activations(self):
        scene = GaussianScene.from_pcd(self._pcd(64), max_sh_degree=3, capacity=100)
        assert scene.capacity == 100
        assert int(scene.num_alive) == 64
        assert scene.features_rest.shape == (100, 15, 3)
        # Opacity activation: alive slots sigmoid(logit(0.1)) = 0.1, dead slots 0.
        op = np.asarray(scene.get_opacity)
        np.testing.assert_allclose(op[:64], 0.1, rtol=1e-5)
        np.testing.assert_allclose(op[64:], 0.0, atol=1e-8)
        # Rotation normalizes to unit quaternions.
        np.testing.assert_allclose(np.linalg.norm(np.asarray(scene.get_rotation), axis=-1), 1.0, rtol=1e-6)

    def test_covariance_packed_psd(self):
        scene = GaussianScene.from_pcd(self._pcd(16), max_sh_degree=1)
        cov = np.asarray(scene.get_covariance())
        assert cov.shape == (16, 6)
        # Diagonals (xx, yy, zz) positive.
        assert (cov[:, [0, 3, 5]] > 0).all()

    def test_ply_roundtrip(self, tmp_path):
        scene = GaussianScene.from_pcd(self._pcd(32, seed=3), max_sh_degree=2, capacity=50)
        path = str(tmp_path / "ckpt.ply")
        scene.save_ply(path)
        loaded = GaussianScene.load_ply(path, max_sh_degree=2, capacity=50)
        assert int(loaded.num_alive) == 32
        np.testing.assert_allclose(np.asarray(loaded.xyz)[:32], np.asarray(scene.xyz)[:32], rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(loaded.features_rest)[:32], np.asarray(scene.features_rest)[:32], rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(loaded.opacity)[:32], np.asarray(scene.opacity)[:32], rtol=1e-6)
        assert loaded.active_sh_degree == 2  # load_ply sets active to max

    def test_ply_field_order_matches_reference(self, tmp_path):
        """The reference's construct_list_of_attributes order (gaussian_model.py:177-189)."""
        scene = GaussianScene.from_pcd(self._pcd(4), max_sh_degree=1)
        names = scene.ply_attribute_names()
        assert names[:6] == ["x", "y", "z", "nx", "ny", "nz"]
        assert names[6:9] == ["f_dc_0", "f_dc_1", "f_dc_2"]
        assert names[9:18] == [f"f_rest_{i}" for i in range(9)]
        assert names[18] == "opacity"
        assert names[19:22] == ["scale_0", "scale_1", "scale_2"]
        assert names[22:26] == ["rot_0", "rot_1", "rot_2", "rot_3"]

    def test_compact(self):
        scene = GaussianScene.from_pcd(self._pcd(40), max_sh_degree=1, capacity=64)
        # Kill every other gaussian.
        alive = np.asarray(scene.alive).copy()
        alive[::2] = False
        scene = scene.replace(alive=jnp.asarray(alive))
        packed = scene.compact(capacity=32)
        assert packed.capacity == 32
        assert int(packed.num_alive) == 20
        surviving = np.asarray(scene.xyz)[np.asarray(scene.alive)]
        np.testing.assert_allclose(np.asarray(packed.xyz)[:20], surviving, rtol=1e-6)

    def test_oneup_sh_degree(self):
        scene = GaussianScene.from_pcd(self._pcd(4), max_sh_degree=2)
        assert scene.active_sh_degree == 0
        scene = scene.oneup_sh_degree()
        assert scene.active_sh_degree == 1
        scene = scene.oneup_sh_degree().oneup_sh_degree()
        assert scene.active_sh_degree == 2  # capped at max


class TestCamera:
    def test_camera_center_matches_inverse(self):
        rng = np.random.RandomState(0)
        from gaussian_transformer_tpu.scene.colmap import qvec2rotmat

        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = np.transpose(qvec2rotmat(q))
        T = rng.randn(3)
        img = rng.rand(3, 24, 32).astype(np.float32)
        cam = Camera.create(0, R, T, 1.2, 0.9, img, None, "test", 0)
        assert cam.image_width == 32 and cam.image_height == 24
        # camera_center = -R_w2c^T t
        w2c = np.asarray(cam.world_view_transform).T
        expected_center = -w2c[:3, :3].T @ w2c[:3, 3]
        np.testing.assert_allclose(np.asarray(cam.camera_center), expected_center, atol=1e-5)

    def test_full_proj_composition(self):
        rng = np.random.RandomState(1)
        img = rng.rand(3, 16, 16).astype(np.float32)
        cam = Camera.create(0, np.eye(3), np.zeros(3), 1.0, 1.0, img, None, "t", 0)
        wvt = np.asarray(cam.world_view_transform)
        fpt = np.asarray(cam.full_proj_transform)
        # A point ahead of the camera projects inside the frustum.
        p = np.array([0.0, 0.0, 5.0, 1.0])
        clip = p @ fpt
        ndc = clip[:3] / clip[3]
        assert abs(ndc[0]) < 1 and abs(ndc[1]) < 1
        # Composition property: full = view @ proj (transposed convention).
        cam_p = p @ wvt
        assert cam_p[2] > 0
