import numpy as np
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.utils import sh as sh_utils
from gaussian_transformer_tpu.utils import graphics, general, image


class TestSH:
    def test_deg0_is_c0_weighted_dc(self):
        coeffs = np.random.RandomState(0).randn(5, 3, 1).astype(np.float32)
        dirs = np.random.RandomState(1).randn(5, 3).astype(np.float32)
        out = sh_utils.eval_sh(0, jnp.asarray(coeffs), jnp.asarray(dirs))
        np.testing.assert_allclose(out, sh_utils.C0 * coeffs[..., 0], rtol=1e-6)

    @pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
    def test_matches_basis_matmul(self, deg):
        rng = np.random.RandomState(deg)
        n_coeff = (deg + 1) ** 2
        coeffs = rng.randn(7, 3, n_coeff).astype(np.float32)
        dirs = rng.randn(7, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        direct = sh_utils.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs))
        basis = sh_utils.sh_basis(deg, jnp.asarray(dirs))  # [7, n_coeff]
        via_basis = jnp.einsum("ncb,nb->nc", jnp.asarray(coeffs), basis)
        np.testing.assert_allclose(direct, via_basis, rtol=1e-4, atol=1e-5)

    def test_rgb_sh_roundtrip(self):
        rgb = np.random.RandomState(2).rand(10, 3).astype(np.float32)
        np.testing.assert_allclose(sh_utils.sh_to_rgb(sh_utils.rgb_to_sh(rgb)), rgb, rtol=1e-6)

    def test_deg4_sh_constant_function(self):
        # An SH expansion with only the DC term must be direction-independent.
        coeffs = np.zeros((1, 1, 25), dtype=np.float32)
        coeffs[..., 0] = 2.0
        for d in [(0, 0, 1.0), (1, 0, 0.0), (0.577, 0.577, 0.577)]:
            dirs = np.array([d], dtype=np.float32)
            dirs /= np.linalg.norm(dirs)
            out = sh_utils.eval_sh(4, jnp.asarray(coeffs), jnp.asarray(dirs))
            np.testing.assert_allclose(out, 2.0 * sh_utils.C0, rtol=1e-5)


class TestGraphics:
    def test_build_rotation_identity(self):
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        np.testing.assert_allclose(graphics.build_rotation(q)[0], np.eye(3), atol=1e-6)

    def test_build_rotation_orthonormal(self):
        q = jnp.asarray(np.random.RandomState(0).randn(20, 4).astype(np.float32))
        R = graphics.build_rotation(q)
        eye = jnp.eye(3)[None].repeat(20, axis=0)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), np.ones(20), atol=1e-5)

    def test_covariance_psd_and_eigvals(self):
        rng = np.random.RandomState(3)
        s = jnp.asarray(np.exp(rng.randn(10, 3)).astype(np.float32))
        q = jnp.asarray(rng.randn(10, 4).astype(np.float32))
        cov = graphics.build_covariance_3d(s, q)
        eigs = np.linalg.eigvalsh(np.asarray(cov))
        # Eigenvalues of R S^2 R^T are exactly the squared scales.
        np.testing.assert_allclose(np.sort(eigs, axis=-1), np.sort(np.asarray(s) ** 2, axis=-1), rtol=1e-3)

    def test_world2view_roundtrip(self):
        rng = np.random.RandomState(4)
        q = rng.randn(4)
        R_wc = np.asarray(graphics.build_rotation(jnp.asarray(q[None])))[0]
        t = rng.randn(3)
        # Reference convention: R passed in is the TRANSPOSED w2c rotation
        # (i.e. the c2w rotation), so W[:3,:3] == R.T.
        W = graphics.get_world2view(R_wc.T, t)
        pt_world = rng.randn(3)
        pt_cam = W[:3, :3] @ pt_world + W[:3, 3]
        np.testing.assert_allclose(pt_cam, R_wc @ pt_world + t, atol=1e-5)

    def test_fov_focal_roundtrip(self):
        fov = 1.1
        np.testing.assert_allclose(graphics.focal2fov(graphics.fov2focal(fov, 640), 640), fov, rtol=1e-6)

    def test_projection_ndc_bounds(self):
        znear, zfar, fovx, fovy = 0.01, 100.0, 1.2, 0.9
        P = graphics.get_projection_matrix(znear, zfar, fovx, fovy)
        # A point on the near plane straight ahead maps to z_ndc ~ 0 after divide.
        p = P @ np.array([0, 0, znear, 1.0])
        np.testing.assert_allclose(p[2] / p[3], 0.0, atol=1e-5)
        p = P @ np.array([0, 0, zfar, 1.0])
        np.testing.assert_allclose(p[2] / p[3], 1.0, atol=1e-4)


class TestGeneral:
    def test_inverse_sigmoid(self):
        x = jnp.asarray([0.1, 0.5, 0.9])
        np.testing.assert_allclose(1 / (1 + np.exp(-np.asarray(general.inverse_sigmoid(x)))), x, rtol=1e-5)

    def test_expon_lr_endpoints(self):
        f = general.get_expon_lr_func(1e-2, 1e-4, max_steps=100)
        np.testing.assert_allclose(float(f(0)), 1e-2, rtol=1e-5)
        np.testing.assert_allclose(float(f(100)), 1e-4, rtol=1e-5)
        np.testing.assert_allclose(float(f(50)), 1e-3, rtol=1e-4)  # log-linear midpoint

    def test_expon_lr_delay(self):
        f = general.get_expon_lr_func(1e-2, 1e-4, lr_delay_steps=10, lr_delay_mult=0.1, max_steps=100)
        np.testing.assert_allclose(float(f(0)), 1e-3, rtol=1e-4)  # scaled by delay_mult at step 0

    def test_psnr_known_value(self):
        a = jnp.zeros((1, 3, 8, 8))
        b = jnp.full((1, 3, 8, 8), 0.1)
        np.testing.assert_allclose(float(image.psnr(a, b)[0, 0]), 20.0, rtol=1e-5)
