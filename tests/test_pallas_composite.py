"""Pallas compositing kernel vs the XLA composite: forward image equality and
custom-VJP gradient equality (interpret mode on the CPU test mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.render import RenderConfig, render, render_naive

from tests.test_render import make_camera, make_scene


# use_stream=False: this file tests the [T, K]-table kernel, which shares the
# XLA fallback's per-tile K cap. The stream kernel (uncapped) is covered by
# test_stream.py.
XLA_CFG = RenderConfig(max_per_tile=64, use_pallas=False)
PL_CFG = RenderConfig(max_per_tile=64, use_pallas=True, use_stream=False)


class TestPallasForward:
    @pytest.mark.parametrize("seed,n", [(0, 64), (1, 256)])
    def test_matches_xla_composite(self, seed, n):
        cam = make_camera(width=80, height=48)
        scene = make_scene(n, seed=seed, capacity=n + 5)
        bg = jnp.array([0.15, 0.25, 0.35])
        a = render(cam, scene, XLA_CFG, bg_color=bg)
        b = render(cam, scene, PL_CFG, bg_color=bg)
        np.testing.assert_allclose(
            np.asarray(b["render"]), np.asarray(a["render"]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(b["final_T"]), np.asarray(a["final_T"]), atol=2e-5
        )

    def test_matches_naive_golden(self):
        cam = make_camera(width=64, height=32)
        scene = make_scene(128, seed=2)
        bg = jnp.zeros(3)
        a = render_naive(cam, scene, bg_color=bg)
        b = render(cam, scene, RenderConfig(max_per_tile=160, use_pallas=True, use_stream=False), bg_color=bg)
        np.testing.assert_allclose(
            np.asarray(b["render"]), np.asarray(a["render"]), atol=2e-5
        )

    def test_saturation_early_exit(self):
        """Opaque stack saturates: final_T ~ 0, later gaussians excluded —
        result must still match the XLA path exactly."""
        from gaussian_transformer_tpu.utils.general import inverse_sigmoid

        cam = make_camera(width=32, height=32)
        scene = make_scene(96, seed=3, spread=0.2)
        scene = scene.replace(
            opacity=jnp.full_like(scene.opacity, inverse_sigmoid(jnp.asarray(0.97)))
        )
        a = render(cam, scene, RenderConfig(max_per_tile=96, use_pallas=False), bg_color=jnp.ones(3))
        b = render(cam, scene, RenderConfig(max_per_tile=96, use_pallas=True, use_stream=False), bg_color=jnp.ones(3))
        np.testing.assert_allclose(np.asarray(b["render"]), np.asarray(a["render"]), atol=2e-5)
        assert float(np.asarray(b["final_T"]).min()) < 1e-3


class TestPallasGradients:
    def _grads(self, cfg, scene, cam, bg):
        def loss_fn(xyz, opacity, scaling, fdc, offset):
            s = scene.replace(xyz=xyz, opacity=opacity, scaling=scaling, features_dc=fdc)
            out = render(cam, s, cfg, bg_color=bg, screenspace_offset=offset)
            # Touch both outputs so dT cotangents flow too.
            return jnp.sum(out["render"] ** 2) + 0.1 * jnp.sum(out["final_T"])

        args = (
            scene.xyz,
            scene.opacity,
            scene.scaling,
            scene.features_dc,
            jnp.zeros((scene.capacity, 2)),
        )
        return jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*args)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_grads_match_xla_ad(self, seed):
        cam = make_camera(width=48, height=32)
        scene = make_scene(96, seed=seed)
        bg = jnp.array([0.2, 0.1, 0.4])
        ga = self._grads(RenderConfig(max_per_tile=96, use_pallas=False), scene, cam, bg)
        gb = self._grads(RenderConfig(max_per_tile=96, use_pallas=True, use_stream=False), scene, cam, bg)
        names = ["xyz", "opacity", "scaling", "features_dc", "offset"]
        for name, a, b in zip(names, ga, gb):
            a, b = np.asarray(a), np.asarray(b)
            assert np.all(np.isfinite(b)), name
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=2e-4 * scale, err_msg=name)

    def test_grads_under_saturation(self):
        from gaussian_transformer_tpu.utils.general import inverse_sigmoid

        cam = make_camera(width=32, height=32)
        scene = make_scene(64, seed=4, spread=0.2)
        scene = scene.replace(
            opacity=jnp.full_like(scene.opacity, inverse_sigmoid(jnp.asarray(0.95)))
        )
        bg = jnp.zeros(3)
        ga = self._grads(RenderConfig(max_per_tile=64, use_pallas=False), scene, cam, bg)
        gb = self._grads(RenderConfig(max_per_tile=64, use_pallas=True, use_stream=False), scene, cam, bg)
        for a, b in zip(ga, gb):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=5e-4 * scale)
