"""Renderer tests: tiled pipeline vs brute-force golden, analytic checks,
occlusion ordering, and finite-difference gradients (SURVEY.md §4 test plan)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.render import RenderConfig, render, render_naive
from gaussian_transformer_tpu.scene.cameras import Camera
from gaussian_transformer_tpu.scene.gaussians import GaussianScene
from gaussian_transformer_tpu.utils.general import inverse_sigmoid


def make_camera(width=64, height=48, z=5.0, fov=60.0):
    return Camera.create(
        colmap_id=0,
        R=np.eye(3),
        T=np.array([0.0, 0.0, z]),
        fovx=math.radians(fov),
        fovy=math.radians(fov * height / width),
        image=None,
        gt_alpha_mask=None,
        image_name="test",
        uid=0,
        width=width,
        height=height,
    )


def make_scene(n, seed=0, capacity=None, spread=1.5, max_sh_degree=1):
    rng = np.random.RandomState(seed)
    capacity = capacity or n
    scene = GaussianScene.empty(capacity, max_sh_degree)
    rest = (max_sh_degree + 1) ** 2 - 1
    return scene.replace(
        xyz=scene.xyz.at[:n].set(rng.uniform(-spread, spread, (n, 3)).astype(np.float32)),
        features_dc=scene.features_dc.at[:n].set(rng.randn(n, 1, 3).astype(np.float32) * 0.3),
        features_rest=scene.features_rest.at[:n].set(
            rng.randn(n, rest, 3).astype(np.float32) * 0.05
        ),
        scaling=scene.scaling.at[:n].set(rng.uniform(-3.5, -1.5, (n, 3)).astype(np.float32)),
        rotation=scene.rotation.at[:n].set(rng.randn(n, 4).astype(np.float32)),
        opacity=scene.opacity.at[:n].set(rng.uniform(-2, 2, (n, 1)).astype(np.float32)),
        alive=scene.alive.at[:n].set(True),
        active_sh_degree=1,
    )


class TestAnalytic:
    def test_background_only(self):
        cam = make_camera()
        scene = GaussianScene.empty(8, 1)  # all dead
        bg = jnp.array([0.2, 0.4, 0.6])
        out = render(cam, scene, RenderConfig(max_per_tile=8), bg_color=bg)
        img = np.asarray(out["render"])
        assert img.shape == (3, 48, 64)
        np.testing.assert_allclose(img, np.broadcast_to(bg[:, None, None], img.shape), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["final_T"]), 1.0)

    def test_single_gaussian_center_alpha(self):
        """One isotropic Gaussian at the origin: center pixel alpha == opacity,
        color == SH DC conversion."""
        cam = make_camera(width=64, height=64, fov=60.0)
        scene = GaussianScene.empty(1, 0)
        opacity = 0.7
        scene = scene.replace(
            xyz=scene.xyz.at[0].set(jnp.zeros(3)),
            scaling=scene.scaling.at[0].set(jnp.log(0.3) * jnp.ones(3)),
            opacity=scene.opacity.at[0].set(inverse_sigmoid(jnp.full((1,), opacity))),
            features_dc=scene.features_dc.at[0, 0].set(jnp.array([1.0, 0.5, 0.25])),
            alive=scene.alive.at[0].set(True),
        )
        out = render(cam, scene, RenderConfig(max_per_tile=4), bg_color=jnp.zeros(3))
        img = np.asarray(out["render"])
        # Projected center: ndc 0 -> pixel (S-1)/2 = 31.5; sample the 4 center pixels.
        from gaussian_transformer_tpu.utils.sh import C0

        expected_rgb = np.array([1.0, 0.5, 0.25]) * C0 + 0.5
        center = img[:, 31:33, 31:33].mean(axis=(1, 2))
        # d=0.5px from center; conic tiny => alpha ~= opacity there.
        assert np.all(np.abs(center - expected_rgb * opacity) < 0.02)
        assert int(out["radii"][0]) > 0
        assert bool(out["visibility_filter"][0])

    def test_occlusion_order(self):
        """A near opaque red Gaussian must occlude a far green one regardless of
        slot order in the arrays."""
        from gaussian_transformer_tpu.utils.sh import rgb_to_sh

        cam = make_camera(width=32, height=32)
        for near_slot in (0, 1):
            scene = GaussianScene.empty(2, 0)
            z = jnp.array([0.0 if near_slot == 0 else 2.0, 2.0 if near_slot == 0 else 0.0])
            colors = jnp.array([[1.0, 0, 0], [0, 1.0, 0]]) if near_slot == 0 else jnp.array(
                [[0, 1.0, 0], [1.0, 0, 0]]
            )
            scene = scene.replace(
                xyz=scene.xyz.at[:, 2].set(z),
                scaling=jnp.full((2, 3), jnp.log(0.5)),
                opacity=jnp.full((2, 1), inverse_sigmoid(jnp.asarray(0.999))),
                features_dc=rgb_to_sh(colors)[:, None, :],
                alive=jnp.ones(2, bool),
            )
            out = render(cam, scene, RenderConfig(max_per_tile=4), bg_color=jnp.zeros(3))
            img = np.asarray(out["render"])
            c = img[:, 15:17, 15:17].mean(axis=(1, 2))
            assert c[0] > 0.9 and c[1] < 0.05, f"near_slot={near_slot}, center={c}"


class TestTiledVsNaive:
    @pytest.mark.parametrize("seed,n", [(0, 64), (1, 256), (2, 512)])
    def test_matches_brute_force(self, seed, n):
        cam = make_camera(width=80, height=48)
        scene = make_scene(n, seed=seed, capacity=n + 7)  # some dead slots
        bg = jnp.array([0.1, 0.2, 0.3])
        tiled = render(cam, scene, RenderConfig(max_per_tile=max(n + 7, 16)), bg_color=bg)
        naive = render_naive(cam, scene, bg_color=bg)
        assert int(tiled["overflow"]) == 0
        # atol 3e-5: the v5 stream kernel evaluates the EWA exponent as an
        # MXU quadratic-basis matmul (HIGHEST precision), whose association
        # order differs from the naive FMA chain by O(1e-5) after exp().
        np.testing.assert_allclose(
            np.asarray(tiled["render"]), np.asarray(naive["render"]), atol=3e-5
        )
        np.testing.assert_allclose(
            np.asarray(tiled["final_T"]), np.asarray(naive["final_T"]), atol=3e-5
        )

    def test_overflow_error_shrinks_with_cap(self):
        """The per-tile cap drops the FARTHEST Gaussians; the approximation
        error must shrink monotonically as the cap grows and vanish at full cap
        (exactness at full cap is covered by test_matches_brute_force)."""
        cam = make_camera(width=32, height=32)
        scene = make_scene(128, seed=3, spread=0.3)
        full = np.asarray(
            render(cam, scene, RenderConfig(max_per_tile=128), bg_color=jnp.zeros(3))["render"]
        )
        errs = []
        for cap in (32, 64, 96):
            out = render(cam, scene, RenderConfig(max_per_tile=cap), bg_color=jnp.zeros(3))
            errs.append(np.abs(full - np.asarray(out["render"])).max())
        assert errs[0] >= errs[1] >= errs[2]
        assert errs[2] < 0.1


class TestGradients:
    def test_grad_matches_finite_difference(self):
        cam = make_camera(width=32, height=32)
        scene = make_scene(16, seed=4, spread=0.8)
        bg = jnp.zeros(3)
        cfg = RenderConfig(max_per_tile=16)

        def loss_fn(xyz, opacity, scaling):
            s = scene.replace(xyz=xyz, opacity=opacity, scaling=scaling)
            out = render(cam, s, cfg, bg_color=bg)
            return jnp.sum(out["render"] ** 2)

        grads = jax.grad(loss_fn, argnums=(0, 1, 2))(scene.xyz, scene.opacity, scene.scaling)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)

        eps = 1e-3
        rng = np.random.RandomState(0)
        for argi, (name, base) in enumerate(
            [("xyz", scene.xyz), ("opacity", scene.opacity), ("scaling", scene.scaling)]
        ):
            flat = np.asarray(base).ravel()
            for _ in range(4):
                j = rng.randint(flat.size)
                args = [np.asarray(scene.xyz), np.asarray(scene.opacity), np.asarray(scene.scaling)]
                ap, am = [a.copy() for a in args], [a.copy() for a in args]
                ap[argi].ravel()[j] += eps
                am[argi].ravel()[j] -= eps
                fd = (float(loss_fn(*map(jnp.asarray, ap))) - float(loss_fn(*map(jnp.asarray, am)))) / (
                    2 * eps
                )
                ad = float(np.asarray(grads[argi]).ravel()[j])
                assert abs(fd - ad) < 2e-2 + 0.05 * abs(fd), f"{name}[{j}]: fd={fd} ad={ad}"

    def test_screenspace_offset_grad(self):
        """Viewspace-point gradients (densification signal) flow through the
        explicit offset argument and are nonzero for visible Gaussians."""
        cam = make_camera(width=32, height=32)
        scene = make_scene(8, seed=5, spread=0.5)
        cfg = RenderConfig(max_per_tile=8)

        def loss_fn(offset):
            out = render(cam, scene, cfg, bg_color=jnp.zeros(3), screenspace_offset=offset)
            return jnp.sum((out["render"] - 0.5) ** 2)

        g = jax.grad(loss_fn)(jnp.zeros((scene.capacity, 2)))
        out = render(cam, scene, cfg, bg_color=jnp.zeros(3))
        vis = np.asarray(out["visibility_filter"])
        gn = np.linalg.norm(np.asarray(g), axis=1)
        assert np.all(np.isfinite(gn))
        assert gn[vis].max() > 0.0


class TestTileCull:
    """Exact-semantics tile culling (tiles._tile_cull_dist2): culled
    instances can never reach the kernel's 1/255 alpha skip floor, so the
    image and gradients must match the uncalled binning to float-reassociation
    noise while the padded stream shrinks."""

    def test_cull_is_exact_and_shrinks(self):
        cam = make_camera(width=160, height=96, z=3.0)
        scene = make_scene(300, seed=3)
        # widen splats so bounding boxes cover many tiles the ellipse misses
        scene = scene.replace(scaling=scene.scaling + 0.7)
        bg = jnp.array([0.05, 0.1, 0.15])
        budgets = dict(max_instances=131072, max_stream=262144)
        cfg_on = RenderConfig(**budgets)
        cfg_off = RenderConfig(tile_cull=False, **budgets)
        on = render(cam, scene, cfg_on, bg_color=bg)
        off = render(cam, scene, cfg_off, bg_color=bg)
        assert int(on["overflow"]) == 0 and int(off["overflow"]) == 0
        np.testing.assert_allclose(
            np.asarray(on["render"]), np.asarray(off["render"]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(on["final_T"]), np.asarray(off["final_T"]), atol=1e-6
        )
        assert int(on["n_padded"]) < int(off["n_padded"])

        def loss(xyz, cfg):
            out = render(cam, scene.replace(xyz=xyz), cfg, bg_color=bg)
            return jnp.sum(out["render"] ** 2)

        g_on = np.asarray(jax.grad(loss)(scene.get_xyz, cfg_on))
        g_off = np.asarray(jax.grad(loss)(scene.get_xyz, cfg_off))
        scale = np.abs(g_off).max() + 1e-8
        np.testing.assert_allclose(g_on, g_off, atol=2e-5 * scale)


class TestTuneConfig:
    """Budget tuning policy (render.tune_config): scale-adaptive headroom and
    the worst-case-padding cap on the stream budget."""

    def test_headroom_is_scale_adaptive(self):
        from gaussian_transformer_tpu.render import tune_config

        small = tune_config(RenderConfig(), {"n_instances": 100_000,
                                             "n_padded": 120_000, "n_tiles": 8160})
        big = tune_config(RenderConfig(), {"n_instances": 2_000_000,
                                           "n_padded": 2_400_000, "n_tiles": 8160})
        # 1.5x margin below 512k measured instances, 1.25x above (both
        # bucketed to the 32k grain).
        assert small.max_instances >= int(100_000 * 1.5)
        assert small.max_instances < int(100_000 * 1.5) + 32768
        assert big.max_instances >= int(2_000_000 * 1.25)
        assert big.max_instances < int(2_000_000 * 1.25) + 32768

    def test_stream_budget_capped_by_worst_case_padding(self):
        from gaussian_transformer_tpu.render import _auto_chunk, tune_config

        # A probe rendered at huge auto budgets reports inflated padding;
        # the tuned stream budget must not exceed instances + tiles * chunk.
        cfg = tune_config(RenderConfig(), {"n_instances": 1_800_000,
                                           "n_padded": 5_100_000, "n_tiles": 8160})
        chunk = _auto_chunk(1_000_000, 8160, cfg)
        bound = cfg.max_instances + 8160 * chunk + 32768
        assert cfg.max_stream <= bound
        # And the budgets stay honest: an explicit headroom override wins.
        cfg2 = tune_config(RenderConfig(), {"n_instances": 100_000,
                                            "n_padded": 120_000, "n_tiles": 8160},
                           headroom=2.0)
        assert cfg2.max_instances >= 200_000
