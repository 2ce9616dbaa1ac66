"""Stream compositor (render/stream.py + tiles.bin_stream) correctness:
forward/gradient equivalence with the XLA composite and the naive golden,
layout invariants of the padded-CSR stream, saturation and budget-overflow
behavior. Runs in interpret mode on the CPU test mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.render import RenderConfig, render, render_naive
from gaussian_transformer_tpu.render.tiles import CHUNK, bin_stream, num_tiles

from tests.test_render import make_camera, make_scene


# The stream path has no per-tile cap; give the XLA reference a K large enough
# that it never truncates either.
XLA_CFG = RenderConfig(max_per_tile=512, use_pallas=False)
ST_CFG = RenderConfig(use_pallas=True, use_stream=True)


class TestStreamForward:
    @pytest.mark.parametrize("seed,n", [(0, 64), (1, 256)])
    def test_matches_xla_composite(self, seed, n):
        cam = make_camera(width=80, height=48)
        scene = make_scene(n, seed=seed, capacity=n + 5)
        bg = jnp.array([0.15, 0.25, 0.35])
        a = render(cam, scene, XLA_CFG, bg_color=bg)
        b = render(cam, scene, ST_CFG, bg_color=bg)
        assert int(np.asarray(b["overflow"])) == 0
        np.testing.assert_allclose(np.asarray(b["render"]), np.asarray(a["render"]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(b["final_T"]), np.asarray(a["final_T"]), atol=2e-5)

    def test_matches_naive_golden(self):
        cam = make_camera(width=64, height=32)
        scene = make_scene(128, seed=2)
        a = render_naive(cam, scene, bg_color=jnp.zeros(3))
        b = render(cam, scene, ST_CFG, bg_color=jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(b["render"]), np.asarray(a["render"]), atol=2e-5)

    def test_saturation_early_exit(self):
        from gaussian_transformer_tpu.utils.general import inverse_sigmoid

        cam = make_camera(width=32, height=32)
        scene = make_scene(96, seed=3, spread=0.2)
        scene = scene.replace(
            opacity=jnp.full_like(scene.opacity, inverse_sigmoid(jnp.asarray(0.97)))
        )
        a = render(cam, scene, XLA_CFG, bg_color=jnp.ones(3))
        b = render(cam, scene, ST_CFG, bg_color=jnp.ones(3))
        np.testing.assert_allclose(np.asarray(b["render"]), np.asarray(a["render"]), atol=2e-5)
        assert float(np.asarray(b["final_T"]).min()) < 1e-3

    def test_empty_scene_is_background(self):
        from gaussian_transformer_tpu.scene.gaussians import GaussianScene

        cam = make_camera(width=64, height=48)
        scene = GaussianScene.empty(8, 1)  # all dead -> zero covered tiles
        bg = jnp.array([0.2, 0.4, 0.6])
        out = render(cam, scene, ST_CFG, bg_color=bg)
        img = np.asarray(out["render"])
        np.testing.assert_allclose(img, np.broadcast_to(bg[:, None, None], img.shape), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["final_T"]), 1.0)

    @pytest.mark.parametrize("chunk", [64, 128])
    def test_chunk_size_equivalence(self, chunk):
        """Large scenes run bigger chunks (_auto_chunk keeps the SMEM-resident
        chunk->tile map bounded); any chunk size must produce the same image
        and gradients as the default."""
        cam = make_camera(width=80, height=48)
        scene = make_scene(192, seed=6, capacity=200)
        bg = jnp.array([0.1, 0.2, 0.3])
        big = RenderConfig(use_pallas=True, use_stream=True, chunk=chunk)

        def loss(cfg, off):
            out = render(cam, scene, cfg, bg_color=bg, screenspace_offset=off)
            return jnp.sum(out["render"] ** 2), out["render"]

        off = jnp.zeros((scene.capacity, 2))
        (la, ia), ga = jax.value_and_grad(lambda o: loss(ST_CFG, o), has_aux=True)(off)
        (lb, ib), gb = jax.value_and_grad(lambda o: loss(big, o), has_aux=True)(off)
        np.testing.assert_allclose(np.asarray(ib), np.asarray(ia), atol=2e-5)
        scale = np.abs(np.asarray(ga)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gb), np.asarray(ga), atol=2e-4 * scale)

    def test_budget_overflow_reported_and_finite(self):
        """A starved instance budget must report overflow and still produce a
        finite image (dropped tiles fall back to background)."""
        cam = make_camera(width=80, height=48)
        scene = make_scene(256, seed=1, capacity=261)
        tiny = RenderConfig(use_pallas=True, use_stream=True, max_instances=CHUNK * 4)
        out = render(cam, scene, tiny, bg_color=jnp.zeros(3))
        assert int(np.asarray(out["overflow"])) > 0
        assert np.all(np.isfinite(np.asarray(out["render"])))


class TestStreamLayout:
    def _binned(self, n=96, width=80, height=48, seed=0, budget=0):
        import math
        from gaussian_transformer_tpu.render.project import project_gaussians

        cam = make_camera(width=width, height=height)
        scene = make_scene(n, seed=seed)
        proj = project_gaussians(
            scene.get_xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity[:, 0], scene.get_features, None,
            world_view_transform=cam.world_view_transform,
            full_proj_transform=cam.full_proj_transform,
            camera_center=cam.camera_center,
            image_width=width, image_height=height,
            tan_fovx=math.tan(cam.fovx * 0.5), tan_fovy=math.tan(cam.fovy * 0.5),
            active_sh_degree=scene.active_sh_degree,
        )
        include = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)
        gw, gh = num_tiles(width), num_tiles(height)
        return bin_stream(
            proj.means2d, proj.depths, proj.radii, include,
            grid_w=gw, grid_h=gh, max_instances=budget,
        ), proj, gw, gh

    def test_chunks_are_tile_pure_and_sorted(self):
        b, proj, gw, gh = self._binned()
        T = gw * gh
        gauss = np.asarray(b.stream_gauss)
        ct = np.asarray(b.chunk_tile)
        C = proj.means2d.shape[0]
        # Real chunks ascend, trash chunks (T) trail.
        real = ct[ct < T]
        assert np.all(np.diff(real) >= 0)
        first_trash = len(real)
        assert np.all(ct[first_trash:] == T)
        # Every real row's tile equals its chunk's tile (tile-pure chunks).
        counts = np.asarray(b.tile_counts)
        pstart = np.concatenate([[0], np.cumsum(((counts + CHUNK - 1) // CHUNK) * CHUNK)])
        for t in range(T):
            run = gauss[pstart[t] : pstart[t] + counts[t]]
            assert np.all(run < C), f"tile {t}: padding inside the run"
            pad = gauss[pstart[t] + counts[t] : pstart[t + 1]]
            assert np.all(pad == C), f"tile {t}: real rows in the padding"

    def test_depth_order_within_tile(self):
        b, proj, gw, gh = self._binned(n=128, seed=2)
        T = gw * gh
        depths_sorted = np.asarray(proj.depths)[np.asarray(b.order)]
        gauss = np.asarray(b.stream_gauss)
        counts = np.asarray(b.tile_counts)
        pstart = np.concatenate([[0], np.cumsum(((counts + CHUNK - 1) // CHUNK) * CHUNK)])
        for t in range(T):
            run = gauss[pstart[t] : pstart[t] + counts[t]]
            d = depths_sorted[run]
            assert np.all(np.diff(d) >= -1e-6), f"tile {t} not front-to-back"

    def test_n_padded_accounting(self):
        b, _, _, _ = self._binned(n=64, seed=5)
        counts = np.asarray(b.tile_counts)
        expect = int((((counts + CHUNK - 1) // CHUNK) * CHUNK).sum())
        assert int(np.asarray(b.n_padded)) == expect
        assert int(np.asarray(b.n_instances)) == int(counts.sum()) + int(np.asarray(b.overflow))


class TestStreamGradients:
    def _grads(self, cfg, scene, cam, bg):
        def loss_fn(xyz, opacity, scaling, fdc, offset):
            s = scene.replace(xyz=xyz, opacity=opacity, scaling=scaling, features_dc=fdc)
            out = render(cam, s, cfg, bg_color=bg, screenspace_offset=offset)
            return jnp.sum(out["render"] ** 2) + 0.1 * jnp.sum(out["final_T"])

        args = (
            scene.xyz, scene.opacity, scene.scaling, scene.features_dc,
            jnp.zeros((scene.capacity, 2)),
        )
        return jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(*args)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_grads_match_xla_ad(self, seed):
        cam = make_camera(width=48, height=32)
        scene = make_scene(96, seed=seed)
        bg = jnp.array([0.2, 0.1, 0.4])
        ga = self._grads(XLA_CFG, scene, cam, bg)
        gb = self._grads(ST_CFG, scene, cam, bg)
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
        ga = self._grads(XLA_CFG, scene, cam, bg)
        gb = self._grads(ST_CFG, scene, cam, bg)
        for a, b in zip(ga, gb):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=5e-4 * scale)


class TestBF16Stream:
    """precision="bf16" property streaming: tile-local means + bf16 rows +
    fp32 accumulation. Gated as a documented LOSSY mode: image within
    quantization tolerance of fp32 (high PSNR), gradients within a few
    percent — regressions in the localization or dtype plumbing show up as
    gross errors, not tolerance drift."""

    BF_CFG = RenderConfig(use_pallas=True, use_stream=True, precision="bf16")

    def test_image_close_to_fp32(self):
        from gaussian_transformer_tpu.utils.image import psnr

        cam = make_camera(width=80, height=48)
        scene = make_scene(192, seed=9, capacity=200)
        bg = jnp.array([0.2, 0.1, 0.3])
        a = render(cam, scene, ST_CFG, bg_color=bg)["render"]
        b = render(cam, scene, self.BF_CFG, bg_color=bg)["render"]
        a, b = jnp.clip(a, 0, 1), jnp.clip(b, 0, 1)
        assert float(jnp.mean(psnr(b, a))) > 40.0
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0.03)

    def test_grads_close_to_fp32(self):
        cam = make_camera(width=48, height=32)
        scene = make_scene(96, seed=10)
        bg = jnp.zeros(3)
        helper = TestStreamGradients()
        ga = helper._grads(ST_CFG, scene, cam, bg)
        gb = helper._grads(self.BF_CFG, scene, cam, bg)
        for name, a, b in zip(["xyz", "opacity", "scaling", "features_dc", "offset"], ga, gb):
            a, b = np.asarray(a), np.asarray(b)
            assert np.all(np.isfinite(b)), name
            # Per-element alpha quantization (8-bit mantissa props) puts a
            # few grad elements near 10% relative; the bulk sits under 5%.
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=0.12 * scale, err_msg=name)
            frac_tight = np.mean(np.abs(b - a) <= 0.05 * scale)
            assert frac_tight > 0.97, f"{name}: {frac_tight:.3f} within 5%"


class TestSuperchunkBoundaries:
    """Directly pin the v3 kernel's cross-PROGRAM carry + flush logic:
    synthetic streams where tile runs span the BLOCK_ROWS program boundary,
    single-chunk tiles force back-to-back flushes, and the final tile ends
    exactly at the grid edge. Compared against a dense numpy reference."""

    def _ref(self, props, chunk_tile, chunk, T):
        """Mirror the kernel's CHUNK-LEVEL fp32 math (same Hillis-Steele
        grouping) so threshold decisions (1/255 floor, 1e-4 termination)
        agree bit-for-bit — these tests pin the carry/flush layout; the math
        itself is pinned by the golden/XLA suites."""
        P = 256
        f = np.float32
        props = np.asarray(props, f)
        color = np.zeros((T + 1, 3, P), f); color[:] = np.nan
        tmap = np.ones((T + 1, 1, P), f); tmap[:] = np.nan
        px = (np.arange(P) % 16).astype(f); py = (np.arange(P) // 16).astype(f)

        def scan_doubling(x, op, identity):
            s = 1
            x = x.copy()
            while s < x.shape[0]:
                shifted = np.concatenate(
                    [np.full((s, x.shape[1]), identity, f), x[:-s]], axis=0)
                x = op(x, shifted)
                s *= 2
            return x

        G = len(chunk_tile)
        cur = -1; acc_c = acc_t = live = None
        for g in range(G):
            t = int(chunk_tile[g])
            if t != cur:
                if cur >= 0:
                    color[cur], tmap[cur] = acc_c, acc_t
                cur = t
                acc_c = np.zeros((3, P), f); acc_t = np.ones((1, P), f)
                live = np.ones((1, P), f)
            if t >= T:
                continue
            if np.max(acc_t * live) < 1e-4:
                continue  # whole-tile early out, as in the kernel
            tx, ty = t % 4, t // 4  # grid_w = 4 below
            blk = props[g * chunk:(g + 1) * chunk]
            x = blk[:, 0:1]; y = blk[:, 1:2]
            a = blk[:, 2:3]; b = blk[:, 3:4]; c = blk[:, 4:5]
            rgb = blk[:, 5:8]; opac = blk[:, 8:9]
            dx = (x - (tx * 16 + px)[None]).astype(f)
            dy = (y - (ty * 16 + py)[None]).astype(f)
            power = (-f(0.5) * (a * dx * dx + c * dy * dy) - b * dx * dy).astype(f)
            alpha = np.minimum(f(0.99), (opac * np.exp(np.minimum(power, f(0)))).astype(f))
            alpha = np.where((power > 0) | (alpha < f(1 / 255)), f(0), alpha)
            one_minus = (f(1) - alpha).astype(f)
            excl = np.concatenate([np.ones((1, P), f), one_minus[:-1]], axis=0)
            excl = scan_doubling(excl, lambda u, v: (u * v).astype(f), f(1))
            t_in = (excl * acc_t).astype(f)
            trig = ((alpha > 0) & (t_in * one_minus < f(1e-4))).astype(f)
            done_inc = scan_doubling(trig, np.maximum, f(0)) > 0
            live_k = np.where(done_inc, f(0), live)
            w = (alpha * t_in * live_k).astype(f)
            acc_c = (acc_c + (rgb.T.astype(np.float64) @ w.astype(np.float64)).astype(f)).astype(f)
            factor = (f(1) - alpha * live_k).astype(f)
            prod = scan_doubling(factor, lambda u, v: (u * v).astype(f), f(1))[-1:]
            acc_t = (acc_t * prod).astype(f)
            live = (live * (f(1) - done_inc[-1:].astype(f))).astype(f)
        if cur >= 0:
            color[cur], tmap[cur] = acc_c, acc_t
        return color[:T], tmap[:T]

    @pytest.mark.parametrize("layout", ["long_run", "singles", "edge_end"])
    def test_matches_dense_reference(self, layout):
        from gaussian_transformer_tpu.render.stream import (
            BLOCK_ROWS,
            _composite_stream_tiles,
        )

        chunk = 32
        T = 16  # grid 4x4
        seeds = {"long_run": 101, "singles": 202, "edge_end": 303}
        rng = np.random.RandomState(seeds[layout])
        if layout == "long_run":
            # one tile's run spans >2 program boundaries, then short tiles
            runs = [(0, 5 * BLOCK_ROWS // chunk), (1, 3), (2, 1), (5, 2)]
        elif layout == "singles":
            # many single-chunk tiles => back-to-back flushes across programs
            runs = [(t, 1) for t in range(16)] * 9
        else:
            # last real tile ends exactly at a program boundary
            runs = [(0, 3), (1, BLOCK_ROWS // chunk - 3)]
        chunk_tile = np.concatenate([[t] * n for t, n in runs]).astype(np.int32)
        G = len(chunk_tile)
        I = G * chunk
        props = np.zeros((I, 16), np.float32)
        # random gaussians centered in their chunk's tile
        tx = (chunk_tile % 4)[:, None].repeat(chunk, 1).reshape(-1)
        ty = (chunk_tile // 4)[:, None].repeat(chunk, 1).reshape(-1)
        props[:, 0] = tx * 16 + rng.uniform(0, 16, I)
        props[:, 1] = ty * 16 + rng.uniform(0, 16, I)
        props[:, 2] = rng.uniform(0.05, 0.3, I)  # conic a
        props[:, 4] = rng.uniform(0.05, 0.3, I)  # conic c
        props[:, 5:8] = rng.rand(I, 3)
        props[:, 8] = rng.uniform(0.1, 0.9, I)
        # zero out rows of trash-tile chunks (pad semantics)
        props[np.asarray(chunk_tile >= T)[:, None].repeat(chunk, 1).reshape(-1)] = 0.0

        color, tmap = _composite_stream_tiles(
            jnp.asarray(props), jnp.asarray(chunk_tile), 4, 4
        )
        ref_c, ref_t = self._ref(props, chunk_tile, chunk, T)
        covered = ~np.isnan(ref_c[:, 0, 0])
        np.testing.assert_allclose(
            np.asarray(color)[covered], ref_c[covered], atol=3e-4
        )
        np.testing.assert_allclose(np.asarray(tmap)[covered], ref_t[covered], atol=3e-4)


class TestPullbackLayout:
    """Direct invariants of the gradient-pullback fields bin_stream emits
    (pos_unsorted / gauss_offsets / gauss_cov) — the end-to-end check is the
    grads-vs-XLA-AD suite; this pins the layout itself."""

    def test_pos_unsorted_roundtrip_and_segments(self):
        from tests.test_render import make_camera, make_scene
        from gaussian_transformer_tpu.render.project import project_gaussians
        import math

        scene = make_scene(300, seed=4, spread=1.2)
        cam = make_camera(width=96, height=64)
        proj = project_gaussians(
            scene.get_xyz, scene.get_scaling, scene.get_rotation,
            scene.get_opacity[:, 0], scene.get_features, None,
            world_view_transform=cam.world_view_transform,
            full_proj_transform=cam.full_proj_transform,
            camera_center=cam.camera_center,
            image_width=96, image_height=64,
            tan_fovx=math.tan(cam.fovx / 2), tan_fovy=math.tan(cam.fovy / 2),
            active_sh_degree=scene.active_sh_degree,
        )
        include = (proj.radii > 0) & (proj.opacities >= 1.0 / 255.0)
        gw, gh = num_tiles(96), num_tiles(64)
        b = bin_stream(proj.means2d, proj.depths, proj.radii_bin, include,
                       grid_w=gw, grid_h=gh)

        pos = np.asarray(b.pos_unsorted)
        sg = np.asarray(b.stream_gauss)
        off = np.asarray(b.gauss_offsets)
        cov = np.asarray(b.gauss_cov)
        C = scene.capacity
        I_pad = sg.shape[0]
        I = pos.shape[0]

        # Each depth-sorted gaussian g owns unsorted range [off[g], off[g]+cov[g]);
        # every in-stream instance of that range must land on a slot whose
        # stream_gauss IS g.
        gauss_of_unsorted = np.full(I, C, np.int32)
        for g in range(C):
            gauss_of_unsorted[off[g]:off[g] + cov[g]] = g
        in_stream = pos < I_pad
        assert in_stream.any()
        assert (sg[pos[in_stream]] == gauss_of_unsorted[in_stream]).all()
        # In-stream positions are unique (permutation into the padded stream).
        assert len(np.unique(pos[in_stream])) == in_stream.sum()
        # Total in-stream instances match the real (non-pad) stream rows.
        assert in_stream.sum() == (sg < C).sum()

