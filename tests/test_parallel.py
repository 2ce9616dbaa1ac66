"""Multi-chip parallel step tests on the virtual CPU mesh: the sharded
camera-batched train step must match an unsharded single-device run bit-for-
bit in semantics (same grads, same stats), and scene sharding must be
transparent to the renderer."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    stack_cameras,
)
from gaussian_transformer_tpu.parallel.mesh import (
    adam_sharding,
    camera_batch_sharding,
    replicated,
    shard_scene,
)
from gaussian_transformer_tpu.render import RenderConfig, render
from gaussian_transformer_tpu.scene.densify import DensifyStats
from gaussian_transformer_tpu.train.optim import AdamState
from gaussian_transformer_tpu.train.splat import OptConfig

from tests.test_train import _synthetic_scene_and_cams


def _setup(capacity_mult=8):
    scene, cams = _synthetic_scene_and_cams(n=120, n_cams=4, width=48, height=32, seed=31)
    # Round capacity to the mesh divisor.
    cap = ((scene.capacity + capacity_mult - 1) // capacity_mult) * capacity_mult
    scene = scene.compact(cap)
    return scene, cams


class TestShardedStep:
    def test_matches_unsharded(self):
        scene, cams = _setup()
        opt = OptConfig()
        cfg = RenderConfig(max_per_tile=64)
        step = make_sharded_train_step(opt, cfg)
        batch = stack_cameras(cams)
        bg = jnp.zeros(3)

        # Unsharded run (the step donates its inputs — rebuild for run 2).
        s1, a1, st1, m1 = step(
            scene, AdamState.init(scene), DensifyStats.init(scene.capacity),
            batch, bg, jnp.asarray(1.0), jnp.asarray(1.0),
        )

        # Sharded run on a 2x4 mesh, fresh (identical) inputs.
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        scene, cams = _setup()
        batch = stack_cameras(cams)
        mesh = make_mesh(devices[:8], data=2)
        scene_sh = shard_scene(scene, mesh)
        adam_sh = jax.device_put(AdamState.init(scene), replicated(mesh))
        stats_sh = jax.device_put(DensifyStats.init(scene.capacity), replicated(mesh))
        batch_sh = jax.device_put(batch, camera_batch_sharding(mesh))
        bg_sh = jax.device_put(bg, replicated(mesh))

        s2, a2, st2, m2 = step(
            scene_sh, adam_sh, stats_sh, batch_sh, bg_sh, jnp.asarray(1.0), jnp.asarray(1.0)
        )

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
        np.testing.assert_allclose(np.asarray(s2.xyz), np.asarray(s1.xyz), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(st2.xyz_gradient_accum), np.asarray(st1.xyz_gradient_accum), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(a2.mu["opacity"]), np.asarray(a1.mu["opacity"]), atol=1e-6
        )

    def test_render_transparent_to_sharding(self):
        scene, cams = _setup()
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(devices[:8], data=1)
        scene_sh = shard_scene(scene, mesh)
        cfg = RenderConfig(max_per_tile=64)
        a = render(cams[0], scene, cfg, bg_color=jnp.zeros(3))["render"]
        b = render(cams[0], scene_sh, cfg, bg_color=jnp.zeros(3))["render"]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)

    def test_stack_cameras(self):
        _, cams = _setup()
        batch = stack_cameras(cams)
        assert batch.world_view_transform.shape == (4, 4, 4)
        assert batch.original_image.shape[0] == 4
        np.testing.assert_array_equal(
            np.asarray(batch.camera_center[2]), np.asarray(cams[2].camera_center)
        )


class TestSequenceParallelTraining:
    """Trainer-level coverage of the long-sequence attention levers: the flat
    trainer's loss/step with blockwise (--attn_block_k) and ring (--seq_shard)
    attention must match the dense path exactly, and a sequence-sharded
    training step must run at >=32k tokens on the full virtual mesh (the
    capability the reference lacks entirely — its levers stop at token folding
    and visibility truncation, SURVEY.md §5)."""

    def _flat_fixture(self, ring=False, block_k=0):
        from gaussian_transformer_tpu.train.flat import (
            EmbeddedEncoderDecoder,
            FlatTrainingScene,
            init_flat_model,
            make_flat_loss,
        )

        scene, cams = _setup()

        class Stub:
            gaussians = scene

            def get_train_cameras(self, scale=1.0):
                return cams

        cfg = RenderConfig(max_per_tile=64)
        tscene = FlatTrainingScene(Stub(), cfg, max_len=10_000, min_len=1, bucket=8)
        assert tscene.size > 0
        tscene.set_epoch(1000)  # mid-schedule drop rate -> non-trivial src/tgt
        batch = tscene.make_batch(0)

        mesh = make_mesh(jax.devices()[:4], data=1) if ring else None
        model = EmbeddedEncoderDecoder(
            N=1, d_model=32, h=2, block_k=block_k,
            ring_axis="gauss" if ring else None, mesh=mesh,
        )
        loss_fn = make_flat_loss(model, cfg, use_lpips=False)
        return model, loss_fn, batch, init_flat_model

    def _loss_and_grads(self, ring, block_k, params=None):
        model, loss_fn, batch, init_flat_model = self._flat_fixture(ring, block_k)
        if params is None:
            params = init_flat_model(model, jax.random.PRNGKey(3))
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch["src"], batch["trg"], batch["trg_y"],
            batch["src_mask"], batch["trg_mask"], batch["cam"],
        )
        return params, float(loss), grads

    @pytest.mark.slow  # 3 full flat-trainer loss+grad compiles, ~8 min on CPU
    def test_flat_step_ring_and_blockwise_match_dense(self):
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 virtual devices")
        params, l_dense, g_dense = self._loss_and_grads(False, 0)
        _, l_ring, g_ring = self._loss_and_grads(True, 0, params)
        _, l_blk, g_blk = self._loss_and_grads(False, 8, params)
        assert abs(l_ring - l_dense) < 2e-4 * max(abs(l_dense), 1.0)
        assert abs(l_blk - l_dense) < 2e-4 * max(abs(l_dense), 1.0)
        fd = jax.tree_util.tree_leaves_with_path(g_dense)
        fr = jax.tree_util.tree_leaves(g_ring)
        fb = jax.tree_util.tree_leaves(g_blk)
        for (path, a), r, b in zip(fd, fr, fb):
            a, r, b = np.asarray(a), np.asarray(r), np.asarray(b)
            # +1e-6 floor: leaves with mathematically-zero grads (e.g. the k
            # bias — softmax is invariant to per-query score shifts) carry
            # only float noise on both sides.
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(r, a, atol=5e-4 * scale + 1e-6, err_msg=f"ring {path}")
            np.testing.assert_allclose(b, a, atol=5e-4 * scale + 1e-6, err_msg=f"blockwise {path}")

    @pytest.mark.slow
    def test_ring_encoder_training_step_32k_tokens(self):
        """One full training step (fwd + bwd + Adamax update) of the flat
        model's encoder over a 32768-token sequence sharded across all 8
        devices: no device ever materializes the [32k, 32k] score matrix (the
        per-device working set is [L/8, L/8] per ring hop)."""
        import optax

        from gaussian_transformer_tpu.train.flat import EmbeddedEncoderDecoder

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(devices[:8], data=1)
        L, D = 32768, 32
        model = EmbeddedEncoderDecoder(
            N=1, d_model=D, h=2, dropout=0.0, ring_axis="gauss", mesh=mesh,
        )
        from gaussian_transformer_tpu.models.codec import TOKEN_DIM

        rng = np.random.RandomState(0)
        src = jnp.asarray(rng.randn(1, L, TOKEN_DIM), jnp.float32)
        tgt = jnp.asarray(rng.randn(1, L, D), jnp.float32)
        from jax.sharding import NamedSharding, PartitionSpec as P

        seq_sh = NamedSharding(mesh, P(None, "gauss", None))
        src = jax.device_put(src, seq_sh)
        tgt = jax.device_put(tgt, seq_sh)

        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, src[:, :8], None,
            method=EmbeddedEncoderDecoder.encode,
        )
        optimizer = optax.adamax(1e-3, b1=0.9, b2=0.98, eps=1e-4)
        opt_state = optimizer.init(variables)

        @jax.jit
        def step(variables, opt_state, src, tgt):
            def loss_fn(v):
                mem = model.apply(v, src, None, method=EmbeddedEncoderDecoder.encode)
                return jnp.mean((mem - tgt) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(variables)
            updates, opt_state2 = optimizer.update(grads, opt_state, variables)
            import optax as _ox

            return _ox.apply_updates(variables, updates), opt_state2, loss

        v1, opt_state, loss1 = step(variables, opt_state, src, tgt)
        _, _, loss2 = step(v1, opt_state, src, tgt)
        assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
        assert float(loss2) < float(loss1)


class TestTileShardedCompositing:
    """Tile/pixel-sharded compositing (parallel/tile_shard.py): the instance
    stream's chunk axis splits over the mesh, each shard runs the unmodified
    Pallas kernel, partial frames fold with the associative front-to-back
    operator. Forward and gradients must match the single-device stream path
    (early termination is per-shard, bounding deltas at ~1e-4 — the
    BASELINE.md tiles-over-ICI north star)."""

    def _scene_cam(self):
        scene, cams = _setup()
        return scene, cams[0]

    def test_matches_unsharded_forward(self):
        from gaussian_transformer_tpu.parallel.tile_shard import render_tile_sharded

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        scene, cam = self._scene_cam()
        mesh = make_mesh(devices[:8], data=1)
        cfg = RenderConfig(use_pallas=True, use_stream=True)
        bg = jnp.array([0.2, 0.3, 0.1])
        a = render(cam, scene, cfg, bg_color=bg)
        b = render_tile_sharded(cam, scene, cfg, mesh, bg_color=bg)
        np.testing.assert_allclose(
            np.asarray(b["render"]), np.asarray(a["render"]), atol=3e-4
        )
        np.testing.assert_allclose(
            np.asarray(b["final_T"]), np.asarray(a["final_T"]), atol=3e-4
        )

    def test_grads_match_unsharded(self):
        from gaussian_transformer_tpu.parallel.tile_shard import render_tile_sharded

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        scene, cam = self._scene_cam()
        mesh = make_mesh(devices[:8], data=1)
        cfg = RenderConfig(use_pallas=True, use_stream=True)
        bg = jnp.zeros(3)

        def loss(render_fn, xyz, opacity, off):
            s = scene.replace(xyz=xyz, opacity=opacity)
            out = render_fn(s, off)
            return jnp.sum(out["render"] ** 2) + 0.1 * jnp.sum(out["final_T"])

        args = (scene.xyz, scene.opacity, jnp.zeros((scene.capacity, 2)))
        ga = jax.grad(
            lambda *a: loss(lambda s, o: render(cam, s, cfg, bg_color=bg, screenspace_offset=o), *a),
            argnums=(0, 1, 2),
        )(*args)
        gb = jax.grad(
            lambda *a: loss(
                lambda s, o: render_tile_sharded(cam, s, cfg, mesh, bg_color=bg, screenspace_offset=o),
                *a,
            ),
            argnums=(0, 1, 2),
        )(*args)
        for name, a, b in zip(["xyz", "opacity", "offset"], ga, gb):
            a, b = np.asarray(a), np.asarray(b)
            assert np.all(np.isfinite(b)), name
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b, a, atol=1e-3 * scale, err_msg=name)

    def test_train_step_matches_unsharded(self):
        """make_sharded_train_step(tile_axis=...) — full batched step with
        tile-sharded compositing matches the plain SPMD step (scene update,
        densify stats, loss) within the per-shard early-termination bound."""
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        opt = OptConfig()
        cfg = RenderConfig(use_pallas=True, use_stream=True)
        bg = jnp.zeros(3)

        def run(step, mesh=None):
            scene, cams = _setup()
            batch = stack_cameras(cams)
            if mesh is not None:
                scene = shard_scene(scene, mesh)
                batch = jax.device_put(batch, camera_batch_sharding(mesh))
            return step(
                scene, AdamState.init(scene), DensifyStats.init(scene.capacity),
                batch, bg, jnp.asarray(1.0), jnp.asarray(1.0),
            )

        s1, _, st1, m1 = run(make_sharded_train_step(opt, cfg))
        mesh = make_mesh(devices[:8], data=1)
        s2, _, st2, m2 = run(
            make_sharded_train_step(opt, cfg, mesh=mesh, tile_axis="gauss"), mesh
        )

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-3)
        np.testing.assert_allclose(np.asarray(s2.xyz), np.asarray(s1.xyz), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st2.xyz_gradient_accum),
            np.asarray(st1.xyz_gradient_accum),
            atol=1e-4,
        )


class TestStackedFSDP:
    """FSDP-style sharding of the stacked transformer (parallel/fsdp.py):
    params + optimizer state sharded over the mesh, XLA SPMD inserts the
    per-layer gathers/reduces. Loss and updated params must match the
    unsharded run."""

    def test_sharded_step_matches_unsharded(self):
        import optax

        from gaussian_transformer_tpu.models.transformer import init_model, make_model
        from gaussian_transformer_tpu.parallel.fsdp import (
            fsdp_shardings,
            make_fsdp_mesh,
            shard_tree,
        )
        from gaussian_transformer_tpu.train.stacked import make_train_step
        from tests.test_stacked import STACK_S, make_tscene

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")

        ts = make_tscene()
        ts.set_epoch(1000)
        batch = ts.make_batch([0, 1])
        # d_model must divide the axis size for the big matrices to shard.
        from gaussian_transformer_tpu.train.stacked import stacked_token_dim

        model = make_model(STACK_S, stacked_token_dim(STACK_S), stacked_token_dim(STACK_S),
                           N=1, d_model=stacked_token_dim(STACK_S), dropout=0.0)
        params0 = init_model(model, jax.random.PRNGKey(3))
        optimizer = optax.adam(1.0, eps=1e-4)
        step = make_train_step(model, ts.handler, ts.render_cfg, optimizer, STACK_S)

        def run(params, opt_state):
            outs = []
            for _ in range(2):
                params, opt_state, loss, _ = step(
                    params, opt_state, batch.src, batch.trg_y, batch.cameras,
                    jnp.asarray(5e-4),
                )
                outs.append(float(loss))
            return params, outs

        # Unsharded single-device baseline.
        p_ref, losses_ref = run(params0, optimizer.init(params0))

        # Sharded: params + optimizer state over an 8-way fsdp mesh. A tiny
        # min_size so the test model's matrices actually shard.
        mesh = make_fsdp_mesh(devices[:8])
        # rebuild the step WITH the mesh so the loss's manual render wrapper
        # (the real-TPU-compilable form) is the path under test
        step = make_train_step(model, ts.handler, ts.render_cfg, optimizer,
                               STACK_S, mesh=mesh)
        p_sh = shard_tree(params0, mesh, min_size=1024)
        o_sh = jax.device_put(
            optimizer.init(params0), fsdp_shardings(optimizer.init(params0), mesh, min_size=1024)
        )
        # at least one leaf must actually be sharded for this test to mean anything
        specs = jax.tree.leaves(
            jax.tree.map(lambda s: s.spec, fsdp_shardings(params0, mesh, min_size=1024)),
            is_leaf=lambda x: hasattr(x, "index") or x is None,
        )
        assert any(any(p is not None for p in s) for s in specs if s is not None)

        p_out, losses_sh = run(p_sh, o_sh)

        np.testing.assert_allclose(losses_sh, losses_ref, rtol=2e-4)
        for a, b in zip(jax.tree.leaves(p_out), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4)


class TestButterflyFoldCollectives:
    """The tile-sharded fold must be the butterfly (log-D ppermute pairs),
    not the round-2 all-gather of full per-device frames: per-device traffic
    O(T*P*log D) with NO all-gather of size O(D*T*P) (round-3 verdict #4)."""

    def test_fold_hlo_has_no_full_frame_gather(self):
        from gaussian_transformer_tpu.parallel.audit import (
            collective_report,
            hlo_of_compiled,
        )
        from gaussian_transformer_tpu.parallel.tile_shard import render_tile_sharded

        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        scene, cams = _setup()
        cam = cams[0]
        mesh = make_mesh(devices[:8], data=1)
        cfg = RenderConfig(use_pallas=True, use_stream=True)
        bg = jnp.zeros(3)
        D = 8

        fn = jax.jit(lambda s: render_tile_sharded(cam, s, cfg, mesh, bg_color=bg)["render"])
        compiled = fn.lower(scene).compile()
        try:
            hlo = hlo_of_compiled(compiled)
        except Exception:
            hlo = compiled.as_text()
        report = collective_report(hlo)
        # frame payload: [T, 4, P] f32 per device (color 3 rows + T 1 row)
        from gaussian_transformer_tpu.render.tiles import TILE, num_tiles

        T = num_tiles(cam.image_width) * num_tiles(cam.image_height)
        frame_bytes = T * 4 * TILE * TILE * 4
        perms = [c for c in report if c.op == "collective-permute"]
        assert perms, f"no ppermute in fold HLO: {[c.op for c in report]}"
        gathers = [c for c in report if c.op == "all-gather"]
        for g in gathers:
            assert g.bytes < frame_bytes * (D - 1), (
                f"all-gather of {g.bytes}B looks like the old D-way frame "
                f"gather (frame={frame_bytes}B, D={D}): {g}"
            )


class TestStackedDP:
    """Data-parallel windows for the stacked trainer: make_dp_train_step over
    a 2-device mesh must equal mean-of-window-gradients applied once."""

    def test_dp_step_matches_grad_mean(self):
        import optax

        from gaussian_transformer_tpu.models.transformer import init_model
        from gaussian_transformer_tpu.train.stacked import (
            make_dp_train_step,
            make_loss_fn,
        )
        from tests.test_stacked import STACK_S, make_tscene, small_model

        devices = jax.devices()
        if len(devices) < 2:
            pytest.skip("needs 2 virtual devices")

        ts = make_tscene(batch_size=2)
        ts.set_epoch(1000)
        ts.rng = np.random.RandomState(5)
        group = ts.make_batch_group(2)
        assert group is not None

        model = small_model()
        params0 = init_model(model, jax.random.PRNGKey(3))
        optimizer = optax.adam(1.0, eps=1e-4)
        opt0 = optimizer.init(params0)

        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(devices[:2]), ("data",))
        step = make_dp_train_step(model, ts.handler, ts.render_cfg, optimizer,
                                  STACK_S, mesh=mesh, batch_size=2)
        p_dp, _, loss_dp, _ = step(
            params0, opt0, group.src, group.trg_y, group.cameras,
            jnp.asarray(5e-4), group.src_mask,
        )

        # Reference: per-window grads with the same per-device rng folding.
        loss_fn = make_loss_fn(model, ts.handler, ts.render_cfg, STACK_S)
        base_rng = jax.random.PRNGKey(0)
        gsum, lsum = None, 0.0
        for w in range(2):
            cam_list = [jax.tree.map(lambda a, b=b, w=w: a[w, b], group.cameras)
                        for b in range(2)]
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params0, group.src[w:w+1], group.trg_y[w:w+1], cam_list,
                group.src_mask[w:w+1], jax.random.fold_in(base_rng, w),
            )
            lsum += float(l)
            gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
        gmean = jax.tree.map(lambda x: x / 2.0, gsum)
        updates, _ = optimizer.update(gmean, optimizer.init(params0), params0)
        updates = jax.tree.map(lambda u: u * 5e-4, updates)
        import optax as _ox

        p_ref = _ox.apply_updates(params0, updates)

        assert float(loss_dp) == pytest.approx(lsum / 2.0, rel=2e-4)
        for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-4)


class TestStackedDPxFSDP:
    """2D composition: windows manual over 'data', parameters auto-sharded
    over 'fsdp' inside the shard_map region. Must match the unsharded
    mean-of-window-gradients step."""

    def test_2d_mesh_matches_unsharded(self):
        import optax
        from jax.sharding import Mesh

        from gaussian_transformer_tpu.models.transformer import init_model
        from gaussian_transformer_tpu.parallel.fsdp import fsdp_shardings
        from gaussian_transformer_tpu.train.stacked import (
            make_dp_train_step,
            make_loss_fn,
        )
        from tests.test_stacked import STACK_S, make_tscene, small_model

        devices = jax.devices()
        if len(devices) < 4:
            pytest.skip("needs 4 virtual devices")

        ts = make_tscene(batch_size=2)
        ts.set_epoch(1000)
        ts.rng = np.random.RandomState(9)
        group = ts.make_batch_group(2)
        assert group is not None

        model = small_model()
        params0 = init_model(model, jax.random.PRNGKey(3))
        optimizer = optax.adam(1.0, eps=1e-4)

        mesh = Mesh(np.asarray(devices[:4]).reshape(2, 2), ("data", "fsdp"))
        p_sh = jax.device_put(params0, fsdp_shardings(params0, mesh, axis="fsdp", min_size=1024))
        o_sh = jax.device_put(
            optimizer.init(params0),
            fsdp_shardings(optimizer.init(params0), mesh, axis="fsdp", min_size=1024),
        )
        step = make_dp_train_step(model, ts.handler, ts.render_cfg, optimizer,
                                  STACK_S, mesh=mesh, batch_size=2)
        p_dp, _, loss_dp, _ = step(
            p_sh, o_sh, group.src, group.trg_y, group.cameras,
            jnp.asarray(5e-4), group.src_mask,
        )

        # Unsharded reference: mean of per-window grads, one update.
        loss_fn = make_loss_fn(model, ts.handler, ts.render_cfg, STACK_S)
        base_rng = jax.random.PRNGKey(0)
        gsum, lsum = None, 0.0
        for w in range(2):
            cam_list = [jax.tree.map(lambda a, b=b, w=w: a[w, b], group.cameras)
                        for b in range(2)]
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params0, group.src[w:w+1], group.trg_y[w:w+1], cam_list,
                group.src_mask[w:w+1], jax.random.fold_in(base_rng, w),
            )
            lsum += float(l)
            gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
        gmean = jax.tree.map(lambda x: x / 2.0, gsum)
        updates, _ = optimizer.update(gmean, optimizer.init(params0), params0)
        p_ref = optax.apply_updates(params0, jax.tree.map(lambda u: u * 5e-4, updates))

        assert float(loss_dp) == pytest.approx(lsum / 2.0, rel=3e-4)
        for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4)


class TestFSDPLeafSpec:
    def test_shards_largest_divisible_dim_and_replicates_small(self):
        from gaussian_transformer_tpu.parallel.fsdp import leaf_spec
        from jax.sharding import PartitionSpec as P

        big = np.zeros((128, 512))     # largest dim 512 divisible by 8
        assert leaf_spec(big, 8, "fsdp", min_size=1024) == P(None, "fsdp")
        tall = np.zeros((1024, 100))   # 100 not divisible; 1024 is
        assert leaf_spec(tall, 8, "fsdp", min_size=1024) == P("fsdp", None)
        small = np.zeros((4, 4))       # below min_size -> replicated
        assert leaf_spec(small, 8, "fsdp", min_size=1024) == P()
        odd = np.zeros((999, 1001))    # nothing divisible -> replicated
        assert leaf_spec(odd, 8, "fsdp", min_size=1024) == P()


class TestManualShardedStep:
    """The MANUAL multi-chip step (mesh=...): per-shard projection + explicit
    projected-splat all-gather + per-device Pallas compositing. This is the
    form the real TPU compiler accepts (Mosaic custom calls cannot be
    auto-partitioned); it must match the unsharded step."""

    def test_manual_step_matches_unsharded(self):
        devices = jax.devices()
        if len(devices) < 8:
            pytest.skip("needs 8 virtual devices")
        opt = OptConfig()
        cfg = RenderConfig(use_pallas=True, use_stream=True)
        bg = jnp.zeros(3)

        def run(step, mesh=None):
            scene, cams = _setup()
            batch = stack_cameras(cams)
            adam = AdamState.init(scene)
            stats = DensifyStats.init(scene.capacity)
            if mesh is not None:
                scene = shard_scene(scene, mesh)
                batch = jax.device_put(batch, camera_batch_sharding(mesh))
                adam = jax.device_put(adam, adam_sharding(mesh, adam))
                stats = jax.device_put(stats, replicated(mesh))
            return step(
                scene, adam, stats, batch, bg, jnp.asarray(1.0), jnp.asarray(1.0)
            )

        s1, _, st1, m1 = run(make_sharded_train_step(opt, cfg))
        mesh = make_mesh(devices[:8], data=2)
        s2, _, st2, m2 = run(make_sharded_train_step(opt, cfg, mesh=mesh), mesh)

        assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
        np.testing.assert_allclose(np.asarray(s2.xyz), np.asarray(s1.xyz), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(st2.xyz_gradient_accum), np.asarray(st1.xyz_gradient_accum),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(st2.max_radii2d), np.asarray(st1.max_radii2d), atol=1e-5
        )
