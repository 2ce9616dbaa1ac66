"""Trainer-layer tests: Adam parity, lr schedule, densify/prune slot edits,
checkpoint roundtrip, and an end-to-end smoke optimization that must reduce
the loss on a synthetic scene (SURVEY.md §4)."""

import math
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gaussian_transformer_tpu.render import RenderConfig, render
from gaussian_transformer_tpu.scene.densify import (
    DensifyStats,
    add_densification_stats,
    densify_and_prune,
    reset_opacity,
)
from gaussian_transformer_tpu.scene.gaussians import GaussianScene
from gaussian_transformer_tpu.train.optim import (
    PARAM_LEAVES,
    AdamState,
    adam_step,
    compact_state,
    expon_lr,
)
from gaussian_transformer_tpu.train.splat import (
    OptConfig,
    capture,
    evaluate_psnr,
    restore,
    train_step,
    training,
)
from gaussian_transformer_tpu.utils.general import get_expon_lr_func, inverse_sigmoid

from tests.test_render import make_camera, make_scene


class TestOptim:
    def test_adam_first_step_is_signed_lr(self):
        scene = make_scene(4, seed=0)
        adam = AdamState.init(scene)
        grads = {k: jnp.ones_like(getattr(scene, k)) * 2.0 for k in PARAM_LEAVES}
        lrs = {k: 0.01 for k in PARAM_LEAVES}
        new_scene, _ = adam_step(scene, grads, adam, lrs)
        # With eps tiny, first Adam step is exactly -lr * sign(g).
        np.testing.assert_allclose(
            np.asarray(new_scene.xyz), np.asarray(scene.xyz) - 0.01, rtol=1e-5
        )

    def test_expon_lr_matches_reference_helper(self):
        ref = get_expon_lr_func(1e-2, 1e-4, lr_delay_mult=0.01, max_steps=1000)
        for step in [0, 1, 10, 500, 999, 1000, 2000]:
            np.testing.assert_allclose(
                float(expon_lr(step, 1e-2, 1e-4, lr_delay_mult=0.01, max_steps=1000)),
                ref(step),
                rtol=1e-5,
            )

    def test_compact_state_preserves_momentum(self):
        scene = make_scene(6, seed=1, capacity=8)
        adam = AdamState.init(scene)
        mu = {k: jnp.arange(v.size, dtype=jnp.float32).reshape(v.shape) for k, v in adam.mu.items()}
        adam = AdamState(mu=mu, nu=adam.nu, counts=adam.counts)
        alive = jnp.asarray([True, False, True, True, False, True, True, True])
        packed = compact_state(adam, alive, 12)
        src = np.asarray(mu["xyz"])[np.asarray(alive)]
        np.testing.assert_array_equal(np.asarray(packed.mu["xyz"])[: len(src)], src)
        assert np.all(np.asarray(packed.mu["xyz"])[len(src):] == 0)


class TestDensify:
    def _base(self, n=8, cap=32):
        scene = make_scene(n, seed=2, capacity=cap)
        adam = AdamState.init(scene)
        stats = DensifyStats.init(cap)
        return scene, adam, stats

    def test_clone_small_high_grad(self):
        scene, adam, stats = self._base()
        n0 = int(scene.num_alive)
        # Small scales + big accumulated grad on slot 0 => clone.
        scene = scene.replace(scaling=jnp.full_like(scene.scaling, -5.0))
        stats = stats.replace(
            xyz_gradient_accum=stats.xyz_gradient_accum.at[0].set(1.0),
            denom=stats.denom.at[0].set(1.0),
        )
        s2, a2, st2, rep = densify_and_prune(
            scene, adam, stats, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.0, extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(rep.n_cloned) == 1 and int(rep.n_split) == 0
        assert int(s2.num_alive) == n0 + 1
        # The clone is a verbatim copy of slot 0 params.
        new_slot = int(np.nonzero(np.asarray(s2.alive) & ~np.asarray(scene.alive))[0][0])
        np.testing.assert_array_equal(np.asarray(s2.xyz[new_slot]), np.asarray(scene.xyz[0]))

    def test_split_large_high_grad(self):
        scene, adam, stats = self._base()
        n0 = int(scene.num_alive)
        scene = scene.replace(scaling=scene.scaling.at[1].set(jnp.log(0.5)))  # large
        stats = stats.replace(
            xyz_gradient_accum=stats.xyz_gradient_accum.at[1].set(1.0),
            denom=stats.denom.at[1].set(1.0),
        )
        s2, a2, st2, rep = densify_and_prune(
            scene, adam, stats, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.0, extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(rep.n_split) == 1
        # Source killed, two children added => net +1.
        assert int(s2.num_alive) == n0 + 1
        assert not bool(s2.alive[1])
        # Children scales = parent/1.6.
        new_slots = np.nonzero(np.asarray(s2.alive) & ~np.asarray(scene.alive))[0]
        assert len(new_slots) == 2
        np.testing.assert_allclose(
            np.asarray(jnp.exp(s2.scaling[new_slots[0]])),
            np.asarray(jnp.exp(scene.scaling[1])) / 1.6,
            rtol=1e-5,
        )

    def test_prune_low_opacity(self):
        scene, adam, stats = self._base()
        scene = scene.replace(opacity=scene.opacity.at[3].set(inverse_sigmoid(jnp.asarray([1e-4]))))
        s2, _, _, rep = densify_and_prune(
            scene, adam, stats, jax.random.PRNGKey(0),
            max_grad=9.9, min_opacity=0.005, extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(rep.n_pruned) == 1
        assert not bool(s2.alive[3])

    def test_capacity_exhaustion_drops_and_reports(self):
        scene, adam, stats = self._base(n=8, cap=9)  # one free slot
        scene = scene.replace(scaling=jnp.full_like(scene.scaling, -5.0))
        stats = stats.replace(
            xyz_gradient_accum=stats.xyz_gradient_accum.at[:8].set(1.0),
            denom=stats.denom.at[:8].set(1.0),
        )
        s2, _, _, rep = densify_and_prune(
            scene, adam, stats, jax.random.PRNGKey(0),
            max_grad=0.5, min_opacity=0.0, extent=1.0, max_screen_size=0.0, percent_dense=0.01,
        )
        assert int(rep.n_cloned) == 8
        assert int(rep.n_dropped) == 7
        assert int(s2.num_alive) == 9

    def test_reset_opacity_clamps(self):
        scene, adam, _ = self._base()
        s2, a2 = reset_opacity(scene, adam)
        op = np.asarray(s2.get_opacity[:, 0])
        alive = np.asarray(s2.alive)
        assert np.all(op[alive] <= 0.01 + 1e-6)
        assert np.all(np.asarray(a2.mu["opacity"]) == 0)

    def test_stats_accumulation(self):
        stats = DensifyStats.init(4)
        g = jnp.asarray([[3.0, 4.0], [1.0, 0.0], [0.0, 0.0], [5.0, 12.0]])
        vis = jnp.asarray([True, True, False, False])
        radii = jnp.asarray([7, 2, 9, 1])
        st = add_densification_stats(stats, g, vis, radii)
        np.testing.assert_allclose(np.asarray(st.xyz_gradient_accum), [5.0, 1.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(st.denom), [1, 1, 0, 0])
        np.testing.assert_allclose(np.asarray(st.max_radii2d), [7, 2, 0, 0])

    def test_stats_ndc_units(self):
        # Reference-convention parity: the CUDA backward reports dL/dmean2D in
        # NDC units = pixel grads * (0.5*W, 0.5*H); image_size applies the same
        # rescale so densify_grad_threshold=0.0002 keeps its calibration.
        stats = DensifyStats.init(2)
        g = jnp.asarray([[0.01, 0.02], [0.0, 0.0]])
        vis = jnp.asarray([True, True])
        radii = jnp.asarray([3, 0])
        W, H = 640, 480
        st = add_densification_stats(stats, g, vis, radii, image_size=(W, H))
        expect = np.linalg.norm([0.01 * 0.5 * W, 0.02 * 0.5 * H])
        np.testing.assert_allclose(np.asarray(st.xyz_gradient_accum), [expect, 0.0], rtol=1e-6)


def _synthetic_scene_and_cams(n=48, n_cams=6, width=48, height=36, seed=7):
    """A ground-truth scene rendered from several viewpoints => cameras with GT
    images; plus a perturbed copy to optimize."""
    target = make_scene(n, seed=seed, spread=1.0)
    cams = []
    for i in range(n_cams):
        ang = 2 * math.pi * i / n_cams
        # Orbit: rotate camera around y axis at radius 5.
        Rw2c = np.array(
            [
                [math.cos(ang), 0, -math.sin(ang)],
                [0, 1, 0],
                [math.sin(ang), 0, math.cos(ang)],
            ]
        )
        T = np.array([0.0, 0.0, 5.0])
        cam = make_camera(width=width, height=height)
        from gaussian_transformer_tpu.scene.cameras import Camera

        cam = Camera.create(
            colmap_id=i, R=Rw2c.T, T=T, fovx=cam.fovx, fovy=cam.fovy, image=None,
            gt_alpha_mask=None, image_name=f"c{i}", uid=i, width=width, height=height,
        )
        gt = render(cam, target, RenderConfig(max_per_tile=64), bg_color=jnp.zeros(3))["render"]
        cams.append(cam.replace(original_image=jnp.clip(gt, 0.0, 1.0)))
    rng = np.random.RandomState(seed + 1)
    start = target.replace(
        xyz=target.xyz + jnp.asarray(rng.normal(0, 0.05, target.xyz.shape), jnp.float32),
        features_dc=target.features_dc * 0.5,
        opacity=jnp.full_like(target.opacity, inverse_sigmoid(jnp.asarray(0.3))),
    )
    return start, cams


class TestTrainStep:
    def test_loss_decreases(self):
        start, cams = _synthetic_scene_and_cams()
        opt = OptConfig(position_lr_init=0.0016, position_lr_max_steps=200)
        cfg = RenderConfig(max_per_tile=64)
        adam = AdamState.init(start)
        stats = DensifyStats.init(start.capacity)
        scene = start
        losses = []
        for it in range(1, 61):
            cam = cams[it % len(cams)]
            scene, adam, stats, m = train_step(
                scene, adam, stats, cam, jnp.zeros(3),
                jnp.asarray(it, jnp.float32), jnp.asarray(1.0, jnp.float32), opt, cfg,
            )
            losses.append(float(m["loss"]))
        assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10]), losses[:3] + losses[-3:]

    def test_training_loop_with_densify_and_save(self, tmp_path):
        start, cams = _synthetic_scene_and_cams(n=24, n_cams=4)
        scene_obj = types.SimpleNamespace(
            gaussians=start,
            cameras_extent=2.0,
            model_path=str(tmp_path),
            get_train_cameras=lambda scale=1.0: cams,
            get_test_cameras=lambda scale=1.0: [],
        )
        scene_obj.save = lambda it: scene_obj.gaussians.save_ply(
            str(tmp_path / f"point_cloud/iteration_{it}/point_cloud.ply")
        )
        opt = OptConfig(
            iterations=80, densify_from_iter=10, densify_until_iter=70,
            densification_interval=25, opacity_reset_interval=1000,
            densify_grad_threshold=0.0002, position_lr_max_steps=80,
        )
        out = training(
            scene_obj, opt, RenderConfig(max_per_tile=64),
            saving_iterations=[80], checkpoint_iterations=[80], progress=False,
        )
        assert (tmp_path / "point_cloud/iteration_80/point_cloud.ply").exists()
        assert (tmp_path / "chkpnt80.npz").exists()
        p, l1 = evaluate_psnr(out, cams, RenderConfig(max_per_tile=64))
        assert np.isfinite(p)

    def test_capture_restore_roundtrip(self):
        start, _ = _synthetic_scene_and_cams(n=8, n_cams=1)
        adam = AdamState.init(start)
        stats = DensifyStats.init(start.capacity)
        payload = capture(start, adam, stats, 42, 3.5)
        scene2, adam2, stats2, it, slrs = restore(payload)
        assert it == 42 and slrs == 3.5
        np.testing.assert_array_equal(np.asarray(scene2.xyz), np.asarray(start.xyz))
        assert scene2.active_sh_degree == start.active_sh_degree


class TestCameraJitStability:
    """Distinct camera identities must NOT key distinct jit traces (the
    round-2 campaign's ~10 GB/h host leak: uid/colmap_id/image_name are
    static pytree fields, so un-anonymized cameras retained one trace +
    executable per camera combination)."""

    def test_anonymize_unifies_treedefs(self):
        _, cams = _synthetic_scene_and_cams(n=8, n_cams=3)
        defs = {jax.tree_util.tree_structure(c.anonymize()) for c in cams}
        assert len(defs) == 1
        # and un-anonymized cameras really do differ (the hazard exists)
        raw = {jax.tree_util.tree_structure(c) for c in cams}
        assert len(raw) == len(cams)

    def test_stack_cameras_treedef_independent_of_leader(self):
        from gaussian_transformer_tpu.parallel.step import stack_cameras

        _, cams = _synthetic_scene_and_cams(n=8, n_cams=4)
        a = stack_cameras([cams[0], cams[1]])
        b = stack_cameras([cams[2], cams[3]])
        assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)

    def test_train_loop_traces_once_across_cameras(self):
        traces = []

        @jax.jit
        def probe(cam):
            traces.append(1)
            return cam.world_view_transform.sum()

        _, cams = _synthetic_scene_and_cams(n=8, n_cams=4)
        for c in cams:
            probe(c.anonymize())
        assert len(traces) == 1


class TestOrbaxResume:
    def test_training_resumes_from_orbax_snapshot(self, tmp_path):
        """Kill-and-resume through the Orbax layer: a first run snapshots
        every 10 iters; a second run with a longer horizon must auto-resume
        from the latest snapshot instead of starting over."""
        pytest.importorskip("orbax.checkpoint")
        start, cams = _synthetic_scene_and_cams(n=16, n_cams=3)

        def make_obj():
            obj = types.SimpleNamespace(
                gaussians=start,
                cameras_extent=2.0,
                model_path=str(tmp_path),
                get_train_cameras=lambda scale=1.0: cams,
                get_test_cameras=lambda scale=1.0: [],
            )
            obj.save = lambda it: None
            return obj

        cfg = RenderConfig(max_per_tile=64)
        opt1 = OptConfig(iterations=20, densify_from_iter=10**9, position_lr_max_steps=60)
        training(make_obj(), opt1, cfg, progress=False,
                 orbax_dir=str(tmp_path / "run"), orbax_every=10)

        from gaussian_transformer_tpu.train import orbax_ckpt

        mgr = orbax_ckpt.make_manager(str(tmp_path / "run"))
        assert mgr.latest_step() == 20

        # resume: the second run must pick up at iteration 20, run 20 more.
        seen = []
        opt2 = OptConfig(iterations=40, densify_from_iter=10**9, position_lr_max_steps=60)
        training(
            make_obj(), opt2, cfg, progress=False,
            orbax_dir=str(tmp_path / "run"), orbax_every=10,
            log_fn=lambda iteration, **kw: seen.append(iteration),
        )
        assert min(seen) == 21, seen[:3]  # resumed, not restarted
        mgr = orbax_ckpt.make_manager(str(tmp_path / "run"))
        assert mgr.latest_step() == 40
