"""GT-recovery quality gate (the in-env stand-in for real-scene PSNR parity).

The bundled reference scenes have their images stripped (.MISSING_LARGE_BLOBS),
so real-scene quality can't be measured here. This proxy pins optimizer +
renderer + gradient quality end-to-end instead: render a KNOWN Gaussian scene
to produce ground-truth images, degrade the scene (jittered positions, wrong
colors, flattened opacity), re-optimize with the real train_step, and demand
the result recovers to near-GT PSNR — a regression in any gradient path,
loss term, or Adam rule drops the recovered PSNR and fails loudly.

Reference context: the upstream trainer's implicit quality bar is the 3DGS
paper's ~27+ dB at 30k iterations (/root/reference/train.py:86-123)."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_transformer_tpu.render import RenderConfig, render
from gaussian_transformer_tpu.scene.cameras import Camera
from gaussian_transformer_tpu.scene.densify import DensifyStats
from gaussian_transformer_tpu.train.optim import AdamState
from gaussian_transformer_tpu.train.splat import OptConfig, evaluate_psnr, train_step

from tests.test_render import make_scene

WIDTH, HEIGHT = 64, 48
CFG = RenderConfig(max_per_tile=128)


def ring_camera(i, n, z=5.0, fov=60.0):
    ang = 2 * math.pi * i / n
    Rw2c = np.array(
        [
            [math.cos(ang), 0, -math.sin(ang)],
            [0, 1, 0],
            [math.sin(ang), 0, math.cos(ang)],
        ]
    )
    return Camera.create(
        colmap_id=i, R=Rw2c.T, T=np.array([0.0, 0.0, z]),
        fovx=math.radians(fov), fovy=math.radians(fov * HEIGHT / WIDTH),
        image=None, gt_alpha_mask=None, image_name=f"q{i}", uid=i,
        width=WIDTH, height=HEIGHT,
    )


def degrade(scene, seed=7):
    """Jitter positions by ~7% of the scene spread, replace colors with noise,
    flatten opacity — far enough that start PSNR is poor, near enough that a
    few hundred steps recover it (the reference's densify loop handles the
    rest on real scenes)."""
    rng = np.random.RandomState(seed)
    return scene.replace(
        xyz=scene.xyz + rng.normal(0, 0.25, scene.xyz.shape).astype(np.float32),
        features_dc=jnp.asarray(rng.normal(0, 0.5, scene.features_dc.shape), jnp.float32),
        features_rest=jnp.zeros_like(scene.features_rest),
        opacity=jnp.where(scene.alive[:, None], 0.0, scene.opacity),
    )


@pytest.mark.slow
def test_gt_recovery_psnr():
    target = make_scene(96, seed=33, spread=1.2)
    n_cams = 8
    cams = [ring_camera(i, n_cams) for i in range(n_cams)]
    bg = jnp.zeros(3, jnp.float32)
    gt_render = jax.jit(lambda cam: render(cam, target, CFG, bg_color=bg)["render"])
    cams = [c.replace(original_image=jnp.clip(gt_render(c), 0.0, 1.0)) for c in cams]
    train_cams, test_cams = cams[:-1], cams[-1:]

    scene = degrade(target)
    psnr0, _ = evaluate_psnr(scene, test_cams, CFG, bg)

    opt = OptConfig(feature_lr=0.01, opacity_lr=0.1, scaling_lr=0.01)
    adam = AdamState.init(scene)
    stats = DensifyStats.init(scene.capacity)
    slrs = jnp.asarray(2.0, jnp.float32)

    # All steps in ONE on-device fori_loop (a per-step Python loop re-dispatches
    # the jitted step 500x, far too slow on the CPU test mesh).
    from gaussian_transformer_tpu.parallel import stack_cameras

    cams_stacked = stack_cameras(train_cams)
    n_train = len(train_cams)

    def body(it, carry):
        scene, adam, stats, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (), 0, n_train)
        cam = jax.tree.map(lambda a: a[idx], cams_stacked)
        scene, adam, stats, _ = train_step(
            scene, adam, stats, cam, bg, it.astype(jnp.float32), slrs, opt, CFG
        )
        return scene, adam, stats, key

    run = jax.jit(
        lambda s, a, st, k: jax.lax.fori_loop(1, 1501, body, (s, a, st, k))
    )
    scene, adam, stats, _ = run(scene, adam, stats, jax.random.PRNGKey(0))

    psnr1, _ = evaluate_psnr(scene, test_cams, CFG, bg)
    # Demonstrated headroom: the recovery reaches ~30+ dB; gate at 27 (the
    # 3DGS paper-level bar) so renderer/gradient regressions fail loudly.
    # (The degraded floor sits near ~21 dB only because most pixels are
    # background on this sparse proxy scene — the recovery DELTA is the
    # discriminative signal, not the absolute floor.)
    assert psnr0 < 23.0, f"degraded init unexpectedly good: {psnr0:.1f} dB"
    assert psnr1 >= 27.0 and psnr1 - psnr0 >= 5.0, (
        f"GT recovery stalled: {psnr0:.1f} -> {psnr1:.1f} dB"
    )


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("GT_LARGE_QUALITY") != "1",
    reason="opt-in (GT_LARGE_QUALITY=1): 10k Gaussians at 512x512 is sized "
    "for the real TPU chip, not the CPU test mesh",
)
def test_gt_recovery_psnr_large():
    """BASELINE.json config-1/2-scale GT recovery: 10k Gaussians, 512x512
    cameras, full train_step loop. Same protocol as the small gate; run on
    the real chip with GT_LARGE_QUALITY=1 (takes a few minutes)."""
    W, H = 512, 512
    n = 10_000
    target = make_scene(n, seed=33, spread=1.2)
    n_cams = 8

    def big_cam(i):
        c = ring_camera(i, n_cams)
        return c.replace(image_width=W, image_height=H)

    cams = [big_cam(i) for i in range(n_cams)]
    cfg = RenderConfig()
    bg = jnp.zeros(3, jnp.float32)
    gt_render = jax.jit(lambda cam: render(cam, target, cfg, bg_color=bg)["render"])
    cams = [c.replace(original_image=jnp.clip(gt_render(c), 0.0, 1.0)) for c in cams]
    train_cams, test_cams = cams[:-1], cams[-1:]

    scene = degrade(target)
    psnr0, _ = evaluate_psnr(scene, test_cams, cfg, bg)

    opt = OptConfig(feature_lr=0.01, opacity_lr=0.1, scaling_lr=0.01)
    adam = AdamState.init(scene)
    stats = DensifyStats.init(scene.capacity)
    slrs = jnp.asarray(2.0, jnp.float32)

    from gaussian_transformer_tpu.parallel import stack_cameras

    cams_stacked = stack_cameras(train_cams)
    n_train = len(train_cams)

    def body(it, carry):
        scene, adam, stats, key = carry
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (), 0, n_train)
        cam = jax.tree.map(lambda a: a[idx], cams_stacked)
        scene, adam, stats, _ = train_step(
            scene, adam, stats, cam, bg, it.astype(jnp.float32), slrs, opt, cfg
        )
        return scene, adam, stats, key

    run = jax.jit(
        lambda s, a, st, k: jax.lax.fori_loop(1, 1501, body, (s, a, st, k))
    )
    scene, adam, stats, _ = run(scene, adam, stats, jax.random.PRNGKey(0))

    psnr1, _ = evaluate_psnr(scene, test_cams, cfg, bg)
    assert psnr1 >= 25.0 and psnr1 - psnr0 >= 5.0, (
        f"large GT recovery stalled: {psnr0:.1f} -> {psnr1:.1f} dB"
    )
