"""Eval pipeline tests: render.py PNG trees, metrics.py JSON outputs, LPIPS
architecture (with synthesized weights — pretrained ones need network access)."""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from tests.test_render import make_camera, make_scene


def _write_fake_weights(path, net="vgg"):
    from gaussian_transformer_tpu.eval.lpips import VGG16_CFG, VGG16_STAGES, ALEX_CFG

    rng = np.random.RandomState(0)
    out = {}
    if net == "vgg":
        cin, ci, stage_channels = 3, 0, []
        for item in VGG16_CFG:
            if item == "M":
                continue
            out[f"conv{ci}.w"] = rng.randn(item, cin, 3, 3).astype(np.float32) * 0.05
            out[f"conv{ci}.b"] = np.zeros(item, np.float32)
            cin = item
            ci += 1
            if ci in VGG16_STAGES:
                stage_channels.append(item)
    else:
        cin, ci, stage_channels = 3, 0, []
        for item in ALEX_CFG:
            if item == "M":
                continue
            c, k, s, p = item
            out[f"conv{ci}.w"] = rng.randn(c, cin, k, k).astype(np.float32) * 0.05
            out[f"conv{ci}.b"] = np.zeros(c, np.float32)
            cin = c
            ci += 1
            stage_channels.append(c)
    for i, c in enumerate(stage_channels):
        out[f"lin{i}.w"] = np.abs(rng.randn(1, c, 1, 1)).astype(np.float32)
    np.savez(path, **out)


class TestLpips:
    @pytest.mark.parametrize("net", ["vgg", "alex"])
    def test_architecture_runs(self, tmp_path, net, monkeypatch):
        from gaussian_transformer_tpu.eval import lpips as lp

        w = str(tmp_path / f"lpips_{net}.npz")
        _write_fake_weights(w, net)
        monkeypatch.setenv("GT_LPIPS_WEIGHTS", w)
        lp._load.cache_clear()
        assert lp.available(net)
        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.rand(3, 64, 64), jnp.float32)
        b = jnp.asarray(rng.rand(3, 64, 64), jnp.float32)
        same = float(lp.lpips(a, a, net))
        diff = float(lp.lpips(a, b, net))
        assert same == pytest.approx(0.0, abs=1e-6)
        assert diff > 0
        lp._load.cache_clear()

    def test_unavailable_without_weights(self, monkeypatch):
        from gaussian_transformer_tpu.eval import lpips as lp

        monkeypatch.delenv("GT_LPIPS_WEIGHTS", raising=False)
        monkeypatch.chdir("/tmp")
        assert not lp.available("vgg")


class TestRenderAndMetrics:
    def test_render_set_and_evaluate(self, tmp_path, monkeypatch):
        import render as render_cli
        import metrics as metrics_cli
        from gaussian_transformer_tpu.render import RenderConfig

        scene = make_scene(32, seed=0)
        cams = []
        for i in range(3):
            cam = make_camera(width=48, height=32)
            gt = np.asarray(
                np.random.RandomState(i).rand(3, 32, 48), dtype=np.float32
            )
            cams.append(cam.replace(original_image=jnp.asarray(gt)))

        model_path = str(tmp_path / "model")
        render_cli.render_set(
            model_path, "test", 7, cams, scene, RenderConfig(max_per_tile=32), jnp.zeros(3)
        )
        renders = sorted(os.listdir(os.path.join(model_path, "test/ours_7/renders")))
        gts = sorted(os.listdir(os.path.join(model_path, "test/ours_7/gt")))
        assert renders == ["00000.png", "00001.png", "00002.png"] == gts

        monkeypatch.delenv("GT_LPIPS_WEIGHTS", raising=False)
        metrics_cli.evaluate([model_path])
        with open(os.path.join(model_path, "results.json")) as f:
            results = json.load(f)
        assert "ours_7" in results
        m = results["ours_7"]
        assert 0 <= m["SSIM"] <= 1
        assert np.isfinite(m["PSNR"])
        assert m["LPIPS"] is None
        with open(os.path.join(model_path, "per_view.json")) as f:
            per_view = json.load(f)
        assert set(per_view["ours_7"]["PSNR"].keys()) == set(renders)
