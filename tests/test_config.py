"""Config/flag-system contract: group defaults, shorthand aliases, sentinel
mode, and cfg_args persistence + merge (reference arguments/__init__.py)."""

import os
from argparse import ArgumentParser

from gaussian_transformer_tpu.config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    get_combined_args,
    save_cfg_args,
)


class TestParamGroups:
    def test_defaults_and_shorthands(self):
        parser = ArgumentParser()
        lp = ModelParams(parser)
        op = OptimizationParams(parser)
        pp = PipelineParams(parser)
        # Shorthand aliases work and map to the long names.
        args = parser.parse_args(["-s", "/scenes/x", "-m", "/out/y", "-w", "-r", "2"])
        assert args.source_path == "/scenes/x"
        assert args.model_path == "/out/y"
        assert args.white_background is True
        assert args.resolution == 2
        # Untouched defaults survive (fork's sh_degree=1; 3DGS schedule).
        assert args.sh_degree == 1
        assert args.iterations == 30_000
        assert args.densify_grad_threshold == 0.0002
        assert args.convert_SHs_python is False
        # extract() slices per group and absolutizes source_path.
        d = lp.extract(args)
        assert d.source_path == os.path.abspath("/scenes/x")
        assert d.white_background is True
        assert not hasattr(d, "iterations")
        o = op.extract(args)
        assert o.iterations == 30_000 and not hasattr(o, "source_path")
        p = pp.extract(args)
        assert p.debug is False and not hasattr(p, "sh_degree")

    def test_sentinel_mode_defaults_none(self):
        parser = ArgumentParser()
        ModelParams(parser, sentinel=True)
        args = parser.parse_args(["-s", "/x"])
        assert args.source_path == "/x"
        assert args.model_path is None  # sentinel: "not given" is observable
        assert args.sh_degree is None

    def test_bool_flags_are_store_true(self):
        parser = ArgumentParser()
        ModelParams(parser)
        args = parser.parse_args(["--eval"])
        assert args.eval is True
        assert parser.parse_args([]).eval is False


class TestCfgArgs:
    def test_save_and_merge(self, tmp_path):
        model_dir = str(tmp_path / "model")
        # Training persists its merged config...
        parser = ArgumentParser()
        ModelParams(parser)
        train_args = parser.parse_args(["-s", "/scenes/x", "-m", model_dir, "--eval"])
        save_cfg_args(model_dir, train_args)
        assert os.path.isfile(os.path.join(model_dir, "cfg_args"))

        # ...and a later tool merges its CLI over it (CLI wins where given).
        parser2 = ArgumentParser()
        ModelParams(parser2, sentinel=True)
        merged = get_combined_args(parser2, ["-m", model_dir, "-r", "4"])
        assert merged.source_path == "/scenes/x"  # from cfg_args
        assert merged.eval is True  # from cfg_args
        assert merged.resolution == 4  # CLI override

    def test_missing_cfg_args_is_tolerated(self, tmp_path):
        parser = ArgumentParser()
        ModelParams(parser, sentinel=True)
        merged = get_combined_args(parser, ["-m", str(tmp_path / "nope")])
        assert merged.model_path == str(tmp_path / "nope")
