"""Config / flag system.

Behavioral parity with the reference's reflection-based flag registry
(``/root/reference/arguments/__init__.py``): dataclass-style param groups whose
attributes become argparse arguments (a leading ``_`` marks a one-letter
shorthand), the same three groups with identical defaults (note the fork's
``sh_degree=1``), and ``cfg_args`` persistence merged under the CLI.

TPU-native differences:
  * ``data_device`` defaults to the JAX default device (the reference hardcodes
    "cuda").
  * The persisted ``cfg_args`` Namespace string is parsed with ``ast`` instead
    of ``eval`` (the reference ``eval()``s it, arguments/__init__.py:104).
"""

from __future__ import annotations

import ast
import os
import sys
from argparse import ArgumentParser, Namespace


class GroupParams:
    pass


class ParamGroup:
    """Declarative flag group: subclass ``__init__`` assigns attributes, and
    each one becomes an argparse option whose type/default come from the
    assigned value. Contract (matching arguments/__init__.py:19-45): a leading
    underscore adds a one-letter ``-x`` alias, bools become ``store_true``
    flags, and ``fill_none`` registers every default as None (the sentinel
    mode get_combined_args uses to tell "flag given" from "default")."""

    def __init__(self, parser: ArgumentParser, name: str, fill_none: bool = False):
        self._spec = {}  # public flag name -> declared attr name
        group = parser.add_argument_group(name)
        for attr, default in list(vars(self).items()):
            if attr == "_spec":
                continue
            flag = attr[1:] if attr.startswith("_") else attr  # strip exactly one _
            self._spec[flag] = attr
            names = [f"--{flag}"] + ([f"-{flag[0]}"] if attr.startswith("_") else [])
            opts = {"default": None if fill_none else default}
            if isinstance(default, bool):
                opts["action"] = "store_true"
            else:
                opts["type"] = type(default)
            group.add_argument(*names, **opts)

    def extract(self, args) -> GroupParams:
        """Pull this group's flags out of a parsed (or merged) namespace."""
        group = GroupParams()
        for key, value in vars(args).items():
            if key in self._spec:
                setattr(group, key, value)
        return group


class ModelParams(ParamGroup):
    """Loading parameters (arguments/__init__.py:47-62; sh_degree default is the
    fork's 1, not upstream's 3)."""

    def __init__(self, parser, sentinel: bool = False):
        self.sh_degree = 1
        self._source_path = ""
        self._model_path = ""
        self._images = "images"
        self._resolution = -1
        self._white_background = False
        self.data_device = "jax"
        self.eval = False
        super().__init__(parser, "Loading Parameters", sentinel)

    def extract(self, args) -> GroupParams:
        g = super().extract(args)
        g.source_path = os.path.abspath(g.source_path)
        return g


class PipelineParams(ParamGroup):
    def __init__(self, parser):
        self.convert_SHs_python = False
        self.compute_cov3D_python = False
        self.debug = False
        super().__init__(parser, "Pipeline Parameters")


class OptimizationParams(ParamGroup):
    """The full 3DGS optimization schedule (arguments/__init__.py:71-90)."""

    def __init__(self, parser):
        self.iterations = 30_000
        self.position_lr_init = 0.00016
        self.position_lr_final = 0.0000016
        self.position_lr_delay_mult = 0.01
        self.position_lr_max_steps = 30_000
        self.feature_lr = 0.0025
        self.opacity_lr = 0.05
        self.scaling_lr = 0.005
        self.rotation_lr = 0.001
        self.percent_dense = 0.01
        self.lambda_dssim = 0.2
        self.densification_interval = 500
        self.opacity_reset_interval = 3000
        self.densify_from_iter = 100
        self.densify_until_iter = 10_000
        self.densify_grad_threshold = 0.0002
        self.random_background = False
        super().__init__(parser, "Optimization Parameters")


def _parse_namespace_literal(text: str) -> Namespace:
    """Safely parse a persisted ``Namespace(key=value, ...)`` repr."""
    tree = ast.parse(text.strip(), mode="eval")
    call = tree.body
    if not (isinstance(call, ast.Call) and getattr(call.func, "id", "") == "Namespace"):
        raise ValueError("cfg_args is not a Namespace(...) literal")
    kwargs = {kw.arg: ast.literal_eval(kw.value) for kw in call.keywords}
    return Namespace(**kwargs)


def get_combined_args(parser: ArgumentParser, argv=None) -> Namespace:
    """CLI args merged OVER the persisted cfg_args in --model_path
    (arguments/__init__.py:92-112)."""
    cmdline = sys.argv[1:] if argv is None else argv
    args_cmdline = parser.parse_args(cmdline)

    cfgfile_string = "Namespace()"
    try:
        cfgfilepath = os.path.join(args_cmdline.model_path, "cfg_args")
        print("Looking for config file in", cfgfilepath)
        with open(cfgfilepath) as cfg_file:
            print("Config file found: {}".format(cfgfilepath))
            cfgfile_string = cfg_file.read()
    except (TypeError, FileNotFoundError):
        print("Config file not found")
    args_cfgfile = _parse_namespace_literal(cfgfile_string)

    merged = vars(args_cfgfile).copy()
    for k, v in vars(args_cmdline).items():
        if v is not None:
            merged[k] = v
    return Namespace(**merged)


def save_cfg_args(model_path: str, args) -> None:
    """Persist the run config the way train.py does (train.py:145-146)."""
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args"), "w") as f:
        f.write(str(Namespace(**vars(args))))
