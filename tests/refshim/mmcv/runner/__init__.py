"""mmcv.runner shim: BaseModule/init_cfg plumbing + fp16 no-op decorators.

For parity tests the fp16 decorators are identities (everything runs fp32 on
CPU), and BaseModule's recursive init_weights is faithful enough for the
init_cfg kinds the loaded modules declare (the tests export state_dicts from
torch's default random init anyway, so init values never affect parity)."""
from __future__ import annotations

import copy
import functools
import warnings
from collections import defaultdict

import torch.nn as nn

from ..utils import Registry


def _identity_decorator_factory(*dargs, **dkwargs):
    """force_fp32 / auto_fp16: used as @force_fp32(apply_to=(...)) or bare."""
    if len(dargs) == 1 and callable(dargs[0]) and not dkwargs:
        return dargs[0]

    def wrap(fn):
        @functools.wraps(fn)
        def inner(*args, **kwargs):
            return fn(*args, **kwargs)

        return inner

    return wrap


force_fp32 = _identity_decorator_factory
auto_fp16 = _identity_decorator_factory


def get_dist_info():
    import torch.distributed as dist

    if dist.is_available() and dist.is_initialized():
        return dist.get_rank(), dist.get_world_size()
    return 0, 1


def load_checkpoint(model, filename, map_location=None, strict=False,
                    logger=None, **kwargs):
    import torch

    state = torch.load(filename, map_location=map_location or "cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    model.load_state_dict(state, strict=strict)
    return state


_load_checkpoint = load_checkpoint


class BaseModule(nn.Module):
    """mmcv/runner/base_module.py — nn.Module + init_cfg."""

    def __init__(self, init_cfg=None):
        super().__init__()
        self._is_init = False
        self.init_cfg = copy.deepcopy(init_cfg)

    @property
    def is_init(self):
        return self._is_init

    def init_weights(self):
        if self._is_init:
            return
        if self.init_cfg is not None:
            cfgs = self.init_cfg
            if isinstance(cfgs, dict):
                cfgs = [cfgs]
            for cfg in cfgs:
                _apply_init_cfg(self, cfg)
        for m in self.children():
            if hasattr(m, "init_weights"):
                m.init_weights()
        self._is_init = True


def _apply_init_cfg(module, cfg):
    from ..cnn import (constant_init, kaiming_init, normal_init,
                       trunc_normal_init, uniform_init, xavier_init)

    kind = cfg.get("type")
    if kind == "Pretrained":
        # parity tests never load pretrained torch checkpoints through this
        # path; leave torch's default init in place.
        warnings.warn("shim BaseModule: ignoring Pretrained init_cfg "
                      f"({cfg.get('checkpoint')})")
        return
    table = {"Constant": constant_init, "Kaiming": kaiming_init,
             "Normal": normal_init, "TruncNormal": trunc_normal_init,
             "Uniform": uniform_init, "Xavier": xavier_init}
    fn = table.get(kind)
    if fn is None:
        warnings.warn(f"shim BaseModule: unsupported init_cfg {kind}, "
                      "keeping torch default init")
        return
    layer_kinds = cfg.get("layer")
    kwargs = {k: v for k, v in cfg.items()
              if k not in ("type", "layer", "override")}
    if layer_kinds:
        if isinstance(layer_kinds, str):
            layer_kinds = [layer_kinds]
        for m in module.modules():
            if type(m).__name__ in layer_kinds:
                fn(m, **kwargs)


class Sequential(BaseModule, nn.Sequential):
    def __init__(self, *args, init_cfg=None):
        BaseModule.__init__(self, init_cfg)
        nn.Sequential.__init__(self, *args)


class ModuleList(BaseModule, nn.ModuleList):
    def __init__(self, modules=None, init_cfg=None):
        BaseModule.__init__(self, init_cfg)
        nn.ModuleList.__init__(self, modules)


HOOKS = Registry("hook")


class Hook:
    pass


class OptimizerHook(Hook):
    def __init__(self, grad_clip=None):
        self.grad_clip = grad_clip


class EvalHook(Hook):
    def __init__(self, *a, **k):
        pass


class DistEvalHook(EvalHook):
    pass
