"""mmcv.cnn shim: ConvModule + layer builders + weight init helpers.

Numeric fidelity targets mmcv 1.3.18 (mmcv/cnn/bricks/conv_module.py,
norm.py, activation.py): ConvModule order ('conv','norm','act'),
bias='auto' -> bias iff no norm, norm module registered under the
abbreviation name returned by build_norm_layer ('bn'/'gn'/'ln'+postfix) so
state_dict keys match the real library exactly."""
from __future__ import annotations

import math
import warnings

import torch
import torch.nn as nn

from ..utils import Registry, build_from_cfg

def build_model_from_cfg(cfg, registry, default_args=None):
    """mmcv/cnn/builder.py: list cfg -> Sequential of built modules."""
    import torch.nn as nn

    if isinstance(cfg, list):
        return nn.Sequential(
            *[build_from_cfg(c, registry, default_args) for c in cfg])
    return build_from_cfg(cfg, registry, default_args)


MODELS = Registry("model", build_func=build_model_from_cfg)

# --------------------------------------------------------------------------
# layer builders


def build_conv_layer(cfg, *args, **kwargs):
    if cfg is None:
        return nn.Conv2d(*args, **kwargs)
    cfg = dict(cfg)
    layer_type = cfg.pop("type")
    if layer_type in ("Conv2d", "Conv"):
        return nn.Conv2d(*args, **kwargs, **cfg)
    if layer_type == "Conv1d":
        return nn.Conv1d(*args, **kwargs, **cfg)
    raise KeyError(f"conv shim: unsupported conv type {layer_type}")


_NORM_ABBR = {"BN": "bn", "SyncBN": "bn", "GN": "gn", "LN": "ln",
              "IN": "in", "BN1d": "bn", "BN3d": "bn"}


def build_norm_layer(cfg, num_features, postfix=""):
    cfg = dict(cfg)
    layer_type = cfg.pop("type")
    requires_grad = cfg.pop("requires_grad", True)
    name = _NORM_ABBR[layer_type] + str(postfix)
    if layer_type in ("BN", "SyncBN", "BN2d"):
        layer = nn.BatchNorm2d(num_features, **cfg)
    elif layer_type == "BN1d":
        layer = nn.BatchNorm1d(num_features, **cfg)
    elif layer_type == "GN":
        num_groups = cfg.pop("num_groups")
        layer = nn.GroupNorm(num_channels=num_features,
                             num_groups=num_groups, **cfg)
    elif layer_type == "LN":
        layer = nn.LayerNorm(num_features, **cfg)
    else:
        raise KeyError(f"norm shim: unsupported norm type {layer_type}")
    for param in layer.parameters():
        param.requires_grad = requires_grad
    return name, layer


def build_activation_layer(cfg):
    cfg = dict(cfg)
    layer_type = cfg.pop("type")
    table = {"ReLU": nn.ReLU, "LeakyReLU": nn.LeakyReLU, "GELU": nn.GELU,
             "Sigmoid": nn.Sigmoid, "Tanh": nn.Tanh, "ELU": nn.ELU,
             "ReLU6": nn.ReLU6, "PReLU": nn.PReLU}
    return table[layer_type](**cfg)


def build_plugin_layer(cfg, postfix="", **kwargs):
    raise NotImplementedError(
        "mmcv shim: plugin layers unused by shipped configs")


def build_upsample_layer(cfg, *args, **kwargs):
    cfg = dict(cfg)
    layer_type = cfg.pop("type")
    if layer_type in ("nearest", "bilinear"):
        return nn.Upsample(*args, **kwargs, mode=layer_type, **cfg)
    raise KeyError(f"upsample shim: unsupported type {layer_type}")


def build_padding_layer(cfg, *args, **kwargs):
    cfg = dict(cfg)
    layer_type = cfg.pop("type")
    table = {"zero": nn.ZeroPad2d, "reflect": nn.ReflectionPad2d,
             "replicate": nn.ReplicationPad2d}
    return table[layer_type](*args, **kwargs, **cfg)


# --------------------------------------------------------------------------
# weight init (mmcv/cnn/utils/weight_init.py)


def constant_init(module, val, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def normal_init(module, mean=0, std=1, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def xavier_init(module, gain=1, bias=0, distribution="normal"):
    if hasattr(module, "weight") and module.weight is not None:
        if distribution == "uniform":
            nn.init.xavier_uniform_(module.weight, gain=gain)
        else:
            nn.init.xavier_normal_(module.weight, gain=gain)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def uniform_init(module, a=0, b=1, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.uniform_(module.weight, a, b)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def kaiming_init(module, a=0, mode="fan_out", nonlinearity="relu", bias=0,
                 distribution="normal"):
    if hasattr(module, "weight") and module.weight is not None:
        if distribution == "uniform":
            nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                     nonlinearity=nonlinearity)
        else:
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                    nonlinearity=nonlinearity)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


def trunc_normal_init(module, mean=0, std=1, a=-2, b=2, bias=0):
    if hasattr(module, "weight") and module.weight is not None:
        trunc_normal_(module.weight, mean, std, a, b)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def bias_init_with_prob(prior_prob):
    return float(-math.log((1 - prior_prob) / prior_prob))


class Scale(nn.Module):
    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(scale, dtype=torch.float))

    def forward(self, x):
        return x * self.scale


# --------------------------------------------------------------------------
# ConvModule


class ConvModule(nn.Module):
    """conv/norm/act block; state-dict layout identical to mmcv 1.3.18."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto", conv_cfg=None,
                 norm_cfg=None, act_cfg=dict(type="ReLU"), inplace=True,
                 with_spectral_norm=False, padding_mode="zeros",
                 order=("conv", "norm", "act")):
        super().__init__()
        assert padding_mode == "zeros" and not with_spectral_norm
        self.conv_cfg = conv_cfg
        self.norm_cfg = norm_cfg
        self.act_cfg = act_cfg
        self.inplace = inplace
        self.order = tuple(order)
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        self.with_bias = bias
        if self.with_norm and self.with_bias:
            warnings.warn("ConvModule has norm and bias at the same time")

        self.conv = build_conv_layer(conv_cfg, in_channels, out_channels,
                                     kernel_size, stride=stride,
                                     padding=padding, dilation=dilation,
                                     groups=groups, bias=bias)

        if self.with_norm:
            if self.order.index("norm") > self.order.index("conv"):
                norm_channels = out_channels
            else:
                norm_channels = in_channels
            self.norm_name, norm = build_norm_layer(norm_cfg, norm_channels)
            self.add_module(self.norm_name, norm)
        else:
            self.norm_name = None

        if self.with_activation:
            act_cfg_ = dict(act_cfg)
            if act_cfg_["type"] not in ("Tanh", "PReLU", "Sigmoid",
                                        "HSigmoid", "Swish"):
                act_cfg_.setdefault("inplace", inplace)
            self.activate = build_activation_layer(act_cfg_)

        self.init_weights()

    @property
    def norm(self):
        if self.norm_name:
            return getattr(self, self.norm_name)
        return None

    def init_weights(self):
        if not hasattr(self.conv, "init_weights"):
            if self.with_activation and self.act_cfg["type"] == "LeakyReLU":
                nonlinearity = "leaky_relu"
                a = self.act_cfg.get("negative_slope", 0.01)
            else:
                nonlinearity = "relu"
                a = 0
            kaiming_init(self.conv, a=a, nonlinearity=nonlinearity)
        if self.with_norm:
            constant_init(self.norm, 1, bias=0)

    def forward(self, x, activate=True, norm=True):
        for layer in self.order:
            if layer == "conv":
                x = self.conv(x)
            elif layer == "norm" and norm and self.with_norm:
                x = self.norm(x)
            elif layer == "act" and activate and self.with_activation:
                x = self.activate(x)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("mmcv shim: not used by shipped configs")


class VGG(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("mmcv shim: not used by shipped configs")


def fuse_conv_bn(module):
    raise NotImplementedError("mmcv shim: fuse_conv_bn not implemented")
