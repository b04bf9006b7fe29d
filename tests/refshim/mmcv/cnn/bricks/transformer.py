"""mmcv.cnn.bricks.transformer shim (mmcv 1.3.18 semantics).

MultiheadAttention / FFN follow mmcv/cnn/bricks/transformer.py exactly for
the call patterns the reference uses (self-attention over (num_query, bs, C)
tensors, identity residual, num_fcs=2 FFN).  State-dict layout matches:
``attn.in_proj_weight`` etc. inside MultiheadAttention, ``layers.0.0`` /
``layers.1`` inside FFN."""
from __future__ import annotations

import warnings

import torch.nn as nn

from ...utils import Registry, build_from_cfg

ATTENTION = Registry("attention")
FEEDFORWARD_NETWORK = Registry("feed-forward Network")
POSITIONAL_ENCODING = Registry("position encoding")
TRANSFORMER_LAYER = Registry("transformerLayer")
TRANSFORMER_LAYER_SEQUENCE = Registry("transformer-layers sequence")
DROPOUT_LAYERS = Registry("drop out layers")


@DROPOUT_LAYERS.register_module(name="Dropout")
class _Dropout(nn.Dropout):
    def __init__(self, drop_prob=0.0, inplace=False):
        super().__init__(p=drop_prob, inplace=inplace)


@DROPOUT_LAYERS.register_module(name="DropPath")
class _DropPath(nn.Module):
    """Stochastic depth (mmcv/cnn/bricks/drop.py semantics): per-sample
    residual drop in train mode; identity in eval."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        import torch

        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x * mask / keep


def build_dropout(cfg, default_args=None):
    return build_from_cfg(cfg, DROPOUT_LAYERS, default_args)


def build_attention(cfg, default_args=None):
    return build_from_cfg(cfg, ATTENTION, default_args)


def build_feedforward_network(cfg, default_args=None):
    return build_from_cfg(cfg, FEEDFORWARD_NETWORK, default_args)


def build_positional_encoding(cfg, default_args=None):
    return build_from_cfg(cfg, POSITIONAL_ENCODING, default_args)


def build_transformer_layer(cfg, default_args=None):
    return build_from_cfg(cfg, TRANSFORMER_LAYER, default_args)


@ATTENTION.register_module()
class MultiheadAttention(nn.Module):
    """Wrapper of torch nn.MultiheadAttention with identity residual
    (mmcv/cnn/bricks/transformer.py:MultiheadAttention, v1.3.18)."""

    def __init__(self, embed_dims, num_heads, attn_drop=0.0, proj_drop=0.0,
                 dropout_layer=dict(type="Dropout", drop_prob=0.0),
                 init_cfg=None, batch_first=False, **kwargs):
        super().__init__()
        if "dropout" in kwargs:
            warnings.warn("dropout is deprecated, use attn_drop")
            attn_drop = kwargs.pop("dropout")
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.batch_first = batch_first
        self.attn = nn.MultiheadAttention(embed_dims, num_heads, attn_drop,
                                          **kwargs)
        self.proj_drop = nn.Dropout(proj_drop)
        self.dropout_layer = (build_dropout(dropout_layer)
                              if dropout_layer else nn.Identity())

    def forward(self, query, key=None, value=None, identity=None,
                query_pos=None, key_pos=None, attn_mask=None,
                key_padding_mask=None, **kwargs):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if key_pos is None and query_pos is not None:
            if query_pos.shape == key.shape:
                key_pos = query_pos
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos
        if self.batch_first:
            query = query.transpose(0, 1)
            key = key.transpose(0, 1)
            value = value.transpose(0, 1)
        out = self.attn(query=query, key=key, value=value,
                        attn_mask=attn_mask,
                        key_padding_mask=key_padding_mask)[0]
        if self.batch_first:
            out = out.transpose(0, 1)
        return identity + self.dropout_layer(self.proj_drop(out))


@FEEDFORWARD_NETWORK.register_module()
class FFN(nn.Module):
    """2-layer feed-forward with identity residual (mmcv 1.3.18 FFN)."""

    def __init__(self, embed_dims=256, feedforward_channels=1024, num_fcs=2,
                 act_cfg=dict(type="ReLU", inplace=True), ffn_drop=0.0,
                 dropout_layer=None, add_identity=True, init_cfg=None,
                 **kwargs):
        super().__init__()
        if "dropout" in kwargs:
            warnings.warn("dropout is deprecated, use ffn_drop")
            ffn_drop = kwargs.pop("dropout")
        assert num_fcs >= 2
        self.embed_dims = embed_dims
        self.feedforward_channels = feedforward_channels
        self.num_fcs = num_fcs
        self.act_cfg = act_cfg

        from .. import build_activation_layer

        self.activate = build_activation_layer(act_cfg)
        layers = []
        in_channels = embed_dims
        for _ in range(num_fcs - 1):
            layers.append(nn.Sequential(
                nn.Linear(in_channels, feedforward_channels), self.activate,
                nn.Dropout(ffn_drop)))
            in_channels = feedforward_channels
        layers.append(nn.Linear(feedforward_channels, embed_dims))
        layers.append(nn.Dropout(ffn_drop))
        self.layers = nn.Sequential(*layers)
        self.dropout_layer = (build_dropout(dropout_layer)
                              if dropout_layer else nn.Identity())
        self.add_identity = add_identity

    def forward(self, x, identity=None):
        out = self.layers(x)
        if not self.add_identity:
            return self.dropout_layer(out)
        if identity is None:
            identity = x
        return identity + self.dropout_layer(out)


def build_transformer_layer_sequence(cfg, default_args=None):
    return build_from_cfg(cfg, TRANSFORMER_LAYER_SEQUENCE, default_args)


class BaseTransformerLayer(nn.Module):
    """Skeleton base for mmdet's DETR layer subclasses: their class
    DEFINITIONS execute at import of mmdet/models/utils/transformer.py, but
    the Polyphonic/Swin graph never instantiates them."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError(
            "refshim: BaseTransformerLayer is import-only")


class TransformerLayerSequence(nn.Module):
    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError(
            "refshim: TransformerLayerSequence is import-only")


class MultiScaleDeformableAttention(nn.Module):
    def __init__(self, *args, **kwargs):
        super().__init__()
        raise NotImplementedError(
            "refshim: MultiScaleDeformableAttention is import-only")
