"""Swin backbone numerical parity against the REAL reference mmdet
SwinTransformer (/root/reference/mmdet/models/backbones/swin.py), weights
carried over by the converter's Swin mapping.

Validates every layout convention the converter encodes: qkv head split,
the double_step_seq relative-position-index equivalence (swin.py:64-69),
nn.Unfold channel-major patch merging vs our NHWC position-major flatten
(mmdet/models/utils/transformer.py:325-384), window padding, and the
shifted-window attention mask.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))


def test_swin_matches_reference():
    import torch

    from ref_loader import load_swin

    ref_swin = load_swin()

    torch.manual_seed(0)
    depths, heads, dim = (2, 2), (2, 4), 32
    ref = ref_swin.SwinTransformer(
        embed_dims=dim, depths=depths, num_heads=heads, window_size=7,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        out_indices=(0, 1), convert_weights=False)
    ref.eval()

    x = torch.randn(1, 3, 32, 64)
    with torch.no_grad():
        ref_feats = ref(x)

    # convert: reference state_dict -> flax tree via the converter mapping
    from polyphonicformer_tpu.tools.convert_torch_ckpt import (
        _swin_mapping,
        _transform,
        unflatten_tree,
    )

    sd = {f"backbone.{k}": v.numpy() for k, v in ref.state_dict().items()}
    flat = {}
    for flax_path, (torch_key, kind) in _swin_mapping(depths).items():
        assert torch_key in sd, torch_key
        flat[flax_path.removeprefix("backbone/")] = _transform(
            np.asarray(sd[torch_key]), kind)
    # every reference parameter must be consumed (bijectivity on real keys)
    mapped = {tk for tk, _ in _swin_mapping(depths).values()}
    unmapped = {k for k in sd if k not in mapped
                and "relative_position_index" not in k}
    assert not unmapped, f"unconsumed reference params: {sorted(unmapped)[:8]}"
    params = unflatten_tree(flat)

    import jax

    from polyphonicformer_tpu.models.swin import SwinTransformer

    model = SwinTransformer(dim, depths, heads, window_size=7)
    xn = np.transpose(x.numpy(), (0, 2, 3, 1))  # NCHW -> NHWC
    feats = jax.jit(model.apply)({"params": params}, xn)

    assert len(feats) == len(ref_feats)
    for lvl, (ours, theirs) in enumerate(zip(feats, ref_feats)):
        ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
        np.testing.assert_allclose(
            ours, theirs.numpy(), rtol=1e-4, atol=1e-4,
            err_msg=f"swin level {lvl} diverges from the reference")
