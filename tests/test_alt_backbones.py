"""Shape/jit tests for the alternative backbone/neck capability set
(STDC nets, flow-aligned FPN with deformable conv) and grid-sample parity
with torch."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.models.aligned_fpn import UperNetAlignHead
from polyphonicformer_tpu.models.stdc import STDCNet, stdcnet813, stdcnet1446
from polyphonicformer_tpu.ops.grid_sample import flow_warp, grid_sample_bilinear


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(0)
    feat = rng.randn(1, 4, 8, 12).astype(np.float32)  # NCHW for torch
    grid = (rng.rand(1, 6, 10, 2).astype(np.float32) * 2.4 - 1.2)
    want = F.grid_sample(torch.from_numpy(feat), torch.from_numpy(grid),
                         align_corners=True).numpy()[0]  # (C, Ho, Wo)
    got = grid_sample_bilinear(jnp.asarray(feat[0].transpose(1, 2, 0)),
                               jnp.asarray(grid[0]))
    np.testing.assert_allclose(np.asarray(got).transpose(2, 0, 1), want,
                               atol=1e-5)


def test_flow_warp_matches_torch_reference_math():
    rng = np.random.RandomState(1)
    feat = rng.randn(2, 8, 12, 3).astype(np.float32)
    flow = rng.randn(2, 8, 12, 2).astype(np.float32) * 2
    got = np.asarray(flow_warp(jnp.asarray(feat), jnp.asarray(flow), (8, 12)))
    # torch oracle implementing the reference's flow_warp
    t_in = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    t_flow = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    out_h, out_w = 8, 12
    norm = torch.tensor([[[[out_w, out_h]]]]).float()
    hh = torch.linspace(-1.0, 1.0, out_h).view(-1, 1).repeat(1, out_w)
    ww = torch.linspace(-1.0, 1.0, out_w).repeat(out_h, 1)
    grid = torch.cat((ww.unsqueeze(2), hh.unsqueeze(2)), 2)
    grid = grid.repeat(2, 1, 1, 1)
    grid = grid + t_flow.permute(0, 2, 3, 1) / norm
    want = F.grid_sample(t_in, grid, align_corners=True).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


@pytest.mark.parametrize("factory,name", [(stdcnet813, "813"),
                                          (stdcnet1446, "1446")])
def test_stdc_backbone_shapes(factory, name):
    model = factory(base=32)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = jax.jit(lambda v, a: model.apply(v, a))(variables, x)
    assert len(feats) == 4
    hs = [f.shape[1] for f in feats]
    assert hs == [16, 8, 4, 2], (name, hs)  # strides 4/8/16/32
    ch = [f.shape[-1] for f in feats]
    assert ch == [32, 128, 256, 512]


def test_upernet_align_head():
    head = UperNetAlignHead(out_channels=64)
    feats = [jnp.zeros((1, 16, 32, 64)), jnp.zeros((1, 8, 16, 128)),
             jnp.zeros((1, 4, 8, 256)), jnp.zeros((1, 2, 4, 512))]
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = jax.jit(lambda v, f: head.apply(v, f))(variables, feats)
    assert out.shape == (1, 8, 16, 64)  # stride-8 fused map
    assert np.isfinite(np.asarray(out)).all()


def test_upernet_align_head_v2():
    head = UperNetAlignHead(out_channels=64, align_type="v2")
    feats = [jnp.zeros((1, 16, 32, 64)), jnp.zeros((1, 8, 16, 128)),
             jnp.zeros((1, 4, 8, 256)), jnp.zeros((1, 2, 4, 512))]
    variables = head.init(jax.random.PRNGKey(1), feats)
    out = head.apply(variables, feats)
    assert out.shape == (1, 8, 16, 64)
