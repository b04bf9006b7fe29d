"""semantic_out_cfg ASPP auxiliary head: forward shape, loss wiring, CE
semantics vs a torch oracle, gradient flow.

reference: /root/reference/polyphonic/kernel_head.py:203-211 (module),
307-309 (forward on x_feats), 385-392 (x2 upsample), 561-566
(loss_aspp_semseg: softmax CE, ignore_index=num_classes, plain mean).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import ModelConfig
from polyphonicformer_tpu.data.loader import synthetic_batch
from polyphonicformer_tpu.losses.cross_entropy import softmax_ce_ignore
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.train.losses import compute_losses

TINY = ModelConfig(out_channels=64, in_channels=64, fpn_out_channels=64,
                   feedforward_channels=128, num_proposals=20, max_things=8,
                   with_semantic_aspp=True, aspp_dilations=(1, 2, 4))
H, W = 64, 128


def _init(cfg):
    model = PolyphonicFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                           method=PolyphonicFormer.init_all)
    return model, variables


def test_aspp_forward_shape_and_loss_key():
    model, variables = _init(TINY)
    out = model.apply(variables, jnp.ones((2, H, W, 3)))
    # stride-8 features -> aspp logits at (H/8, W/8, num_classes)
    assert out.rpn.aspp_seg_preds.shape == (2, H // 8, W // 8, TINY.num_classes)

    batch = synthetic_batch(TINY, 2, hw=(H, W))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    total, losses = compute_losses(TINY, out, batch.gt)
    assert "loss_aspp_semseg" in losses
    assert np.isfinite(float(losses["loss_aspp_semseg"]))
    # the aux loss participates in the total
    assert float(losses["loss_aspp_semseg"]) != 0.0


def test_aspp_disabled_by_default():
    cfg = ModelConfig(out_channels=64, in_channels=64, fpn_out_channels=64,
                      feedforward_channels=128, num_proposals=20, max_things=8)
    model, variables = _init(cfg)
    out = model.apply(variables, jnp.ones((1, H, W, 3)))
    assert out.rpn.aspp_seg_preds is None
    assert "semantic_aspp" not in variables["params"]["rpn_head"]


def test_softmax_ce_ignore_matches_torch_mmdet_semantics():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 9, 11, 19)).astype(np.float32)
    labels = rng.integers(0, 20, size=(2, 9, 11)).astype(np.int64)  # 19=ignore

    ours = float(softmax_ce_ignore(jnp.asarray(logits), jnp.asarray(labels),
                                   ignore_index=19))
    # mmdet cross_entropy: F.cross_entropy(reduction='none', ignore_index)
    # then a plain mean over ALL positions
    t = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        torch.from_numpy(labels), reduction="none", ignore_index=19)
    assert ours == pytest.approx(float(t.mean()), rel=1e-5)


def test_aspp_gradients_flow():
    model, variables = _init(TINY)
    batch = synthetic_batch(TINY, 1, hw=(H, W))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    def loss_fn(params):
        out = model.apply({**variables, "params": params}, batch.image)
        total, _ = compute_losses(TINY, out, batch.gt)
        return total

    grads = jax.grad(loss_fn)(variables["params"])
    g = grads["rpn_head"]["semantic_aspp"]["branch0_conv"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
    g2 = grads["rpn_head"]["semantic_aspp_predict_weight"]
    assert float(jnp.abs(g2).max()) > 0
