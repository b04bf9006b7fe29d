"""Shape/jit tests for the full model forward and the training losses."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import ModelConfig
from polyphonicformer_tpu.data.structures import GTSample
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.train.losses import compute_losses

H, W = 64, 128  # tiny input (divisible by 32)
B = 2
MAX_THINGS = 6


def tiny_cfg(**kw):
    return ModelConfig(
        out_channels=64, in_channels=64, fpn_out_channels=64,
        feedforward_channels=128, num_proposals=20, max_things=MAX_THINGS,
        **kw,
    )


def make_gt(rng, cfg, batch=B, h=H // 4, w=W // 4):
    nt, ns = cfg.num_thing_classes, cfg.num_stuff_classes
    thing_masks = (rng.rand(batch, MAX_THINGS, h, w) > 0.8).astype(np.float32)
    thing_valid = np.zeros((batch, MAX_THINGS), bool)
    thing_valid[:, :3] = True
    thing_masks *= thing_valid[:, :, None, None]
    thing_labels = np.where(thing_valid, rng.randint(0, nt, (batch, MAX_THINGS)), -1)
    inst = np.where(thing_valid, rng.randint(0, 1000, (batch, MAX_THINGS)), -1)
    stuff_masks = (rng.rand(batch, ns, h, w) > 0.7).astype(np.float32)
    stuff_valid = rng.rand(batch, ns) > 0.3
    stuff_masks *= stuff_valid[:, :, None, None]
    depth = (rng.rand(batch, h, w) * 70 + 1).astype(np.float32)
    depth *= (rng.rand(batch, h, w) > 0.2)
    valid = (thing_masks.sum(1) + stuff_masks.sum(1) > 0).astype(np.float32)
    return GTSample(
        thing_masks=jnp.asarray(thing_masks),
        thing_labels=jnp.asarray(thing_labels, jnp.int32),
        thing_valid=jnp.asarray(thing_valid),
        thing_inst_ids=jnp.asarray(inst, jnp.int32),
        stuff_masks=jnp.asarray(stuff_masks),
        stuff_valid=jnp.asarray(stuff_valid),
        depth=jnp.asarray(depth),
        valid_mask=jnp.asarray(valid),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_cfg()
    model = PolyphonicFormer(cfg)
    img = jnp.zeros((B, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    return cfg, model, variables


class TestForward:
    def test_output_shapes(self, model_and_vars):
        cfg, model, variables = model_and_vars
        img = jnp.ones((B, H, W, 3), jnp.float32)
        out = jax.jit(lambda v, x: model.apply(v, x))(variables, img)
        nq = cfg.num_queries
        h8, w8 = H // 8, W // 8
        assert out.rpn.mask_preds.shape == (B, nq, h8, w8)
        assert out.rpn.mask_preds_things.shape == (B, cfg.num_proposals, h8, w8)
        assert out.rpn.seg_preds.shape == (B, h8, w8, cfg.num_classes)
        assert out.rpn.depth_pred.shape == (B, h8, w8)
        assert out.rpn.proposal_feats.shape == (B, nq, cfg.out_channels)
        assert len(out.stages) == cfg.num_stages
        for so in out.stages:
            assert so.cls_score.shape == (B, nq, cfg.num_classes)
            assert so.mask_preds.shape == (B, nq, h8, w8)
            assert so.depth_preds.shape == (B, nq, h8, w8)
            assert so.obj_feats.shape == (B, nq, cfg.out_channels)
        for name, arr in [("cls", out.stages[-1].cls_score),
                          ("mask", out.stages[-1].mask_preds),
                          ("depth", out.stages[-1].depth_preds)]:
            assert np.isfinite(np.asarray(arr)).all(), f"{name} has non-finite"

    def test_losses_finite_and_grads_flow(self, model_and_vars):
        cfg, model, variables = model_and_vars
        rng = np.random.RandomState(0)
        gt = make_gt(rng, cfg)
        img = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
        params = variables["params"]
        consts = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            out = model.apply({"params": p, **consts}, img)
            total, losses = compute_losses(cfg, out, gt)
            return total, losses

        (total, losses), grads = jax.jit(
            lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(params)
        assert np.isfinite(float(total)), losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, float(v))
        expected = {"loss_rpn_mask", "loss_rpn_dice", "loss_rpn_rank",
                    "loss_rpn_seg", "loss_rpn_depth", "loss_rpn_depth_dense"}
        for s in range(cfg.num_stages):
            expected |= {f"s{s}_loss_cls", f"s{s}_loss_mask", f"s{s}_loss_dice",
                         f"s{s}_loss_rank", f"s{s}_loss_depth",
                         f"s{s}_pos_acc"}
        assert expected == set(losses.keys())
        # metrics (pos_acc, dense rpn depth) are excluded from the total
        from polyphonicformer_tpu.train.losses import is_metric_key
        opt = sum(float(v) for k, v in losses.items()
                  if not is_metric_key(k))
        np.testing.assert_allclose(float(total), opt, rtol=1e-5)
        # gradients reach both ends of the network
        gnorm = jax.tree_util.tree_map(lambda g: float(jnp.abs(g).max()), grads)
        flat = jax.tree_util.tree_leaves_with_path(grads)
        nonzero = sum(float(jnp.abs(g).sum()) > 0 for _, g in flat)
        assert nonzero > len(flat) * 0.7, "most params should receive grads"
        del gnorm
