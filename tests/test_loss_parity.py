"""Loss-math parity against torch oracles implementing the reference's
formulas (depth_loss.py, focal/dice/CE from mmdet, qdtrack losses)."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.losses import (
    depth_loss,
    dice_loss_per_row,
    l2_aux_loss,
    masked_bce_mean,
    multi_pos_cross_entropy,
    sigmoid_focal_loss_elements,
    softmax_ce_ignore,
)


def test_focal_elements_match_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(40, 19).astype(np.float32) * 3
    labels = rng.randint(0, 20, 40)  # 19 = background
    onehot = np.eye(20, dtype=np.float32)[labels][:, :19]
    got = np.asarray(sigmoid_focal_loss_elements(
        jnp.asarray(logits), jnp.asarray(onehot), 2.0, 0.25))
    # torch oracle (mmdet py_sigmoid_focal_loss math)
    p = torch.sigmoid(torch.from_numpy(logits))
    t = torch.from_numpy(onehot)
    pt = (1 - p) * t + p * (1 - t)
    fw = (0.25 * t + 0.75 * (1 - t)) * pt.pow(2.0)
    want = (F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), t, reduction="none") * fw).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dice_matches_reference_formula():
    rng = np.random.RandomState(1)
    logits = rng.randn(5, 16, 16).astype(np.float32)
    target = (rng.rand(5, 16, 16) > 0.6).astype(np.float32)
    mask = (rng.rand(16, 16) > 0.2).astype(np.float32)
    got = np.asarray(dice_loss_per_row(
        jnp.asarray(logits), jnp.asarray(target),
        jnp.broadcast_to(jnp.asarray(mask), (5, 16, 16))))
    # torch oracle: index valid pixels then dice (mmdet formula, eps=1e-3)
    tl = torch.from_numpy(logits)
    tt = torch.from_numpy(target)
    tm = torch.from_numpy(mask).bool()
    for i in range(5):
        p = torch.sigmoid(tl[i][tm]).reshape(1, -1)
        t = tt[i][tm].reshape(1, -1)
        a = (p * t).sum(1)
        b = (p * p).sum(1) + 1e-3
        c = (t * t).sum(1) + 1e-3
        want = float(1 - 2 * a / (b + c))
        np.testing.assert_allclose(got[i], want, rtol=1e-5)


def test_masked_bce_matches_torch():
    rng = np.random.RandomState(2)
    logits = rng.randn(6, 8, 8).astype(np.float32)
    target = (rng.rand(6, 8, 8) > 0.5).astype(np.float32)
    mask = rng.rand(6, 8, 8) > 0.3
    got = float(masked_bce_mean(jnp.asarray(logits), jnp.asarray(target),
                                jnp.asarray(mask)))
    tl = torch.from_numpy(logits)[torch.from_numpy(mask)]
    tt = torch.from_numpy(target)[torch.from_numpy(mask)]
    want = float(F.binary_cross_entropy_with_logits(tl, tt))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rank_ce_matches_mmdet_mean_semantics():
    """mmdet divides by the TOTAL element count (ignored pixels included)."""
    rng = np.random.RandomState(3)
    logits = rng.randn(2, 6, 6, 10).astype(np.float32)
    labels = rng.randint(0, 10, (2, 6, 6))
    labels[0, :2] = 255
    got = float(softmax_ce_ignore(jnp.asarray(logits), jnp.asarray(labels), 255))
    tl = torch.from_numpy(logits).permute(0, 3, 1, 2)
    want_el = F.cross_entropy(tl, torch.from_numpy(labels).long(),
                              reduction="none", ignore_index=255)
    want = float(want_el.mean())  # zeros at ignored positions, full denom
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_depth_loss_matches_reference_formula():
    rng = np.random.RandomState(4)
    pred_logits = rng.randn(3, 12, 12).astype(np.float32)
    target = (rng.rand(3, 12, 12) * 90).astype(np.float32)  # some > 80
    weight = (rng.rand(3, 12, 12) > 0.3).astype(np.float32) * \
        rng.rand(3, 12, 12).astype(np.float32)
    got = float(depth_loss(jnp.asarray(pred_logits), jnp.asarray(target),
                           jnp.asarray(weight), loss_weight=5.0,
                           depth_act_mode="sigmoid"))
    # torch oracle (reference depth_loss.py:9-28 + weighted mean of 3 terms)
    pred = torch.sigmoid(torch.from_numpy(pred_logits)) * (80 - 0.01) + 0.01
    t = torch.from_numpy(target)
    w = torch.from_numpy(weight)
    m = (t > 0) & (t < 80) & (w != 0)
    inputs = pred[m]
    targets = t[m]
    n = inputs.shape[0]
    log_minus = (torch.log(inputs) - torch.log(targets)) * w[m]
    minus = (inputs - targets) * w[m]
    si = (log_minus ** 2).sum() / n - log_minus.sum() / n ** 2
    sq = torch.sqrt(((minus / targets) ** 2).sum() / n)
    ab = (minus / targets).abs().sum() / n
    want = float(5.0 * (si + sq + ab) / 3)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_multipos_ce_matches_torch_oracle():
    rng = np.random.RandomState(5)
    pred = rng.randn(4, 6).astype(np.float32)
    target = (rng.rand(4, 6) > 0.6).astype(np.int32)
    target[2] = 0  # row without positives
    valid = np.ones((4, 6), bool)
    got = float(multi_pos_cross_entropy(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(valid),
        jnp.ones(4, bool)))
    # torch oracle (multipos_cross_entropy_loss.py:6-40)
    tp = torch.from_numpy(pred)
    tt = torch.from_numpy(target)
    pos = tt == 1
    neg = tt == 0
    pred_pos = tp.clone()
    pred_neg = tp.clone()
    pred_pos[neg] = float("inf")
    pred_neg[pos] = float("-inf")
    pos_e = torch.repeat_interleave(pred_pos, tp.shape[1], dim=1)
    neg_e = pred_neg.repeat(1, tp.shape[1])
    x = F.pad(neg_e - pos_e, (0, 1), value=0)
    loss = torch.logsumexp(x, dim=1)
    weights = (tt.sum(1) > 0).float()
    want = float((loss * weights).sum() / weights.sum())
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_l2_aux_matches_torch_oracle():
    rng = np.random.RandomState(6)
    cos = (rng.rand(3, 12).astype(np.float32) * 2 - 1)
    target = np.zeros((3, 12), np.int32)
    target[0, 0] = 1
    target[1, 3] = 1
    valid = np.ones((3, 12), bool)
    got = float(l2_aux_loss(jnp.asarray(cos), jnp.asarray(target),
                            jnp.asarray(valid), neg_pos_ub=3, pos_margin=0,
                            neg_margin=0.1, hard_mining=True))
    # torch oracle (l2_loss.py:75-110)
    pred = torch.from_numpy(cos.copy())
    t = torch.from_numpy(target.copy()).float()
    pred[t == 0] -= 0.1
    pred = pred.clamp(0, 1)
    num_pos = int((t == 1).sum())
    num_neg = int((t == 0).sum())
    weight = torch.ones_like(t)
    if num_neg / (num_pos + 1) > 3:
        keep = num_pos * 3
        neg_idx = torch.nonzero(t == 0, as_tuple=False)
        costs = ((pred - t) ** 2)[neg_idx[:, 0], neg_idx[:, 1]]
        top = costs.topk(keep)[1]
        new_neg = torch.zeros_like(t).bool()
        new_neg[neg_idx[top, 0], neg_idx[top, 1]] = True
        invalid = torch.logical_xor(t == 0, new_neg)
        weight[invalid] = 0
        weight[t == 1] = 1
    avg = (weight > 0).sum()
    want = float((((pred - t) ** 2) * weight).sum() / avg)
    np.testing.assert_allclose(got, want, rtol=1e-5)
