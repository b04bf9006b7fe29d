"""Pure-torch equivalent of mmcv.ops.sigmoid_focal_loss (the CUDA op).

The CUDA kernel takes integer class targets and computes, per (row, class):
  FL = -alpha_t * (1 - p_t)^gamma * log(p_t)
with the convention that class == target is positive and every other class
negative (mmcv/ops/csrc/sigmoid_focal_loss_cuda_kernel.cuh).  On CPU the
vendored mmdet FocalLoss never reaches this op (it dispatches to
py_sigmoid_focal_loss), but the shim implements it faithfully anyway."""
from __future__ import annotations

import torch
import torch.nn.functional as F


def sigmoid_focal_loss(pred, target, gamma=2.0, alpha=0.25, weight=None,
                       reduction="mean"):
    num_classes = pred.size(1)
    onehot = F.one_hot(target.long(), num_classes=num_classes + 1)
    onehot = onehot[:, :num_classes].type_as(pred)
    p = pred.sigmoid()
    pt = (1 - p) * onehot + p * (1 - onehot)
    focal_weight = (alpha * onehot + (1 - alpha) * (1 - onehot)) * pt.pow(gamma)
    loss = F.binary_cross_entropy_with_logits(
        pred, onehot, reduction="none") * focal_weight
    if weight is not None:
        loss = loss * weight.view(-1, 1)
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def softmax_focal_loss(*a, **k):
    raise NotImplementedError("mmcv shim: softmax focal loss unused")
