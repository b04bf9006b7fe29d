"""Pure-torch RoIAlign matching mmcv.ops.roi_align (CUDA) bit-for-bit in
fp32 up to summation order: aligned=True half-pixel offset, zero outside
[-1, size] with border clamping, avg pooling over sampling_ratio^2 samples
per bin (mmcv/ops/csrc/common/roi_align_cuda_kernel.cuh)."""
from __future__ import annotations

import math

import torch
import torch.nn as nn


def _bilinear_gather(feat, y, x):
    """feat: (C, H, W); y, x: (P,) continuous coords -> (C, P)."""
    c, height, width = feat.shape
    out_of_range = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)
    y = y.clamp(min=0.0)
    x = x.clamp(min=0.0)
    y_low = y.floor().long()
    x_low = x.floor().long()
    y_at_edge = y_low >= height - 1
    x_at_edge = x_low >= width - 1
    y_low = torch.where(y_at_edge, torch.full_like(y_low, height - 1), y_low)
    x_low = torch.where(x_at_edge, torch.full_like(x_low, width - 1), x_low)
    y_eff = torch.where(y_at_edge, y_low.to(y.dtype), y)
    x_eff = torch.where(x_at_edge, x_low.to(x.dtype), x)
    y_high = torch.clamp(y_low + 1, max=height - 1)
    x_high = torch.clamp(x_low + 1, max=width - 1)
    ly = y_eff - y_low.to(y.dtype)
    lx = x_eff - x_low.to(x.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx

    flat = feat.reshape(c, -1)

    def take(yy, xx):
        return flat[:, (yy * width + xx)]

    val = (hy * hx * take(y_low, x_low) + hy * lx * take(y_low, x_high)
           + ly * hx * take(y_high, x_low) + ly * lx * take(y_high, x_high))
    return torch.where(out_of_range[None, :], torch.zeros_like(val), val)


def roi_align(input, rois, output_size, spatial_scale=1.0, sampling_ratio=0,
              pool_mode="avg", aligned=True):
    assert pool_mode == "avg", "shim: only avg pooling"
    if isinstance(output_size, int):
        pooled_h = pooled_w = output_size
    else:
        pooled_h, pooled_w = output_size
    n_rois = rois.shape[0]
    channels = input.shape[1]
    out = input.new_zeros((n_rois, channels, pooled_h, pooled_w))
    offset = 0.5 if aligned else 0.0
    for i in range(n_rois):
        batch_idx = int(rois[i, 0])
        feat = input[batch_idx]
        roi_start_w = float(rois[i, 1]) * spatial_scale - offset
        roi_start_h = float(rois[i, 2]) * spatial_scale - offset
        roi_end_w = float(rois[i, 3]) * spatial_scale - offset
        roi_end_h = float(rois[i, 4]) * spatial_scale - offset
        roi_w = roi_end_w - roi_start_w
        roi_h = roi_end_h - roi_start_h
        if not aligned:
            roi_w = max(roi_w, 1.0)
            roi_h = max(roi_h, 1.0)
        bin_h = roi_h / pooled_h
        bin_w = roi_w / pooled_w
        sr_h = sampling_ratio if sampling_ratio > 0 else int(
            math.ceil(roi_h / pooled_h))
        sr_w = sampling_ratio if sampling_ratio > 0 else int(
            math.ceil(roi_w / pooled_w))
        count = max(sr_h * sr_w, 1)
        ph = torch.arange(pooled_h, dtype=input.dtype)
        pw = torch.arange(pooled_w, dtype=input.dtype)
        iy = torch.arange(max(sr_h, 1), dtype=input.dtype)
        ix = torch.arange(max(sr_w, 1), dtype=input.dtype)
        # (pooled_h, sr_h) and (pooled_w, sr_w) sample coordinates
        ys = roi_start_h + ph[:, None] * bin_h + (iy[None, :] + 0.5) * (
            bin_h / max(sr_h, 1))
        xs = roi_start_w + pw[:, None] * bin_w + (ix[None, :] + 0.5) * (
            bin_w / max(sr_w, 1))
        yy = ys.reshape(-1, 1, 1, 1).expand(pooled_h * max(sr_h, 1), 1,
                                            pooled_w * max(sr_w, 1), 1)
        xx = xs.reshape(1, 1, -1, 1).expand_as(yy)
        vals = _bilinear_gather(feat, yy.reshape(-1), xx.reshape(-1))
        vals = vals.reshape(channels, pooled_h, max(sr_h, 1), pooled_w,
                            max(sr_w, 1))
        out[i] = vals.sum(dim=(2, 4)) / count
    return out


class RoIAlign(nn.Module):
    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                 pool_mode="avg", aligned=True, use_torchvision=False):
        super().__init__()
        # mmcv normalizes via torch.nn.modules.utils._pair
        self.output_size = ((output_size, output_size)
                            if isinstance(output_size, int) else output_size)
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        self.pool_mode = pool_mode
        self.aligned = aligned

    def forward(self, input, rois):
        return roi_align(input, rois, self.output_size, self.spatial_scale,
                         self.sampling_ratio, self.pool_mode, self.aligned)
