"""RoIAlign for track-embedding extraction, TPU-native.

reference: mmcv's CUDA RoIAlign (output_size=7, sampling_ratio=2,
aligned=true) routed through mmdet's SingleRoIExtractor FPN level mapping
(/root/reference/mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:36-55,
configs/polyphonic_video/poly_r50_cityscapes_1x.py:65-71).

TPU reformulation: ROI counts are padded to a static M; every ROI is sampled
from ALL four FPN levels with one vectorized bilinear gather each, then the
per-ROI level selection is a (M, 4) one-hot contraction.  This trades 4x
redundant (cheap, gather-bound) compute for fully static shapes and no
scatter — the standard dense-compute-and-select TPU pattern.

Also provides mask->box conversion matching the reference's center ± 2*MAD
boxes (/root/reference/polyphonic/video/utils.py:39-82).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample(feat: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample feat (H, W, C) at float coords with torchvision roi_align
    boundary semantics (zero outside [-1, H]; clamp into the border)."""
    h, w, c = feat.shape
    valid = (ys >= -1.0) & (ys <= h) & (xs >= -1.0) & (xs <= w)
    y = jnp.clip(ys, 0.0, None)
    x = jnp.clip(xs, 0.0, None)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    over_y = y_low >= h - 1
    over_x = x_low >= w - 1
    y_low = jnp.where(over_y, h - 1, y_low)
    x_low = jnp.where(over_x, w - 1, x_low)
    y = jnp.where(over_y, y_low.astype(y.dtype), y)
    x = jnp.where(over_x, x_low.astype(x.dtype), x)
    y_high = jnp.minimum(y_low + 1, h - 1)
    x_high = jnp.minimum(x_low + 1, w - 1)
    ly = (y - y_low).astype(feat.dtype)
    lx = (x - x_low).astype(feat.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx
    flat = feat.reshape(h * w, c)
    v1 = flat[y_low * w + x_low]
    v2 = flat[y_low * w + x_high]
    v3 = flat[y_high * w + x_low]
    v4 = flat[y_high * w + x_high]
    out = (hy * hx)[..., None] * v1 + (hy * lx)[..., None] * v2 \
        + (ly * hx)[..., None] * v3 + (ly * lx)[..., None] * v4
    return jnp.where(valid[..., None], out, 0.0)


def roi_align_level(feat: jax.Array, rois: jax.Array, out_size: int = 7,
                    sampling_ratio: int = 2, spatial_scale: float = 1.0) -> jax.Array:
    """RoIAlign one feature level. feat: (H, W, C); rois: (M, 4) x1,y1,x2,y2
    in input-image coords. Returns (M, out_size, out_size, C)."""
    m = rois.shape[0]
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = rois[:, 2] * spatial_scale - 0.5
    y2 = rois[:, 3] * spatial_scale - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1
    bin_w = roi_w / out_size
    bin_h = roi_h / out_size
    g = sampling_ratio
    # sample grid: (out, g) offsets within each roi, separable in y and x
    bin_idx = jnp.arange(out_size, dtype=feat.dtype)
    sub_idx = (jnp.arange(g, dtype=feat.dtype) + 0.5) / g
    off = bin_idx[:, None] + sub_idx[None, :]  # (out, g) in units of bins
    ys = y1[:, None, None] + off[None] * bin_h[:, None, None]  # (M, out, g)
    xs = x1[:, None, None] + off[None] * bin_w[:, None, None]
    yy = jnp.broadcast_to(ys[:, :, :, None, None],
                          (m, out_size, g, out_size, g)).reshape(m, -1)
    xx = jnp.broadcast_to(xs[:, None, None, :, :],
                          (m, out_size, g, out_size, g)).reshape(m, -1)
    samples = _bilinear_sample(feat, yy.reshape(-1), xx.reshape(-1))
    c = feat.shape[-1]
    samples = samples.reshape(m, out_size, g, out_size, g, c)
    return samples.mean(axis=(2, 4))


def map_roi_levels(rois: jax.Array, num_levels: int = 4,
                   finest_scale: int = 56) -> jax.Array:
    """mmdet FPN level routing: floor(log2(sqrt(area)/finest + 1e-6))."""
    scale = jnp.sqrt(jnp.maximum(
        (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0.0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align_dense(feats: Sequence[jax.Array], rois: jax.Array,
                               strides: Sequence[int] = (4, 8, 16, 32),
                               out_size: int = 7, sampling_ratio: int = 2,
                               finest_scale: int = 56) -> jax.Array:
    """Reference formulation: sample EVERY level for every RoI, then select
    with a one-hot contraction (kept as the oracle for the flat version)."""
    lvls = map_roi_levels(rois, len(feats), finest_scale)
    per_level = [
        roi_align_level(f, rois, out_size, sampling_ratio, 1.0 / s)
        for f, s in zip(feats, strides)
    ]
    stacked = jnp.stack(per_level, axis=1)  # (M, L, out, out, C)
    onehot = jax.nn.one_hot(lvls, len(feats), dtype=stacked.dtype)
    return jnp.einsum("mlhwc,ml->mhwc", stacked, onehot)


def multilevel_roi_align(feats: Sequence[jax.Array], rois: jax.Array,
                         strides: Sequence[int] = (4, 8, 16, 32),
                         out_size: int = 7, sampling_ratio: int = 2,
                         finest_scale: int = 56) -> jax.Array:
    """RoIAlign with FPN routing. feats: list of (H_l, W_l, C); rois (M, 4).

    Flattened-pyramid formulation: the levels concatenate into one
    (sum H_l*W_l, C) table and each RoI's samples index through a per-RoI
    level offset — one gather pass instead of sampling all 4 levels and
    selecting (4x fewer gathers than the dense-and-select pattern; shapes
    stay fully static).
    """
    import numpy as _np

    num_levels = len(feats)
    c = feats[0].shape[-1]
    dtype = feats[0].dtype
    lvls = map_roi_levels(rois, num_levels, finest_scale)  # (M,)
    hs = jnp.asarray([f.shape[0] for f in feats], jnp.int32)
    ws = jnp.asarray([f.shape[1] for f in feats], jnp.int32)
    offs = jnp.asarray(
        _np.cumsum([0] + [f.shape[0] * f.shape[1] for f in feats])[:-1],
        jnp.int32)
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    flat = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)

    m = rois.shape[0]
    sc = scales[lvls]  # (M,)
    h_l, w_l, off_l = hs[lvls], ws[lvls], offs[lvls]  # (M,)

    x1 = rois[:, 0] * sc - 0.5
    y1 = rois[:, 1] * sc - 0.5
    x2 = rois[:, 2] * sc - 0.5
    y2 = rois[:, 3] * sc - 0.5
    g = sampling_ratio
    bin_idx = jnp.arange(out_size, dtype=jnp.float32)
    sub_idx = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    off = bin_idx[:, None] + sub_idx[None, :]  # (out, g) in units of bins
    ys = y1[:, None, None] + off[None] * ((y2 - y1) / out_size)[:, None, None]
    xs = x1[:, None, None] + off[None] * ((x2 - x1) / out_size)[:, None, None]
    yy = jnp.broadcast_to(ys[:, :, :, None, None],
                          (m, out_size, g, out_size, g)).reshape(m, -1)
    xx = jnp.broadcast_to(xs[:, None, None, :, :],
                          (m, out_size, g, out_size, g)).reshape(m, -1)

    # bilinear with per-RoI level bounds (same semantics as _bilinear_sample)
    hf = h_l[:, None].astype(jnp.float32)
    wf = w_l[:, None].astype(jnp.float32)
    valid = (yy >= -1.0) & (yy <= hf) & (xx >= -1.0) & (xx <= wf)
    y = jnp.clip(yy, 0.0, None)
    x = jnp.clip(xx, 0.0, None)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    over_y = y_low >= h_l[:, None] - 1
    over_x = x_low >= w_l[:, None] - 1
    y_low = jnp.where(over_y, h_l[:, None] - 1, y_low)
    x_low = jnp.where(over_x, w_l[:, None] - 1, x_low)
    y = jnp.where(over_y, y_low.astype(y.dtype), y)
    x = jnp.where(over_x, x_low.astype(x.dtype), x)
    y_high = jnp.minimum(y_low + 1, h_l[:, None] - 1)
    x_high = jnp.minimum(x_low + 1, w_l[:, None] - 1)
    ly = (y - y_low).astype(dtype)
    lx = (x - x_low).astype(dtype)
    hy, hx = 1.0 - ly, 1.0 - lx
    base = off_l[:, None]
    wl = w_l[:, None]
    v1 = flat[base + y_low * wl + x_low]
    v2 = flat[base + y_low * wl + x_high]
    v3 = flat[base + y_high * wl + x_low]
    v4 = flat[base + y_high * wl + x_high]
    out = (hy * hx)[..., None] * v1 + (hy * lx)[..., None] * v2 \
        + (ly * hx)[..., None] * v3 + (ly * lx)[..., None] * v4
    out = jnp.where(valid[..., None], out, 0.0)
    out = out.reshape(m, out_size, g, out_size, g, c)
    return out.mean(axis=(2, 4))


def _interp_axis_matrix(lo: jax.Array, hi: jax.Array, size: int,
                        scale: jax.Array, out_size: int, g: int) -> jax.Array:
    """Per-ROI 1-D interpolation matrix A (M, out_size, size) such that
    ``A @ feat_axis`` reproduces one axis of RoIAlign's bilinear sampling
    (including the sampling_ratio average and the mmcv boundary semantics
    of ``_bilinear_sample``: zero outside [-1, size], clamp at borders).

    lo/hi: (M,) roi start/end in input-image coords; scale: (M,) or scalar
    spatial scale for the target level.
    """
    m = lo.shape[0]
    a = lo * scale - 0.5
    b = hi * scale - 0.5
    bin_sz = (b - a) / out_size
    bin_idx = jnp.arange(out_size, dtype=jnp.float32)
    sub_idx = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    off = bin_idx[:, None] + sub_idx[None, :]  # (out, g) in bins
    coords = a[:, None, None] + off[None] * bin_sz[:, None, None]  # (M,out,g)
    valid = (coords >= -1.0) & (coords <= size)
    x = jnp.clip(coords, 0.0, None)
    x_low = jnp.floor(x).astype(jnp.int32)
    over = x_low >= size - 1
    x_low = jnp.where(over, size - 1, x_low)
    x = jnp.where(over, x_low.astype(x.dtype), x)
    x_high = jnp.minimum(x_low + 1, size - 1)
    lx = x - x_low
    hx = 1.0 - lx
    w_low = jnp.where(valid, hx, 0.0)
    w_high = jnp.where(valid, lx, 0.0)
    mat = (jax.nn.one_hot(x_low, size, dtype=jnp.float32) * w_low[..., None]
           + jax.nn.one_hot(x_high, size, dtype=jnp.float32) * w_high[..., None])
    return mat.mean(axis=2)  # fold the sampling_ratio average: (M, out, size)


def multilevel_roi_align_separable(feats: Sequence[jax.Array], rois: jax.Array,
                                   strides: Sequence[int] = (4, 8, 16, 32),
                                   out_size: int = 7, sampling_ratio: int = 2,
                                   finest_scale: int = 56) -> jax.Array:
    """RoIAlign with FPN routing as per-level separable interpolation
    MATMULS — no gather in the forward and no scatter-add in the backward.

    Bilinear sampling is separable: each RoI's (out, out) grid is
    ``A_y @ feat @ A_x^T`` with per-ROI 1-D interpolation matrices, and the
    sampling_ratio average folds into the matrices.  Per level, rois mapped
    elsewhere get zeroed matrices, and the level outputs sum (exact
    one-hot routing).  Everything is an einsum, so fwd AND bwd run on the
    MXU — this is the training-path formulation, where the backward of the
    gather version is a serialized scatter-add into the P2 grid.  Matches
    ``multilevel_roi_align`` to float tolerance (associativity differs;
    tests/test_ops.py).
    """
    num_levels = len(feats)
    dtype = feats[0].dtype
    lvls = map_roi_levels(rois, num_levels, finest_scale)
    out = None
    for lv, (feat, stride) in enumerate(zip(feats, strides)):
        h, w, _c = feat.shape
        sel = (lvls == lv).astype(jnp.float32)
        scale = jnp.float32(1.0 / stride)
        ay = _interp_axis_matrix(rois[:, 1], rois[:, 3], h, scale,
                                 out_size, sampling_ratio) * sel[:, None, None]
        ax = _interp_axis_matrix(rois[:, 0], rois[:, 2], w, scale,
                                 out_size, sampling_ratio)
        ay = ay.astype(dtype)
        ax = ax.astype(dtype)
        # contract x first (smaller intermediate), then y
        t = jnp.einsum("mxw,hwc->mhxc", ax, feat)
        r = jnp.einsum("myh,mhxc->myxc", ay, t)
        out = r if out is None else out + r
    return out


def masks_to_boxes_mad(masks: jax.Array, extend: float = 2.0) -> jax.Array:
    """Mask -> box via center ± extend * mean-absolute-deviation, matching
    the reference's coords2bboxTensor (video/utils.py:39-82).

    masks: (M, H, W) binary/float. Returns (M, 4) x1,y1,x2,y2 (clamped >= 0,
    empty masks -> zeros), same as batch_mask2boxlist + rois.clamp(min=0).
    """
    mb = masks > 0
    # row/column marginal counts: every moment below reduces over these
    # (2 passes over the full-res masks instead of 5, no f32 mask cast)
    colcount = mb.sum(axis=1).astype(jnp.float32)  # (M, W)
    rowcount = mb.sum(axis=2).astype(jnp.float32)  # (M, H)
    return boxes_mad_from_marginals(rowcount, colcount, extend)


def boxes_mad_from_marginals(rowcount: jax.Array, colcount: jax.Array,
                             extend: float = 2.0) -> jax.Array:
    """Same MAD box from precomputed (M, H)/(M, W) marginal counts — the
    mask moments are separable, so the fusion kernel's marginals replace
    the full-res mask read entirely."""
    _, h = rowcount.shape
    _, w = colcount.shape
    area = colcount.sum(axis=1)
    safe_area = jnp.maximum(area, 1.0)
    ys = jnp.arange(h, dtype=jnp.float32)[None]
    xs = jnp.arange(w, dtype=jnp.float32)[None]
    cy = (rowcount * ys).sum(axis=1) / safe_area
    cx = (colcount * xs).sum(axis=1) / safe_area
    dy = (rowcount * jnp.abs(ys - cy[:, None])).sum(axis=1) / safe_area
    dx = (colcount * jnp.abs(xs - cx[:, None])).sum(axis=1) / safe_area
    dy = jnp.maximum(dy, 1.0)
    dx = jnp.maximum(dx, 1.0)
    x1 = cx - dx * extend
    x2 = cx + dx * extend
    y1 = cy - dy * extend
    y2 = cy + dy * extend
    boxes = jnp.stack([x1, y1, x2, y2], axis=1)
    boxes = jnp.where(area[:, None] > 0, boxes, 0.0)
    return jnp.maximum(boxes, 0.0)


@functools.lru_cache(maxsize=16)
def _support_tables(in_size: int, out_size: int):
    """Constant tables for exact binarized-upsample marginal counts.

    From the align_corners=False bilinear matrix A (out, in) — <= 2 positive
    taps per output row, always adjacent (a, a+1) or a single clamped tap:
      S    (out, in): tap-indicator A > 0
      T    (out, in-1): rows whose tap pair is exactly {a, a+1}
      n1   (in,): number of output rows touching tap a      = S.sum(0)
      n2   (in-1,): number of output rows with pair {a,a+1} = T.sum(0)
    """
    from .resize import _bilinear_matrix

    a = _bilinear_matrix(in_size, out_size) > 0  # (out, in)
    s = a.astype(np.float32)
    t = (a[:, :-1] & a[:, 1:]).astype(np.float32)  # (out, in-1)
    return s, t, s.sum(0), t.sum(0)


def upsampled_support_marginals(masks: jax.Array, out_hw: tuple[int, int]
                                ) -> tuple[jax.Array, jax.Array]:
    """Exact (rowcount, colcount) marginals of the BINARIZED bilinear
    upsample ``resize_bilinear(masks, out_hw) > 0`` without materializing
    the upsampled (M, H, W) volume.

    Support of the upsample is separable per output pixel: up(jy, jx) > 0
    iff any of the <= 2x2 positive-weight taps hits a nonzero source pixel.
    With d = y-dilated support (S_h-OR over rows) the counts reduce by
    per-pixel inclusion-exclusion (OR = a + b - ab, taps always adjacent) to
    small contractions; replaces the reference-semantics full-res GT mask
    materialization in the track-embedding path
    (/root/reference/polyphonic/polyphonic_former_video.py:283-291 +
    video/utils.py:39-82) with bit-identical box statistics.

    masks: (M, h, w); returns rowcount (M, H), colcount (M, W), float32.
    """
    m, h, w = masks.shape
    out_h, out_w = out_hw
    s_h, _, _, _ = _support_tables(h, out_h)
    s_w, t_w, n1, n2 = _support_tables(w, out_w)
    mb = (masks > 0).astype(jnp.float32)
    # y-dilated support: (M, H, w); counts <= 2 so thresholding is exact
    d = (jnp.einsum("Oh,mhw->mOw", jnp.asarray(s_h), mb) > 0
         ).astype(jnp.float32)
    dpair = d[:, :, :-1] * d[:, :, 1:]  # (M, H, w-1) adjacent AND
    rowcount = d @ jnp.asarray(n1) - dpair @ jnp.asarray(n2)  # (M, H)
    cnt = d.sum(axis=1)  # (M, w)
    pair_cnt = dpair.sum(axis=1)  # (M, w-1)
    colcount = (cnt @ jnp.asarray(s_w).T
                - pair_cnt @ jnp.asarray(t_w).T)  # (M, W)
    return rowcount, colcount
