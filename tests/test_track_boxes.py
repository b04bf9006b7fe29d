"""Exact-marginal GT track boxes vs the materialized full-res reference path.

The training track head derives RoI boxes from GT masks upsampled x4 and
binarized (reference polyphonic_former_video.py:283-291 + video/utils.py:
39-82).  `gt_track_boxes` computes the same MAD boxes from exact support
marginals at stride 4; these tests require bit-level agreement of the
marginal counts and the boxes against the explicit upsample.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.ops.resize import resize_bilinear
from polyphonicformer_tpu.ops.roi_align import (boxes_mad_from_marginals,
                                                masks_to_boxes_mad,
                                                upsampled_support_marginals)


def _cases():
    rng = np.random.RandomState(0)
    h, w = 32, 48
    cases = []
    # random sparse soft masks
    for d in (0.98, 0.85, 0.5):
        cases.append((rng.rand(5, h, w) * (rng.rand(5, h, w) > d)).astype(
            np.float32))
    # empty mask, full mask, single pixel at each corner, border lines
    m = np.zeros((8, h, w), np.float32)
    m[1] = 1.0
    m[2, 0, 0] = 0.3
    m[3, h - 1, w - 1] = 1.0
    m[4, 0, w - 1] = 0.7
    m[5, h - 1, 0] = 1.0
    m[6, 0, :] = 1.0
    m[7, :, 0] = 1.0
    cases.append(m)
    # multiple runs with holes (marginal counts must respect run structure)
    m2 = np.zeros((2, h, w), np.float32)
    m2[0, 3:5, 4:8] = 1.0
    m2[0, 3:5, 20:23] = 1.0
    m2[1, 10, ::7] = 1.0
    cases.append(m2)
    return cases


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("case", range(5))
def test_marginals_exact(case, factor):
    masks = _cases()[case]
    h, w = masks.shape[1:]
    out_hw = (h * factor, w * factor)
    up = np.asarray(resize_bilinear(jnp.asarray(masks), out_hw)) > 0
    want_row = up.sum(axis=2).astype(np.float32)
    want_col = up.sum(axis=1).astype(np.float32)
    got_row, got_col = upsampled_support_marginals(jnp.asarray(masks), out_hw)
    np.testing.assert_array_equal(np.asarray(got_row), want_row)
    np.testing.assert_array_equal(np.asarray(got_col), want_col)


def test_boxes_match_materialized_path():
    for masks in _cases():
        h, w = masks.shape[1:]
        out_hw = (h * 4, w * 4)
        full = (np.asarray(resize_bilinear(jnp.asarray(masks), out_hw)) > 0
                ).astype(np.float32)
        want = np.asarray(masks_to_boxes_mad(jnp.asarray(full)))
        rc, cc = upsampled_support_marginals(jnp.asarray(masks), out_hw)
        got = np.asarray(boxes_mad_from_marginals(rc, cc))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_video_loss_value_unchanged():
    """The train-path rewrite (boxes instead of materialized masks) must not
    change the track loss: spot-check via gt_track_boxes == boxes(masks)."""
    from polyphonicformer_tpu.train.video_losses import (gt_track_boxes,
                                                         gt_track_masks)
    from tests.test_model_forward import make_gt, tiny_cfg

    rng = np.random.RandomState(3)
    cfg = tiny_cfg()
    gt = make_gt(rng, cfg)
    pad_hw = (64, 128)
    masks = gt_track_masks(gt, pad_hw)
    want = np.asarray(jax.vmap(masks_to_boxes_mad)(masks))
    got = np.asarray(gt_track_boxes(gt, pad_hw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
