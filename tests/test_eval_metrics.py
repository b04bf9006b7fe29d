"""Metric parity tests: our vectorized VPQ/depth metrics vs the reference
implementation (imported from /root/reference as a test oracle only)."""
import importlib.util

import numpy as np
import pytest

# load the reference metric module directly (avoids the mmdet package import)
_spec = importlib.util.spec_from_file_location(
    "ref_dataset_utils", "/root/reference/datasets/utils.py")
_ref = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_ref)
ref_vpq_eval = _ref.vpq_eval
ref_compute_errors = _ref.compute_errors

from polyphonicformer_tpu.evalutils.vpq import (  # noqa: E402
    INSTANCE_DIVISOR,
    apply_depth_threshold,
    compute_depth_errors,
    vpq_eval,
)


def random_panoptic(rng, shape, num_classes=19, num_things=8, void_frac=0.05):
    """Random panoptic map in cat * DIV + inst encoding."""
    cat = rng.randint(0, num_classes, shape)
    inst = np.where(cat < num_things, rng.randint(0, 5, shape) + 1, 0)
    pan = cat * INSTANCE_DIVISOR + inst
    void = rng.rand(*shape) < void_frac
    pan[void] = 255 * INSTANCE_DIVISOR
    return pan.astype(np.int64)


class TestVPQ:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_matches_reference(self, seed):
        rng = np.random.RandomState(seed)
        # block-structured maps so segments have real extent
        base = random_panoptic(rng, (16, 24))
        gt = np.kron(base, np.ones((8, 8), np.int64))
        predb = base.copy()
        flip = rng.rand(16, 24) < 0.2
        # predictions never contain the void class (the model outputs classes
        # 0..18 plus the depth-void 19); keep the generator in-contract
        predb[flip] = random_panoptic(rng, (16, 24), void_frac=0.0)[flip]
        void = predb == 255 * INSTANCE_DIVISOR
        predb[void] = random_panoptic(rng, (16, 24), void_frac=0.0)[void]
        pred = np.kron(predb, np.ones((8, 8), np.int64))

        want = ref_vpq_eval([pred, gt])
        got = vpq_eval(pred, gt)
        for w, g in zip(want, got):
            np.testing.assert_allclose(g, w, atol=1e-9)

    def test_perfect_prediction(self):
        rng = np.random.RandomState(7)
        gt = np.kron(random_panoptic(rng, (8, 12)), np.ones((8, 8), np.int64))
        iou, tp, fn, fp = vpq_eval(gt.copy(), gt)
        assert fn.sum() == 0 and fp.sum() == 0
        np.testing.assert_allclose(iou[:19], tp[:19])


class TestDepthMetrics:
    def test_matches_reference(self):
        rng = np.random.RandomState(0)
        gt = rng.rand(64, 64).astype(np.float32) * 70
        gt[rng.rand(64, 64) < 0.3] = 0
        pred = np.clip(gt + rng.randn(64, 64).astype(np.float32), 0.01, None)
        want = ref_compute_errors(pred, gt)
        got = compute_depth_errors(pred, gt)
        for key in want:
            np.testing.assert_allclose(got[key], want[key], rtol=1e-6)

    def test_depth_threshold_masking(self):
        pred_pan = np.zeros((4, 4), np.int64) + 3 * INSTANCE_DIVISOR
        pred_depth = np.full((4, 4), 10.0, np.float32)
        gt_depth = np.full((4, 4), 10.0, np.float32)
        gt_depth[0, 0] = 0.0  # invalid
        pred_depth[1, 1] = 20.0  # 100% rel error
        out = apply_depth_threshold(pred_pan, pred_depth, gt_depth, 0.5)
        assert out[1, 1] == 19 * INSTANCE_DIVISOR
        assert out[0, 0] == 3 * INSTANCE_DIVISOR
        assert (out == pred_pan).sum() == 15
