"""Native C++ library parity tests (lsap + vpq cores vs scipy / Python)."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from polyphonicformer_tpu.ops import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


@pytest.mark.parametrize("shape", [(5, 5), (10, 40), (60, 100), (100, 100)])
def test_lsap_matches_scipy(shape):
    rng = np.random.RandomState(shape[0])
    cost = rng.randn(*shape).astype(np.float32) * 7
    rows, cols = linear_sum_assignment(cost)
    want = cost[rows, cols].sum()
    row2col = native.lsap_solve(cost)
    assert len(set(row2col.tolist())) == shape[0]
    got = cost[np.arange(shape[0]), row2col].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_vpq_stats_matches_python():
    from polyphonicformer_tpu.evalutils import vpq as pyvpq

    rng = np.random.RandomState(0)
    cat = rng.randint(0, 19, (16, 24))
    inst = np.where(cat < 8, rng.randint(0, 5, (16, 24)) + 1, 0)
    gt = np.kron(cat * 10000 + inst, np.ones((8, 8), np.int64))
    gt[:8, :8] = 255 * 10000
    pred = gt.copy()
    pred[gt == 255 * 10000] = 3 * 10000 + 1
    pred[64:, 64:] = 9 * 10000

    res_native = native.vpq_stats(pred, gt)
    # force the python path by monkeypatching availability
    iou, tp, fn, fp = pyvpq.vpq_eval.__wrapped__(pred, gt) if hasattr(
        pyvpq.vpq_eval, "__wrapped__") else _py_reference(pred, gt)
    for a, b in zip(res_native, (iou, tp, fn, fp)):
        np.testing.assert_allclose(a, b, atol=1e-9)


def _py_reference(pred, gt):
    """Python path of vpq_eval with the native shortcut disabled."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_dataset_utils", "/root/reference/datasets/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.vpq_eval([pred, gt])


def test_depth_void_mask_matches_python():
    from polyphonicformer_tpu.evalutils.vpq import apply_depth_threshold

    rng = np.random.RandomState(1)
    pred_pan = rng.randint(0, 19, (64, 64)).astype(np.int64) * 10000
    gt_depth = (rng.rand(64, 64) * 50).astype(np.float32)
    gt_depth[rng.rand(64, 64) < 0.2] = 0
    pred_depth = np.clip(gt_depth * (1 + rng.randn(64, 64) * 0.3), 0.01, None
                         ).astype(np.float32)
    want = apply_depth_threshold(pred_pan, pred_depth, gt_depth, 0.25)
    got = native.depth_void_mask(pred_pan, pred_depth, gt_depth, 0.25)
    np.testing.assert_array_equal(got, want)
