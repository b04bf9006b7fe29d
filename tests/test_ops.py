"""Golden-value tests for core ops against torch/scipy oracles."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.ops import (
    depth_act,
    match_gt_to_preds,
    gt2pred_to_assignment,
    resize_bilinear,
    resize_nearest,
    solve_lsa,
)


class TestResize:
    @pytest.mark.parametrize("in_hw,out_hw", [
        ((16, 32), (32, 64)),   # 2x up
        ((32, 64), (16, 32)),   # 2x down
        ((17, 33), (40, 21)),   # odd
        ((8, 8), (256, 512)),   # large up
    ])
    def test_bilinear_matches_torch(self, in_hw, out_hw):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, *in_hw).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear",
                             align_corners=False).numpy()
        got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    @pytest.mark.parametrize("in_hw,out_hw", [
        ((16, 32), (4, 8)),
        ((17, 31), (5, 9)),
        ((8, 8), (16, 24)),
    ])
    def test_nearest_matches_torch(self, in_hw, out_hw):
        rng = np.random.RandomState(1)
        x = rng.randn(1, 1, *in_hw).astype(np.float32)
        want = F.interpolate(torch.from_numpy(x), size=out_hw, mode="nearest").numpy()
        got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
        np.testing.assert_array_equal(got, want)


class TestDepthAct:
    def test_modes_match_reference_math(self):
        x = np.linspace(-5, 5, 41).astype(np.float32)
        tx = torch.from_numpy(x)
        # sigmoid mode: disp * (max - min) + min
        want = (torch.sigmoid(tx) * (80.0 - 0.01) + 0.01).numpy()
        got = np.asarray(depth_act(jnp.asarray(x), "sigmoid"))
        np.testing.assert_allclose(got, want, rtol=1e-5)
        # monodepth mode
        disp = torch.sigmoid(tx)
        scaled = 1.0 / 80 + (1.0 / 0.01 - 1.0 / 80) * disp
        want = (1.0 / scaled).numpy()
        got = np.asarray(depth_act(jnp.asarray(x), "monodepth"))
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestHungarian:
    @pytest.mark.parametrize("n", [3, 10, 50, 100])
    def test_square_optimal_cost(self, n):
        rng = np.random.RandomState(n)
        cost = rng.randn(n, n).astype(np.float32) * 10
        rows, cols = linear_sum_assignment(cost)
        want = cost[rows, cols].sum()
        col4row = np.asarray(solve_lsa(jnp.asarray(cost)))
        assert sorted(col4row.tolist()) == list(range(n)), "not a permutation"
        got = cost[np.arange(n), col4row].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    @pytest.mark.parametrize("num_gt,num_pred", [(1, 100), (7, 100), (60, 100), (100, 100)])
    def test_rectangular_matches_scipy(self, num_gt, num_pred):
        rng = np.random.RandomState(num_gt)
        max_gt = 64 if num_gt <= 64 else 100
        cost = rng.randn(max_gt, num_pred).astype(np.float32) * 5
        valid = np.zeros(max_gt, bool)
        valid[:num_gt] = True
        # scipy solves preds x gts like the reference (assigner.py:511-517)
        ref_cost = cost[:num_gt].T  # (P, G)
        rows, cols = linear_sum_assignment(ref_cost)
        want_total = ref_cost[rows, cols].sum()
        gt2pred = np.asarray(match_gt_to_preds(jnp.asarray(cost), jnp.asarray(valid)))
        assert (gt2pred[:num_gt] >= 0).all()
        assert (gt2pred[num_gt:] == -1).all()
        assert len(set(gt2pred[:num_gt].tolist())) == num_gt, "preds must be distinct"
        got_total = cost[np.arange(num_gt), gt2pred[:num_gt]].sum()
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5, atol=1e-4)

    def test_assignment_inversion(self):
        gt2pred = jnp.asarray([5, 2, -1, 7])
        pred2gt = np.asarray(gt2pred_to_assignment(gt2pred, 10))
        want = -np.ones(10, np.int32)
        want[5] = 0
        want[2] = 1
        want[7] = 3
        np.testing.assert_array_equal(pred2gt, want)

    def test_vmap(self):
        rng = np.random.RandomState(0)
        cost = rng.randn(4, 20, 30).astype(np.float32)
        valid = np.ones((4, 20), bool)
        out = jax.vmap(lambda c, v: match_gt_to_preds(c, v))(
            jnp.asarray(cost), jnp.asarray(valid))
        for b in range(4):
            ref_cost = cost[b].T
            rows, cols = linear_sum_assignment(ref_cost)
            want_total = ref_cost[rows, cols].sum()
            got_total = cost[b][np.arange(20), np.asarray(out[b])].sum()
            np.testing.assert_allclose(got_total, want_total, rtol=1e-5, atol=1e-4)


def test_match_scattered_valid_rows_matches_scipy():
    """row_valid fast path (Dijkstras only for VALID rows): scattered —
    non-prefix — validity patterns must still match scipy's optimum on the
    valid submatrix, including under a lockstep vmap with mixed counts."""
    rng = np.random.RandomState(7)
    max_gt, p = 32, 60
    patterns = [
        np.zeros(max_gt, bool),  # no valid rows at all
        (rng.rand(max_gt) < 0.2),
        (rng.rand(max_gt) < 0.7),
        np.ones(max_gt, bool),
    ]
    patterns[1][[0, 31]] = [False, True]  # force a scattered shape
    costs = rng.randn(len(patterns), max_gt, p).astype(np.float32) * 5
    out = jax.vmap(lambda c, v: match_gt_to_preds(c, v))(
        jnp.asarray(costs), jnp.asarray(np.stack(patterns)))
    for b, valid in enumerate(patterns):
        got = np.asarray(out[b])
        assert (got[~valid] == -1).all()
        idx = np.where(valid)[0]
        if len(idx) == 0:
            continue
        sub = costs[b][idx]  # (G, P)
        rows, cols = linear_sum_assignment(sub)
        want_total = sub[rows, cols].sum()
        assert len(set(got[idx].tolist())) == len(idx)
        got_total = sub[np.arange(len(idx)), got[idx]].sum()
        np.testing.assert_allclose(got_total, want_total, rtol=1e-5, atol=1e-4)


def test_solve_lsa_rectangular_direct():
    """Direct rectangular solves (r x n, r<=n) match scipy's optimum."""
    for r, n, seed in [(1, 5, 0), (4, 9, 1), (16, 100, 2), (8, 8, 3)]:
        rng = np.random.RandomState(seed)
        cost = rng.randn(r, n).astype(np.float32) * 7
        rows, cols = linear_sum_assignment(cost)
        want = cost[rows, cols].sum()
        col4row = np.asarray(solve_lsa(jnp.asarray(cost)))
        assert len(set(col4row.tolist())) == r
        got = cost[np.arange(r), col4row].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_multilevel_roi_align_flat_equals_dense():
    """The flattened-pyramid RoIAlign (one gather pass) is numerically
    identical to sampling every level and selecting (the mmcv-parity
    oracle path, itself validated in test_reference_video_parity)."""
    from polyphonicformer_tpu.ops.roi_align import (
        multilevel_roi_align,
        multilevel_roi_align_dense,
    )

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(64 // (2 ** i), 128 // (2 ** i), 16),
                         jnp.float32) for i in range(4)]
    # boxes spanning all FPN levels, incl. degenerate/out-of-range ones
    rois = np.stack([
        rng.uniform(0, 200, 12), rng.uniform(0, 120, 12),
        rng.uniform(0, 512, 12), rng.uniform(0, 256, 12)], axis=1)
    rois = np.sort(rois.reshape(12, 2, 2), axis=1).transpose(0, 2, 1) \
        .reshape(12, 4)[:, [0, 2, 1, 3]]
    rois = jnp.asarray(np.concatenate(
        [rois, [[0, 0, 0, 0]], [[5, 5, 500, 250]]]), jnp.float32)
    a = multilevel_roi_align(feats, rois)
    b = multilevel_roi_align_dense(feats, rois)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_multilevel_roi_align_separable_matches_gather():
    """The separable-matmul RoIAlign (training path: MXU einsums, no
    gather/scatter) matches the flattened-gather formulation to float
    tolerance across levels and edge cases."""
    from polyphonicformer_tpu.ops.roi_align import (
        multilevel_roi_align,
        multilevel_roi_align_separable,
    )

    rng = np.random.RandomState(1)
    feats = [jnp.asarray(rng.randn(64 // (2 ** i), 128 // (2 ** i), 16),
                         jnp.float32) for i in range(4)]
    rois = np.stack([
        rng.uniform(0, 200, 12), rng.uniform(0, 120, 12),
        rng.uniform(0, 512, 12), rng.uniform(0, 256, 12)], axis=1)
    rois = np.sort(rois.reshape(12, 2, 2), axis=1).transpose(0, 2, 1) \
        .reshape(12, 4)[:, [0, 2, 1, 3]]
    rois = jnp.asarray(np.concatenate(
        [rois, [[0, 0, 0, 0]], [[5, 5, 500, 250]], [[-10, -10, 700, 300]]]),
        jnp.float32)
    a = multilevel_roi_align(feats, rois)
    b = multilevel_roi_align_separable(feats, rois)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_roi_align_separable_grad_matches_gather():
    """Feature gradients agree between the two formulations (the whole
    point: the separable bwd is einsums, not a scatter-add)."""
    from polyphonicformer_tpu.ops.roi_align import (
        multilevel_roi_align,
        multilevel_roi_align_separable,
    )

    rng = np.random.RandomState(2)
    feats = [jnp.asarray(rng.randn(32 // (2 ** i), 64 // (2 ** i), 8),
                         jnp.float32) for i in range(4)]
    rois = jnp.asarray([[3.0, 2.0, 60.0, 30.0], [0.0, 0.0, 250.0, 120.0],
                        [10.0, 5.0, 40.0, 90.0]], jnp.float32)
    ct = jnp.asarray(rng.randn(3, 7, 7, 8), jnp.float32)

    def f(fn):
        def loss(fs):
            return (fn(fs, rois) * ct).sum()
        return jax.grad(loss)(feats)

    ga = f(multilevel_roi_align)
    gb = f(multilevel_roi_align_separable)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-4)
