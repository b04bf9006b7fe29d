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


class TestDVPQAggregationOracle:
    """Run the reference's ACTUAL video_evaluate
    (/root/reference/polyphonic/apis/video_evaluate.py:40-111, loaded via
    the refshim with a serial track_parallel_progress stand-in) and our
    evalutils.dvpq.evaluate_dvpq on identical frame dumps, and assert all
    16 (window k, depth threshold lambda) cells agree.  This was the one
    reference code path with no executable parity test (round-3 VERDICT)."""

    def _make_dumps(self, tmp_path):
        import os
        import sys

        import torch

        from polyphonicformer_tpu.evalutils.dvpq import save_frame

        rng = np.random.RandomState(42)
        ref_dir = tmp_path / "ref_eval"
        our_dir = tmp_path / "our_eval"
        for d in (ref_dir / "pred", ref_dir / "gt"):
            os.makedirs(d)

        # 2 sequences x {5, 4} frames, block-structured so windows k=2..4
        # produce real cross-frame segment matches
        frames = [(0, i) for i in range(5)] + [(7, i) for i in range(4)]
        for seq_id, img_id in frames:
            base = random_panoptic(rng, (10, 12))
            gt = np.kron(base, np.ones((5, 5), np.int64))
            predb = base.copy()
            flip = rng.rand(10, 12) < 0.25
            predb[flip] = random_panoptic(rng, (10, 12), void_frac=0.0)[flip]
            predb[predb == 255 * INSTANCE_DIVISOR] = 4 * INSTANCE_DIVISOR
            pred = np.kron(predb, np.ones((5, 5), np.int64))

            gt_depth = (rng.rand(50, 60) * 60 + 1).astype(np.float32)
            gt_depth[rng.rand(50, 60) < 0.15] = 0.0  # invalid-depth pixels
            pred_depth = np.clip(
                gt_depth * (1 + rng.randn(50, 60).astype(np.float32) * 0.3),
                0.01, None)

            # same dtypes as the reference's pre_eval dumps
            # (datasets/cityscapes_dvps.py:336-347: uint32 panseg, f32 depth)
            name = f"{seq_id:06d}_{img_id:06d}.pth"
            torch.save({"panseg": pred.astype(np.uint32),
                        "depth": pred_depth},
                       str(ref_dir / "pred" / name))
            torch.save({"panseg": gt.astype(np.uint32),
                        "depth": gt_depth},
                       str(ref_dir / "gt" / name))
            save_frame(str(our_dir), "pred", seq_id, img_id, pred, pred_depth)
            save_frame(str(our_dir), "gt", seq_id, img_id, gt, gt_depth)
        return str(ref_dir), str(our_dir)

    def test_all_16_cells_match_reference(self, tmp_path, capsys):
        import os
        import re
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "refshim"))
        import ref_loader
        import torch

        # the reference calls bare torch.load on its numpy-array dumps;
        # modern torch defaults weights_only=True, so allowlist numpy
        try:
            from numpy._core.multiarray import _reconstruct
        except ImportError:  # numpy < 2
            from numpy.core.multiarray import _reconstruct
        torch.serialization.add_safe_globals(
            [np.ndarray, np.dtype, _reconstruct,
             np.dtypes.UInt32DType, np.dtypes.Float32DType])

        ref_ve = ref_loader.load_video_evaluate()

        from polyphonicformer_tpu.evalutils.dvpq import evaluate_dvpq

        ref_dir, our_dir = self._make_dumps(tmp_path)
        ref_ve.video_evaluate(ref_dir, ["DVPQ"], num_classes=19, num_things=8)
        printed = capsys.readouterr().out

        # parse the reference's per-cell prints in emission order:
        # "Evaluating DVPQ: k={k}; lambda={l}" then "DVPQ : a ... : b ... : c"
        headers = re.findall(r"Evaluating DVPQ: k=(\d+); lambda=([\w.]+)",
                             printed)
        values = re.findall(
            r"DVPQ : ([\d.]+) DVPQ_thing : ([\d.]+) DVPQ_stuff : ([\d.]+)",
            printed)
        assert len(headers) == 16 and len(values) == 16

        ours = evaluate_dvpq(our_dir, nproc=2)
        for (k, lam), (pq, th, st) in zip(headers, values):
            key = f"k{k}_l{lam}"
            got = ours[key]
            # reference prints at 3 decimals -> quantization tolerance
            np.testing.assert_allclose(got["pq"], float(pq), atol=6e-4,
                                       err_msg=key)
            np.testing.assert_allclose(got["pq_thing"], float(th), atol=6e-4,
                                       err_msg=key)
            np.testing.assert_allclose(got["pq_stuff"], float(st), atol=6e-4,
                                       err_msg=key)


def test_metrics_from_stats_matches_evaluate_image():
    """The per-frame stat decomposition used by the sharded EvalHook must
    reproduce evaluate_image exactly (same vpq accumulation + per-frame
    depth means)."""
    from polyphonicformer_tpu.evalutils.dvpq import evaluate_image
    from polyphonicformer_tpu.evalutils.runner import (frame_stats,
                                                       metrics_from_stats)

    rng = np.random.RandomState(3)
    preds, gts, pds, gds = [], [], [], []
    for _ in range(4):
        base = random_panoptic(rng, (12, 16))
        gt = np.kron(base, np.ones((4, 4), np.int64))
        pb = base.copy()
        flip = rng.rand(12, 16) < 0.25
        pb[flip] = random_panoptic(rng, (12, 16), void_frac=0.0)[flip]
        pb[pb == 255 * INSTANCE_DIVISOR] = 2 * INSTANCE_DIVISOR
        preds.append(np.kron(pb, np.ones((4, 4), np.int64)))
        gts.append(gt)
        gd = (rng.rand(48, 64) * 60 + 1).astype(np.float32)
        gd[rng.rand(48, 64) < 0.1] = 0.0
        gds.append(gd)
        pds.append(np.clip(gd * (1 + 0.2 * rng.randn(48, 64)), 0.01,
                           None).astype(np.float32))

    want = evaluate_image(preds, gts, pds, gds)
    stats = [frame_stats(p, g, dp, dg)
             for p, g, dp, dg in zip(preds, gts, pds, gds)]
    got = metrics_from_stats(np.stack([s[0] for s in stats]),
                             np.stack([s[1] for s in stats]))
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, rtol=1e-12, err_msg=k)


def test_packed_depth_dump_roundtrip(tmp_path):
    """Frame dumps may store depth packed as uint16 on the Cityscapes-DVPS
    disk grid (meters * 256). GT depth (itself loaded from that grid,
    clamped at 80 m) roundtrips losslessly; float32 dumps pass through
    unchanged; DVPQ over a mixed pred(f32)/gt(u16) eval dir matches the
    all-f32 result exactly when the values sit on the grid."""
    from polyphonicformer_tpu.evalutils.dvpq import (evaluate_dvpq,
                                                     list_frames,
                                                     load_depth_dump,
                                                     save_frame)

    rng = np.random.RandomState(0)
    # on-grid depths, exactly like load_depth's output (u16/256, <=80)
    depth = np.minimum(
        np.round(rng.rand(24, 32).astype(np.float32) * 90 * 256) / 256, 80.0
    ).astype(np.float32)
    gt_pan = random_panoptic(rng, (24, 32))
    pred = gt_pan.copy()
    pred[rng.rand(24, 32) < 0.2] = 2 * INSTANCE_DIVISOR
    pdep = np.clip(depth * (1 + 0.3 * rng.randn(24, 32)), 0.01, 80.0
                   ).astype(np.float32)
    pdep_grid = np.round(pdep * 256) / 256  # pred values on the u16 grid

    a, b = str(tmp_path / "f32"), str(tmp_path / "u16")
    for root, enc in ((a, lambda d: d.astype(np.float32)),
                      (b, lambda d: np.round(d * 256).astype(np.uint16))):
        save_frame(root, "gt", 0, 0, gt_pan, enc(depth))
        save_frame(root, "pred", 0, 0, pred, enc(pdep_grid))

    fu16 = np.load(list_frames(b, "gt")[0])
    np.testing.assert_array_equal(load_depth_dump(fu16), depth)
    ff32 = np.load(list_frames(a, "gt")[0])
    np.testing.assert_array_equal(load_depth_dump(ff32), depth)

    ra = evaluate_dvpq(a, nproc=1, windows=(1,))
    rb = evaluate_dvpq(b, nproc=1, windows=(1,))
    for k in ra:
        np.testing.assert_allclose(rb[k]["pq"], ra[k]["pq"], rtol=1e-12,
                                   err_msg=k)


def test_dvpq_uint16_quantization_invariance(tmp_path):
    """The eval CLI dumps predicted depth quantized to the uint16 1/256 m
    grid (tools/eval_video.py::pack_outputs); the reference dumps raw f32
    (datasets/cityscapes_dvps.py:336-347).  Run the FULL 16-cell DVPQ
    aggregation on the same synthetic frames saved both ways and assert
    every cell is identical.  The <=2 mm quantization can only flip an
    apply_depth_threshold decision for pixels whose relative error sits
    within ~1/(512*gt) of a lambda threshold; the generator keeps every
    pixel's relative error >=0.04 away from all lambdas (quantization can
    move it by at most 1/(512*1m) ~ 0.002), so equality is guaranteed by
    construction and any divergence is a real dump-format bug."""
    from polyphonicformer_tpu.evalutils.dvpq import evaluate_dvpq, save_frame

    rng = np.random.RandomState(11)
    frames = [(0, i) for i in range(4)] + [(3, i) for i in range(3)]
    a, b = str(tmp_path / "f32"), str(tmp_path / "u16")
    for seq_id, img_id in frames:
        base = random_panoptic(rng, (10, 12))
        gt = np.kron(base, np.ones((5, 5), np.int64))
        pb = base.copy()
        flip = rng.rand(10, 12) < 0.25
        pb[flip] = random_panoptic(rng, (10, 12), void_frac=0.0)[flip]
        pb[pb == 255 * INSTANCE_DIVISOR] = 4 * INSTANCE_DIVISOR
        pred = np.kron(pb, np.ones((5, 5), np.int64))

        # GT on the u16 grid (how real GT is stored); pred raw float32
        gt_depth = np.round((rng.rand(50, 60) * 60 + 1) * 256).astype(
            np.float32) / 256
        gt_depth[rng.rand(50, 60) < 0.15] = 0.0
        # relative errors drawn from levels bounded away from every lambda
        # in {0.1, 0.25, 0.5} by >= 0.04 >> the quantization shift
        levels = np.array([0.0, 0.05, 0.2, 0.4, 0.7], np.float32)
        rel = levels[rng.randint(0, len(levels), (50, 60))]
        sign = np.where(rng.rand(50, 60) < 0.5, -1.0, 1.0).astype(np.float32)
        pred_depth = np.clip(gt_depth * (1 + sign * rel), 0.01, None)

        # exact pack_outputs quantization: round(d * 256) -> uint16
        pred_u16 = np.clip(np.round(pred_depth * 256.0), 0,
                           65535).astype(np.uint16)
        save_frame(a, "gt", seq_id, img_id, gt, gt_depth)
        save_frame(a, "pred", seq_id, img_id, pred, pred_depth)
        save_frame(b, "gt", seq_id, img_id, gt, gt_depth)
        save_frame(b, "pred", seq_id, img_id, pred, pred_u16)

    ra = evaluate_dvpq(a, nproc=2)
    rb = evaluate_dvpq(b, nproc=2)
    assert set(ra) == set(rb) and len([k for k in ra if k != "average"]) == 16
    for cell in ra:
        for name in ra[cell]:
            np.testing.assert_allclose(
                rb[cell][name], ra[cell][name], rtol=1e-12,
                err_msg=f"{cell}/{name}")
