"""STQ metric (oracle = the reference's own stq function) and the
sequence/test ref-sampling modes (oracle = reference list-building logic)."""
import importlib.util
import os

import numpy as np
import pytest

REF_UTILS = "/root/reference/datasets/utils.py"


def _load_ref_utils():
    spec = importlib.util.spec_from_file_location("ref_ds_utils", REF_UTILS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(REF_UTILS), reason="no reference")
def test_stq_element_oracle():
    from polyphonicformer_tpu.evalutils.stq import stq_element

    ref = _load_ref_utils()
    rng = np.random.RandomState(0)
    for _ in range(5):
        gt = (rng.randint(0, 19, (40, 60)) * 10000
              + rng.randint(0, 5, (40, 60)))
        gt[rng.rand(40, 60) < 0.05] = 255 * 10000
        pred = (rng.randint(0, 19, (40, 60)) * 10000
                + rng.randint(0, 5, (40, 60)))
        want = ref.stq((pred, gt))
        got = stq_element(pred, gt)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.sort(w.ravel()),
                                          np.sort(np.asarray(g).ravel()))


def test_stq_aggregate_perfect_and_degraded():
    from polyphonicformer_tpu.evalutils.stq import evaluate_stq

    rng = np.random.RandomState(1)
    gt = np.zeros((64, 64), np.int64)
    gt[:32] = 10 * 10000  # stuff (sky)
    gt[40:60, 10:30] = 2 * 10000 + 7  # thing track
    seq = [(gt.copy(), gt.copy()) for _ in range(3)]
    perfect = evaluate_stq([seq])
    assert perfect["STQ"] == pytest.approx(1.0)
    assert perfect["AQ"] == pytest.approx(1.0)
    assert perfect["SQ"] == pytest.approx(1.0)

    # drop the track in frame 2 -> AQ falls, SQ falls a bit
    broken = [f if i != 1 else (np.where(gt == 2 * 10000 + 7, 0, gt), gt)
              for i, f in enumerate(seq)]
    res = evaluate_stq([broken])
    assert res["AQ"] < 1.0 and res["STQ"] < 1.0


def test_sequence_and_test_sampling_modes(tmp_path):
    from test_dataset_and_cli import write_synthetic_dataset

    from polyphonicformer_tpu.data.cityscapes_dvps import CityscapesDVPSDataset

    root = write_synthetic_dataset(str(tmp_path), num_seqs=2, frames_per_seq=5)

    # sequence mode: clip = [key, refs...] only when every offset exists
    ds = CityscapesDVPSDataset(root, split="train",
                               ref_sample_mode="sequence",
                               ref_seq_index=(-1, 1))
    # frames 1..3 of each sequence have both neighbors: 3 clips x 2 seqs
    assert len(ds.samples) == 6
    for clip in ds.samples:
        key = clip[0]
        offs = sorted(c["img_id"] - key["img_id"] for c in clip[1:])
        assert offs == [-1, 1]
        assert all(c["seq_id"] == key["seq_id"] for c in clip)

    # test mode, ref_seq_len_test=1: every frame duplicated as its own ref
    ds1 = CityscapesDVPSDataset(root, split="train", ref_sample_mode="test",
                                ref_seq_len_test=1)
    assert len(ds1.samples) == 10
    assert all(len(s) == 2 and s[0] is s[1] for s in ds1.samples)

    # test mode, chunked (n=2): chunks of n+1 frames, first frame doubled,
    # trailing chunk dropped exactly like the reference loop
    ds2 = CityscapesDVPSDataset(root, split="train", ref_sample_mode="test",
                                ref_seq_len_test=2)
    for s in ds2.samples:
        assert len(s) == 3
        assert s[0]["seq_id"] == s[-1]["seq_id"]
    # replicate the reference loop on the same metadata to pin the count
    images = ds2.images
    seq_id_pre, seq_now, want = -1, [], []
    n = 2
    for im in images:
        if im["seq_id"] != seq_id_pre:
            seq_id_pre = im["seq_id"]
            if seq_now:
                while len(seq_now) < n + 1:
                    seq_now.append(seq_now[-1])
                want.append(seq_now)
            seq_now = [im, im]
        elif len(seq_now) % (n + 1) == 0:
            want.append(seq_now)
            seq_now = [im, im]
        else:
            seq_now.append(im)
    assert len(ds2.samples) == len(want)
    for got, exp in zip(ds2.samples, want):
        assert [g["img_id"] for g in got] == [e["img_id"] for e in exp]
