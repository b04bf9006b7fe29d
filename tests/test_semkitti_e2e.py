"""SemKITTI-DVPS end-to-end: scanner tolerance for the SemKITTI filename
layout (short stems, split class/instance GT, focal-suffixed depth),
eval_video through DVPQ + STQ at SemKITTI instance density, and the
track_overflow counter under tracker-capacity pressure.

reference: the semantic_kitti mode flag
(/root/reference/polyphonic/polyphonic_former.py:77-80); the reference repo
itself ships no SemKITTI dataset class — the layout here follows the
SemKITTI-DVPS release (ViP-DeepLab):
  {seq:06d}_{frame:06d}_leftImg8bit.png
  {seq:06d}_{frame:06d}_gtFine_class.png       (trainIds, 255 void)
  {seq:06d}_{frame:06d}_gtFine_instance.png    (in-class instance id)
  {seq:06d}_{frame:06d}_depth_{focal}.png
"""
import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

N_INST = 20  # SemKITTI-like density: 20+ things per frame


def write_semkitti_dataset(root, split="val", num_seqs=2, frames_per_seq=3,
                           h=128, w=256):
    import cv2

    d = os.path.join(root, "video_sequence", split)
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for seq in range(num_seqs):
        for t in range(frames_per_seq):
            stem = f"{seq:06d}_{t:06d}"
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(os.path.join(d, f"{stem}_leftImg8bit.png"), img)
            cls = np.zeros((h, w), np.uint8)  # road
            cls[: h // 4] = 10  # sky
            cls[-6:, -6:] = 255  # void
            inst = np.zeros((h, w), np.uint16)
            # 20 small cars in a grid, ids stable across frames (shifted by t)
            k = 0
            for gy in range(4):
                for gx in range(5):
                    k += 1
                    y = h // 4 + 4 + gy * (3 * h // 16)
                    x = 4 + gx * (w // 5) + 2 * t
                    cls[y:y + 8, x:x + 16] = 13  # car trainId
                    inst[y:y + 8, x:x + 16] = k
            cv2.imwrite(os.path.join(d, f"{stem}_gtFine_class.png"), cls)
            cv2.imwrite(os.path.join(d, f"{stem}_gtFine_instance.png"), inst)
            depth = (rng.rand(h, w) * 60 + 1) * 256
            cv2.imwrite(os.path.join(d, f"{stem}_depth_718.8560180664062.png"),
                        depth.astype(np.uint16))
    return root


@pytest.fixture(scope="module")
def semkitti_root(tmp_path_factory):
    return write_semkitti_dataset(str(tmp_path_factory.mktemp("semkitti")))


def test_scanner_parses_semkitti_layout(semkitti_root):
    from polyphonicformer_tpu.data.cityscapes_dvps import (
        NUM_THING, CityscapesDVPSDataset, INSTANCE_DIVISOR)

    ds = CityscapesDVPSDataset(semkitti_root, split="val",
                               ref_sample_mode="img", with_depth=True)
    assert len(ds.images) == 6
    info = ds.images[0]
    assert info["seq_id"] == 0 and info["img_id"] == 0
    assert "depth_718" in info["depth"]
    assert info["ann"].endswith("gtFine_class.png")
    frame = ds.load_frame(info)
    # 20 cars (thing-first label 2 = car) + road + sky
    assert (frame["labels"] == 2).sum() == N_INST
    assert frame["masks"].shape[0] == N_INST + 2
    # pan ids carry class * divisor + instance; void region excluded
    assert (frame["pan"] // INSTANCE_DIVISOR == 255).any()
    assert frame["depth"].max() <= 80.0
    # things dominate label set at this density (tracker pressure is real)
    assert (frame["labels"] < NUM_THING).sum() >= 20


def test_eval_video_cli_semkitti_dvpq_stq(semkitti_root, tmp_path, monkeypatch):
    """Full eval_video on the SemKITTI-layout tree: semantic_kitti preset
    semantics, DVPQ + STQ aggregation, tracker capacity pressure surfaced
    through track_overflow (max_detections=4 << 20 GT things)."""
    import pickle

    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.tools import eval_video

    cfg = get_preset("debug_tiny_video")
    model = PolyphonicFormer(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)),
                           method=PolyphonicFormer.init_all)
    ckpt = tmp_path / "vars.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, variables), f)

    eval_dir = str(tmp_path / "eval")
    monkeypatch.setattr(sys, "argv", [
        "eval_video", "--data-root", semkitti_root, "--split", "val",
        "--checkpoint", str(ckpt), "--preset", "debug_tiny_video",
        "--eval-dir", eval_dir, "--nproc", "1", "--eval-stq",
        "--set", "model.semantic_kitti=True",
        "model.tracker.max_detections=4"])
    eval_video.main()

    with open(os.path.join(eval_dir, "dvpq.json")) as f:
        results = json.load(f)
    assert np.isfinite(results["average"]["pq"])
    stq = results["stq"]
    assert set(stq) == {"STQ", "AQ", "SQ"}
    assert all(np.isfinite(v) and 0.0 <= v <= 1.0 for v in stq.values())


def test_track_overflow_counter(semkitti_root):
    """When fused thing segments exceed tracker.max_detections the step
    reports the overflow count (infer/pipeline.py track_overflow) instead of
    silently dropping ids."""
    import dataclasses

    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.data.pipeline import make_test_input
    from polyphonicformer_tpu.data.cityscapes_dvps import CityscapesDVPSDataset
    from polyphonicformer_tpu.infer.pipeline import make_video_step
    from polyphonicformer_tpu.infer.tracker import init_tracker_state
    from polyphonicformer_tpu.models import PolyphonicFormer

    exp = get_preset("debug_tiny_video")
    # capacity 1: any frame where fusion keeps >= 2 things must overflow
    exp = dataclasses.replace(exp, model=dataclasses.replace(
        exp.model, tracker=dataclasses.replace(
            exp.model.tracker, max_detections=1, max_tracklets=2)))
    cfg = exp.model
    model = PolyphonicFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)),
                           method=PolyphonicFormer.init_all)

    ds = CityscapesDVPSDataset(semkitti_root, split="val",
                               ref_sample_mode="img", with_depth=True)
    inp = make_test_input(ds.load_frame(ds.images[0]), exp.data)
    step = make_video_step(model, cfg, inp["ori_hw"])
    state = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)
    fo, state = step(variables, jnp.asarray(inp["image"])[None], state,
                     jnp.int32(1))
    # exact contract: overflow == kept thing segments beyond the first
    # max_detections candidate slots
    thing_keep = np.asarray(fo.pano.keep & fo.pano.is_thing)
    take = min(cfg.tracker.max_detections, thing_keep.shape[0])
    expect = int(thing_keep.sum() - thing_keep[:take].sum())
    assert int(fo.track_overflow) == expect
    assert expect >= 0
