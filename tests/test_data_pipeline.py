"""Host data-pipeline tests: aug semantics, static collation, rejection."""
import random

import numpy as np
import pytest

from polyphonicformer_tpu.configs import DataConfig, ModelConfig
from polyphonicformer_tpu.data.cityscapes_dvps import (
    NUM_STUFF,
    NUM_THING,
    TRAINID_TO_COCO,
    decode_segments,
    to_coco,
)
from polyphonicformer_tpu.data.label_shift import sem2ins_masks_cityscapes
from polyphonicformer_tpu.data.pipeline import (
    TrainPipeline,
    crop_frame,
    frame_to_sample,
    resize_frame,
)


def make_frame(rng, h=128, w=256, n_things=3):
    """Synthetic frame with a valid partition of thing/stuff segments."""
    sem = rng.randint(8, 19, (h, w))  # stuff everywhere
    inst = np.zeros((h, w), np.int64)
    for i in range(n_things):
        y, x = rng.randint(0, h - 24), rng.randint(0, w - 24)
        sem[y:y + 24, x:x + 24] = rng.randint(0, 8)
        inst[y:y + 24, x:x + 24] = i + 1
    pan = sem * 10000 + inst
    masks, labels, inst_ids = decode_segments(pan)
    depth = (rng.rand(h, w).astype(np.float32) * 60 + 1)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    return dict(img=img, pan=pan, depth=depth, masks=masks, labels=labels,
                inst_ids=inst_ids, seq_id=0, img_id=0)


def test_to_coco_remap():
    pan = np.asarray([[11 * 1000 + 5, 0 * 1000, 32 * 1000]])
    out = to_coco(pan, 10000)
    assert out[0, 0] == TRAINID_TO_COCO[11] * 10000 + 5  # person -> thing 0
    assert TRAINID_TO_COCO[11] == 0
    assert out[0, 1] == TRAINID_TO_COCO[0] * 10000  # road -> stuff slot 8
    assert TRAINID_TO_COCO[0] == NUM_THING
    assert out[0, 2] == 255 * 10000


def test_resize_scales_depth_inversely():
    rng = np.random.RandomState(0)
    f = make_frame(rng)
    out = resize_frame(f, 2.0)
    assert out["img"].shape[:2] == (256, 512)
    np.testing.assert_allclose(out["depth"].max(), f["depth"].max() / 2.0,
                               rtol=1e-5)


def test_crop_drops_empty_instances():
    rng = np.random.RandomState(1)
    f = make_frame(rng)
    out = crop_frame(f, 0, 0, 64, 64)
    assert out is not None
    assert out["masks"].shape[0] == len(out["labels"])
    assert all(m.any() for m in out["masks"])


def test_frame_to_sample_static_shapes():
    rng = np.random.RandomState(2)
    f = make_frame(rng)
    f["img"] = f["img"].astype(np.float32)
    cfg = ModelConfig(max_things=16)
    s = frame_to_sample(f, cfg, (128, 256))
    assert s["thing_masks"].shape == (16, 32, 64)
    assert s["stuff_masks"].shape == (NUM_STUFF, 32, 64)
    assert s["thing_valid"].sum() == (f["labels"] < NUM_THING).sum()
    # stuff slot s holds class 8+s
    for slot in range(NUM_STUFF):
        if s["stuff_valid"][slot]:
            assert s["stuff_masks"][slot].sum() > 0
    assert s["depth"].shape == (32, 64)
    assert s["valid_mask"].max() == 1.0


def test_two_frame_pipeline_accepts_shared_ids():
    rng = np.random.RandomState(3)
    f1 = make_frame(rng)
    f2 = dict(f1)  # identical frame -> ids shared
    dc = DataConfig(img_size=(96, 192), ratio_range=(1.0, 1.2))
    mc = ModelConfig(max_things=16)
    pipe = TrainPipeline(dc, mc)
    out = pipe([f1, f2], random.Random(0))
    assert out is None or len(out) == 2  # crop may reject; accept both


def test_sem2ins_masks_cityscapes():
    sem = np.asarray([[11, 13, 0], [11, 13, 10]])
    inst = np.asarray([[1, 2, 0], [1, 2, 0]])
    masks, labels, _ = sem2ins_masks_cityscapes(sem, inst)
    assert masks.shape[0] == 4
    assert set(labels.tolist()) == {0, 2, 8, 9}  # person=0, car=2, stuff 8+


def test_semkitti_mode_nearest_gt_downsample():
    """semantic_kitti=True downsamples GT masks with torch-nearest (binary
    output) vs the default bilinear soft masks (reference
    polyphonic_former.py:77-80); preset video_r50_semkitti_1x wires it."""
    from polyphonicformer_tpu.configs import get_preset

    exp = get_preset("video_r50_semkitti_1x")
    assert exp.model.semantic_kitti and exp.data.img_size == (384, 1248)

    rng = np.random.RandomState(3)
    f = make_frame(rng)
    f["img"] = f["img"].astype(np.float32)
    s_near = frame_to_sample(f, ModelConfig(max_things=16,
                                            semantic_kitti=True), (128, 256))
    s_bil = frame_to_sample(f, ModelConfig(max_things=16), (128, 256))
    tm = s_near["thing_masks"][s_near["thing_valid"]]
    # nearest keeps masks binary; bilinear produces fractional edge values
    assert set(np.unique(tm)).issubset({0.0, 1.0})
    bl = s_bil["thing_masks"][s_bil["thing_valid"]]
    assert ((bl > 0) & (bl < 1)).any()
    # same instances survive either way
    assert (s_near["thing_valid"] == s_bil["thing_valid"]).all()
