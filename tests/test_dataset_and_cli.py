"""Integration over a synthetic on-disk Cityscapes-DVPS dataset: filesystem
scan, PNG decode, augmentation, the train loader, and a real train step on
loader batches (the full tools/train.py path minus the CLI)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def write_synthetic_dataset(root, split="train", num_seqs=2, frames_per_seq=3,
                            h=128, w=256):
    import cv2

    d = os.path.join(root, "video_sequence", split)
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for seq in range(num_seqs):
        for t in range(frames_per_seq):
            stem = f"{seq:06d}_{t:06d}_loc_000019_000000"
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(os.path.join(d, f"{stem}_leftImg8bit.png"), img)
            # panoptic: trainId * 1000 + inst, stuff background + 2 things
            pan = np.full((h, w), 0 * 1000, np.int32)  # road
            pan[: h // 3] = 10 * 1000  # sky
            for i in range(2):
                y, x = 40 + 20 * i, 40 + 60 * i + 5 * t
                pan[y:y + 30, x:x + 40] = 13 * 1000 + (i + 1)  # cars
            pan[-8:, -8:] = 32 * 1000  # no-obj region
            cv2.imwrite(os.path.join(d, f"{stem}_gtFine_instanceTrainIds.png"),
                        pan.astype(np.uint16))
            depth = (rng.rand(h, w) * 60 + 1) * 256
            cv2.imwrite(os.path.join(d, f"{stem}_depth.png"),
                        depth.astype(np.uint16))
    return root


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    return write_synthetic_dataset(str(tmp_path_factory.mktemp("dvps")))


def test_dataset_scan_and_decode(dataset_root):
    from polyphonicformer_tpu.data.cityscapes_dvps import CityscapesDVPSDataset

    ds = CityscapesDVPSDataset(dataset_root, split="train",
                               ref_sample_mode="random", ref_seq_index=(-1, 1))
    assert len(ds) == 6
    frame = ds.load_frame(ds.images[0])
    assert frame["img"].shape == (128, 256, 3)
    assert frame["depth"].max() <= 80.0
    assert (frame["labels"] >= 0).all()
    # things are cars (thing-first label 2), stuff road/sky slots
    assert 2 in frame["labels"].tolist()
    # masks partition the image (minus no-obj)
    total = frame["masks"].sum(0)
    assert total.max() == 1


def test_loader_and_train_step(dataset_root):
    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.data.cityscapes_dvps import CityscapesDVPSDataset
    from polyphonicformer_tpu.data.loader import TrainLoader
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import create_train_state, make_train_step

    cfg = get_preset("debug_tiny_video")
    ds = CityscapesDVPSDataset(dataset_root, split="train",
                               ref_sample_mode="random",
                               ref_seq_index=cfg.data.ref_seq_index)
    loader = TrainLoader(ds, cfg.data, cfg.model, num_workers=1)
    it = iter(loader)
    batch = next(it)
    loader.stop()
    assert batch.image.shape == (1, 128, 256, 3)
    assert batch.ref_image.shape == (1, 128, 256, 3)
    assert batch.gt.thing_masks.shape == (1, cfg.model.max_things, 32, 64)
    assert batch.gt.thing_valid.any()
    # shared instances between frames exist (check_id_match accepted the clip)
    kids = set(batch.gt.thing_inst_ids[0][batch.gt.thing_valid[0]].tolist())
    rids = set(batch.ref_gt.thing_inst_ids[0][batch.ref_gt.thing_valid[0]].tolist())
    assert kids & rids

    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, 128, 256, 3))
    step = make_train_step(model, cfg.model, tx, video=True, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["skipped_nonfinite"]) == 0.0


def test_mp_loader(dataset_root):
    """Process-based loader: shared-memory ring delivers well-formed batches
    identical in structure to the thread loader's."""
    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.data.cityscapes_dvps import CityscapesDVPSDataset
    from polyphonicformer_tpu.data.mp_loader import MPTrainLoader

    cfg = get_preset("debug_tiny_video")
    ds = CityscapesDVPSDataset(dataset_root, split="train",
                               ref_sample_mode="random",
                               ref_seq_index=cfg.data.ref_seq_index)
    loader = MPTrainLoader(ds, cfg.data, cfg.model, num_workers=2, prefetch=4)
    try:
        it = iter(loader)
        for _ in range(3):  # multiple batches: slots get recycled
            batch = next(it)
            assert batch.image.shape == (1, 128, 256, 3)
            # divisor-aligned crops ship uint8; the jitted step normalizes
            # on device (train/step.py::normalize_uint8_image)
            assert batch.image.dtype == np.uint8
            assert batch.ref_image.shape == (1, 128, 256, 3)
            assert batch.ref_image.dtype == np.uint8
            assert batch.gt.thing_masks.shape == (1, cfg.model.max_things, 32, 64)
            assert batch.gt.thing_valid.any()
            assert batch.gt.depth.max() <= cfg.data.max_depth
            kids = set(batch.gt.thing_inst_ids[0][batch.gt.thing_valid[0]].tolist())
            rids = set(batch.ref_gt.thing_inst_ids[0][
                batch.ref_gt.thing_valid[0]].tolist())
            assert kids & rids
    finally:
        loader.stop()


def test_eval_video_cli(dataset_root, tmp_path, monkeypatch):
    """The video eval CLI end to end: synthetic val split -> multi-process
    PNG decode (shared-memory ring) -> clip-mode inference -> DVPQ
    aggregation (reference: tools/test_video.py); and the --clip-len 1
    streaming dispatch path produces IDENTICAL frame dumps (clip mode is a
    lax.scan over the same frame step)."""
    import json
    import pickle
    import sys

    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.tools import eval_video

    write_synthetic_dataset(dataset_root, split="val", num_seqs=2,
                            frames_per_seq=3)
    cfg = get_preset("debug_tiny_video")
    model = PolyphonicFormer(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 256, 3)),
                           method=PolyphonicFormer.init_all)
    ckpt = tmp_path / "vars.pkl"
    with open(ckpt, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, variables), f)

    # clip mode (default --clip-len 6 covers the padded-tail path: 3-frame
    # sequences -> one clip each with 3 padded frames discarded)
    eval_dir = str(tmp_path / "eval")
    monkeypatch.setattr(sys, "argv", [
        "eval_video", "--data-root", dataset_root, "--split", "val",
        "--checkpoint", str(ckpt), "--preset", "debug_tiny_video",
        "--eval-dir", eval_dir, "--nproc", "1", "--workers", "2"])
    eval_video.main()

    with open(os.path.join(eval_dir, "dvpq.json")) as f:
        results = json.load(f)
    assert "average" in results and np.isfinite(results["average"]["pq"])

    # streaming mode: per-frame dispatch, same outputs frame for frame
    stream_dir = str(tmp_path / "eval_stream")
    monkeypatch.setattr(sys, "argv", [
        "eval_video", "--data-root", dataset_root, "--split", "val",
        "--checkpoint", str(ckpt), "--preset", "debug_tiny_video",
        "--eval-dir", stream_dir, "--nproc", "1", "--workers", "1",
        "--clip-len", "1", "--skip-aggregate"])
    eval_video.main()

    from polyphonicformer_tpu.evalutils.dvpq import list_frames, load_depth_dump

    for kind in ("pred", "gt"):
        a_paths = list_frames(eval_dir, kind)
        b_paths = list_frames(stream_dir, kind)
        assert [os.path.basename(p) for p in a_paths] == \
               [os.path.basename(p) for p in b_paths]
        for ap, bp in zip(a_paths, b_paths):
            a, b = np.load(ap), np.load(bp)
            np.testing.assert_array_equal(a["panseg"], b["panseg"], err_msg=ap)
            # scan vs per-frame dispatch compile to different XLA fusions;
            # depth agrees to float-ulp level, not bit-exactly — which on
            # the uint16 dump grid (1/256 m) can flip a boundary pixel by
            # one count
            np.testing.assert_allclose(load_depth_dump(a), load_depth_dump(b),
                                       atol=1.01 / 256, err_msg=ap)


def test_apply_overrides_scalars_and_tuples():
    """Dotted-path overrides coerce to the field's type; tuples accept both
    bare and parenthesized spellings (reference --cfg-options role)."""
    from polyphonicformer_tpu.configs import apply_overrides, get_preset
    from polyphonicformer_tpu.tools.train import parse_overrides

    cfg = get_preset("video_r50_1x")
    out = apply_overrides(cfg, parse_overrides([
        "data.img_size=(128,256)",
        "data.ratio_range=1.0,1.5",
        "schedule.log_interval=7",
        "model.tracker.init_score_thr=0.9",
    ]))
    assert out.data.img_size == (128, 256)
    assert out.data.ratio_range == (1.0, 1.5)
    assert out.schedule.log_interval == 7
    assert abs(out.model.tracker.init_score_thr - 0.9) < 1e-9
