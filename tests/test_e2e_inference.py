"""End-to-end integration: tiny model -> streaming video inference ->
frame dumps -> DVPQ aggregation; plus the image-mode eval path."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import ModelConfig
from polyphonicformer_tpu.evalutils.dvpq import evaluate_dvpq, save_frame
from polyphonicformer_tpu.evalutils.vpq import INSTANCE_DIVISOR
from polyphonicformer_tpu.infer.pipeline import make_image_step, make_video_step
from polyphonicformer_tpu.infer.tracker import init_tracker_state
from polyphonicformer_tpu.models import PolyphonicFormer

H, W = 64, 128


@pytest.fixture(scope="module")
def tiny_video_model():
    cfg = ModelConfig(out_channels=64, in_channels=64, fpn_out_channels=64,
                      feedforward_channels=128, num_proposals=20,
                      max_per_img=20, with_track=True)
    model = PolyphonicFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                           method=PolyphonicFormer.init_all)
    return cfg, model, variables


def test_streaming_video_to_dvpq(tiny_video_model, tmp_path):
    cfg, model, variables = tiny_video_model
    step = make_video_step(model, cfg, (H, W))
    state = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)
    rng = np.random.RandomState(0)

    eval_dir = str(tmp_path / "eval")
    for seq in range(2):
        state = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)
        for t in range(3):
            x = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
            fo, state = step(variables, x, state, jnp.int32(t + 1))
            sem = np.asarray(fo.semantic)
            track = np.asarray(fo.track_map)
            depth = np.asarray(fo.depth)
            assert sem.shape == (H, W) and track.shape == (H, W)
            assert sem.min() >= 0 and sem.max() <= cfg.num_classes
            assert np.isfinite(depth).all()
            assert depth.min() >= 0.0 and depth.max() <= 80.01
            # track ids only on thing pixels
            thing_pix = sem < cfg.num_thing_classes
            assert (track[~thing_pix] == 0).all()
            pred_pan = sem.astype(np.int64) * INSTANCE_DIVISOR + track.astype(np.int64)
            # synthetic GT: reuse predictions with noise for a nonzero PQ
            save_frame(eval_dir, "pred", seq, t, pred_pan, depth)
            save_frame(eval_dir, "gt", seq, t, pred_pan, depth)

    results = evaluate_dvpq(eval_dir, num_classes=cfg.num_classes,
                            num_things=cfg.num_thing_classes, nproc=1,
                            windows=(1, 2), depth_thrs=(0.0, 0.25))
    # pred == gt -> perfect PQ on every present class; average over
    # present+absent classes must still be positive and <= 1
    assert 0 < results["k1_linf"]["pq"] <= 100.0
    assert results["average"]["pq"] > 0


def test_image_step_consistency(tiny_video_model):
    cfg, model, variables = tiny_video_model
    step = make_image_step(model, cfg, (H, W))
    x = jnp.asarray(np.random.RandomState(1).randn(1, H, W, 3), np.float32)
    res = step(variables, x)
    pan = np.asarray(res.panoptic)
    sem = np.asarray(res.semantic)
    keep = np.asarray(res.keep)
    seg_ids = np.asarray(res.seg_ids)
    labels = np.asarray(res.labels)
    # every nonzero panoptic id corresponds to a kept candidate with that id
    for sid in np.unique(pan):
        if sid == 0:
            continue
        cand = np.nonzero(keep & (seg_ids == sid))[0]
        assert len(cand) == 1
        assert (sem[pan == sid] == labels[cand[0]]).all()


def test_batched_video_step(tiny_video_model):
    from polyphonicformer_tpu.infer.pipeline import (
        init_batched_tracker_states,
        make_batched_video_step,
    )

    cfg, model, variables = tiny_video_model
    b = 3
    step = make_batched_video_step(model, cfg, (H, W))
    states = init_batched_tracker_states(cfg, b)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(b, H, W, 3), jnp.float32)
    fo, states = step(variables, x, states, jnp.ones((b,), jnp.int32))
    assert fo.semantic.shape == (b, H, W)
    assert fo.track_map.shape == (b, H, W)
    assert np.isfinite(np.asarray(fo.depth)).all()
    # independent sequences: tracker ids are per-state
    assert np.asarray(states.num_tracklets).shape == (b,)


def test_image_step_bf16_close_to_f32(tiny_video_model):
    """bf16 image serving path (XLA fusion on CPU; Pallas+render on TPU)
    produces near-identical maps to the reference-exact f32 path."""
    cfg, model, variables = tiny_video_model
    step32 = make_image_step(model, cfg, (H, W))
    step16 = make_image_step(model, cfg, (H, W),
                             compute_dtype=jnp.bfloat16,
                             fusion_dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.RandomState(2).randn(1, H, W, 3), np.float32)
    a = step32(variables, x)
    b = step16(variables, x)
    sem_mismatch = (np.asarray(a.semantic) != np.asarray(b.semantic)).mean()
    assert sem_mismatch < 0.1, sem_mismatch
    assert np.isfinite(np.asarray(b.depth)).all()
