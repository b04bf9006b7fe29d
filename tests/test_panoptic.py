"""Panoptic fusion parity: vectorized merge vs a sequential oracle that
follows the reference's greedy loop (kernel_update.py:471-535) literally."""
import numpy as np
import pytest

import jax.numpy as jnp

from polyphonicformer_tpu.configs import ModelConfig
from polyphonicformer_tpu.infer.panoptic import fuse_panoptic, segments_info_host
from polyphonicformer_tpu.ops.depth import depth_act
from polyphonicformer_tpu.ops.resize import resize_bilinear


def oracle_merge(masks, scores, labels, depth_cand, depth_init, num_things,
                 overlap_thr=0.6, instance_score_thr=0.3):
    """Sequential re-implementation of merge_stuff_thing_stuff_joint."""
    k, h, w = masks.shape
    pan = np.zeros((h, w), np.int32)
    depth_all = depth_init.copy()
    prob = scores[:, None, None] * masks
    cur_ids = prob.argmax(0)
    order = np.argsort(-scores, kind="stable")
    seg_id = 0
    infos = []
    for kk in order:
        isthing = labels[kk] < num_things
        if isthing and scores[kk] < instance_score_thr:
            continue
        m = cur_ids == kk
        area = m.sum()
        orig = (masks[kk] >= 0.5).sum()
        if area > 0 and orig > 0:
            if area / orig < overlap_thr:
                continue
            seg_id += 1
            pan[m] = seg_id
            depth_all[m] = depth_cand[kk][m]
            info = {"id": seg_id, "isthing": bool(isthing),
                    "category_id": int(labels[kk])}
            if isthing:
                info["score"] = float(scores[kk])
                info["instance_id"] = int(kk)
            else:
                info["area"] = int(area)
            infos.append(info)
    return pan, depth_all, infos


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fusion_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    cfg = ModelConfig(num_proposals=12, max_per_img=12)
    nq = cfg.num_queries  # 23
    h8, w8 = 16, 32
    out_hw = (64, 128)
    cls_probs = rng.rand(nq, cfg.num_classes).astype(np.float32)
    mask_logits = rng.randn(nq, h8, w8).astype(np.float32) * 3
    depth_logits = rng.randn(nq, h8, w8).astype(np.float32)
    depth_init = rng.randn(h8, w8).astype(np.float32)

    res = fuse_panoptic(cfg, jnp.asarray(cls_probs), jnp.asarray(mask_logits),
                        jnp.asarray(depth_logits), jnp.asarray(depth_init), out_hw)

    # oracle candidate construction (reference get_panoptic ordering)
    nt, npp = cfg.num_thing_classes, cfg.num_proposals
    thing_scores = cls_probs[:npp, :nt].reshape(-1)
    top = np.argsort(-thing_scores, kind="stable")[:cfg.max_per_img]
    mask_idx = top // nt
    labels_t = top % nt
    scores_t = thing_scores[top]
    stuff_scores = np.diagonal(cls_probs[npp:, nt:])
    order_s = np.argsort(-stuff_scores, kind="stable")
    rows = np.concatenate([mask_idx, npp + order_s])
    scores = np.concatenate([scores_t, stuff_scores[order_s]])
    labels = np.concatenate([labels_t, order_s + nt])

    def up(x):
        return np.asarray(resize_bilinear(jnp.asarray(x), out_hw))

    masks = up(1 / (1 + np.exp(-mask_logits[rows])))
    depth_cand = up(np.asarray(depth_act(jnp.asarray(depth_logits[rows]), "sigmoid")))
    depth_init_full = up(np.asarray(
        depth_act(jnp.asarray(depth_init), "sigmoid"))[None])[0]

    pan_o, depth_o, infos_o = oracle_merge(
        masks, scores, labels, depth_cand, depth_init_full, nt,
        cfg.overlap_thr, cfg.instance_score_thr)

    np.testing.assert_array_equal(np.asarray(res.panoptic), pan_o)
    np.testing.assert_allclose(np.asarray(res.depth), depth_o, atol=1e-5)
    infos = segments_info_host(res, nt)
    assert infos == infos_o
    # semantic map agrees with segments
    sem = np.asarray(res.semantic)
    for info in infos_o:
        region = pan_o == info["id"]
        assert (sem[region] == info["category_id"]).all()
    assert (sem[pan_o == 0] == cfg.num_classes).all()


def test_bf16_fusion_close_to_f32():
    """The bf16 serving fusion should agree with the f32 reference path on
    the vast majority of pixels (ties/rounding may flip a few)."""
    import jax.numpy as jnp_

    rng = np.random.RandomState(5)
    cfg = ModelConfig(num_proposals=12, max_per_img=12)
    nq = cfg.num_queries
    h8, w8 = 16, 32
    out_hw = (64, 128)
    cls_probs = jnp.asarray(rng.rand(nq, cfg.num_classes), jnp.float32)
    mask_logits = jnp.asarray(rng.randn(nq, h8, w8) * 3, jnp.float32)
    depth_logits = jnp.asarray(rng.randn(nq, h8, w8), jnp.float32)
    depth_init = jnp.asarray(rng.randn(h8, w8), jnp.float32)

    r32 = fuse_panoptic(cfg, cls_probs, mask_logits, depth_logits, depth_init,
                        out_hw, fusion_dtype=jnp_.float32)
    r16 = fuse_panoptic(cfg, cls_probs, mask_logits, depth_logits, depth_init,
                        out_hw, fusion_dtype=jnp_.bfloat16)
    sem32 = np.asarray(r32.semantic)
    sem16 = np.asarray(r16.semantic)
    agree = (sem32 == sem16).mean()
    assert agree > 0.97, agree
    d32 = np.asarray(r32.depth)
    d16 = np.asarray(r16.depth)
    same = sem32 == sem16
    np.testing.assert_allclose(d16[same], d32[same], rtol=0.03, atol=0.3)
