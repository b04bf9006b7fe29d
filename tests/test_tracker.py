"""Tracker parity: jitted fixed-capacity tracker vs a sequential oracle
implementing the reference algorithm
(quasi_dense_embed_tracker.py:47-207) with plain numpy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import TrackerConfig
from polyphonicformer_tpu.infer.tracker import (
    bbox_iou,
    init_tracker_state,
    tracker_step,
)


def np_iou(a, b):
    iw = np.clip(np.minimum(a[:, None, 2], b[None, :, 2]) -
                 np.maximum(a[:, None, 0], b[None, :, 0]), 0, None)
    ih = np.clip(np.minimum(a[:, None, 3], b[None, :, 3]) -
                 np.maximum(a[:, None, 1], b[None, :, 1]), 0, None)
    inter = iw * ih
    aa = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    ab = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    union = aa[:, None] + ab[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


class OracleTracker:
    """Sequential numpy implementation of the reference tracker semantics."""

    def __init__(self, cfg: TrackerConfig):
        self.cfg = cfg
        self.num_tracklets = 0
        self.tracklets = {}
        self.backdrops = []

    def match(self, bboxes, labels, embeds, frame_id):
        cfg = self.cfg
        inds = np.argsort(-bboxes[:, -1], kind="stable")
        bboxes, labels, embeds = bboxes[inds], labels[inds], embeds[inds]
        valids = np.ones(len(bboxes), bool)
        ious = np_iou(bboxes, bboxes)
        for i in range(1, len(bboxes)):
            thr = (cfg.nms_backdrop_iou_thr if bboxes[i, -1] < cfg.obj_score_thr
                   else cfg.nms_class_iou_thr)
            if (ious[i, :i] > thr).any():
                valids[i] = False
        bboxes, labels, embeds = bboxes[valids], labels[valids], embeds[valids]

        ids = np.full(len(bboxes), -1, np.int64)
        if len(bboxes) > 0 and (self.tracklets or self.backdrops):
            memo_embeds, memo_ids, memo_labels = [], [], []
            for tid, tr in self.tracklets.items():
                memo_embeds.append(tr["embed"])
                memo_ids.append(tid)
                memo_labels.append(tr["label"])
            for bd in self.backdrops:
                for j in range(len(bd["embeds"])):
                    memo_embeds.append(bd["embeds"][j])
                    memo_ids.append(-1)
                    memo_labels.append(bd["labels"][j])
            memo_embeds = np.stack(memo_embeds)
            memo_ids = np.asarray(memo_ids)
            memo_labels = np.asarray(memo_labels)
            feats = embeds @ memo_embeds.T
            ex = np.exp(feats - feats.max(1, keepdims=True))
            d2t = ex / ex.sum(1, keepdims=True)
            ex0 = np.exp(feats - feats.max(0, keepdims=True))
            t2d = ex0 / ex0.sum(0, keepdims=True)
            scores = (d2t + t2d) / 2
            if cfg.with_cats:
                scores *= (labels[:, None] == memo_labels[None, :])
            for i in range(len(bboxes)):
                memo_ind = int(scores[i].argmax())
                conf = scores[i, memo_ind]
                tid = memo_ids[memo_ind]
                if conf > cfg.match_score_thr and tid > -1:
                    if bboxes[i, -1] > cfg.obj_score_thr:
                        ids[i] = tid
                        scores[:i, memo_ind] = 0
                        scores[i + 1:, memo_ind] = 0
                    elif conf > cfg.nms_conf_thr:
                        ids[i] = -2
        new = (ids == -1) & (bboxes[:, 4] > cfg.init_score_thr)
        num_news = int(new.sum())
        ids[new] = np.arange(self.num_tracklets, self.num_tracklets + num_news)
        self.num_tracklets += num_news
        self._update(ids, bboxes, embeds, labels, frame_id)
        return bboxes, labels, ids

    def _update(self, ids, bboxes, embeds, labels, frame_id):
        cfg = self.cfg
        for tid, bbox, embed, label in zip(ids[ids > -1], bboxes[ids > -1],
                                           embeds[ids > -1], labels[ids > -1]):
            tid = int(tid)
            if tid in self.tracklets:
                tr = self.tracklets[tid]
                vel = (bbox - tr["bbox"]) / (frame_id - tr["last_frame"])
                tr["embed"] = ((1 - cfg.memo_momentum) * tr["embed"]
                               + cfg.memo_momentum * embed)
                tr["velocity"] = (tr["velocity"] * tr["acc"] + vel) / (tr["acc"] + 1)
                tr["acc"] += 1
                tr["bbox"] = bbox
                tr["last_frame"] = frame_id
                tr["label"] = label
            else:
                self.tracklets[tid] = dict(bbox=bbox, embed=embed, label=label,
                                           last_frame=frame_id,
                                           velocity=np.zeros_like(bbox), acc=0)
        bd_inds = np.nonzero(ids == -1)[0]
        ious = np_iou(bboxes[bd_inds], bboxes)
        keep = []
        for i, ind in enumerate(bd_inds):
            if not (ious[i, :ind] > cfg.nms_backdrop_iou_thr).any():
                keep.append(ind)
        keep = np.asarray(keep, np.int64)
        self.backdrops.insert(0, dict(bboxes=bboxes[keep], embeds=embeds[keep],
                                      labels=labels[keep]))
        for tid in [t for t, tr in self.tracklets.items()
                    if frame_id - tr["last_frame"] >= cfg.memo_tracklet_frames]:
            self.tracklets.pop(tid)
        if len(self.backdrops) > cfg.memo_backdrop_frames:
            self.backdrops.pop()


@pytest.mark.parametrize("seed,backdrop_frames",
                         [(0, 1), (1, 1), (2, 1), (0, 2), (3, 3)])
def test_tracker_matches_oracle(seed, backdrop_frames):
    rng = np.random.RandomState(seed)
    cfg = TrackerConfig(max_tracklets=32, max_detections=16,
                        memo_backdrop_frames=backdrop_frames)
    oracle = OracleTracker(cfg)
    state = init_tracker_state(cfg, embed_dim=8)
    step = jax.jit(lambda s, b, l, e, v, f: tracker_step(cfg, s, b, l, e, v, f))

    for frame in range(1, 7):
        n = rng.randint(2, 10)
        boxes = np.zeros((n, 5), np.float32)
        xy = rng.rand(n, 2) * 80
        wh = rng.rand(n, 2) * 40 + 8
        boxes[:, 0:2] = xy
        boxes[:, 2:4] = xy + wh
        boxes[:, 4] = rng.rand(n)
        labels = rng.randint(0, 3, n)
        embeds = rng.randn(n, 8).astype(np.float32) * 2

        ob, ol, oids = oracle.match(boxes.copy(), labels.copy(), embeds.copy(), frame)

        d = cfg.max_detections
        pb = np.zeros((d, 5), np.float32)
        pl = np.zeros(d, np.int32)
        pe = np.zeros((d, 8), np.float32)
        pv = np.zeros(d, bool)
        pb[:n], pl[:n], pe[:n], pv[:n] = boxes, labels, embeds, True
        state, ids, order, kept = step(state, jnp.asarray(pb), jnp.asarray(pl),
                                       jnp.asarray(pe), jnp.asarray(pv),
                                       jnp.int32(frame))
        ids = np.asarray(ids)
        kept = np.asarray(kept)
        got_ids = ids[kept[:d]][:len(oids)]
        # oracle removes duplicates; ours marks them invalid — compare kept set
        assert kept.sum() == len(ob), f"frame {frame}: kept mismatch"
        np.testing.assert_array_equal(got_ids, oids, err_msg=f"frame {frame}")


def test_bbox_iou_matches_numpy():
    rng = np.random.RandomState(0)
    a = rng.rand(5, 4).astype(np.float32) * 50
    a[:, 2:] += a[:, :2]
    b = rng.rand(7, 4).astype(np.float32) * 50
    b[:, 2:] += b[:, :2]
    np.testing.assert_allclose(np.asarray(bbox_iou(jnp.asarray(a), jnp.asarray(b))),
                               np_iou(a, b), rtol=1e-5)
