"""Quasi-dense embedding tracker as a fixed-capacity, jittable state machine.

reference: /root/reference/polyphonic/video/qdtrack/trackers/
quasi_dense_embed_tracker.py.  The reference grows Python dicts/lists per
frame and runs greedy loops with ``.item()`` syncs; here the tracklet memory
is a static table (max_tracklets slots), backdrops are a static per-frame
buffer, and the only sequential part — greedy ID assignment with column
suppression — is a ``lax.scan`` over detections.

Semantics preserved:
* detections sorted by score; intra-frame duplicate removal against ALL
  higher-scored detections (triangular IoU test, thresholds depending on
  the detection's own score);
* bisoftmax matching restricted to same-category memo entries;
* greedy per-detection argmax with column zeroing for confident matches;
* ids: -1 unmatched, -2 suppressed-by-confident-backdrop-match; new ids for
  unmatched detections above init_score_thr;
* EMA embedding update (momentum), velocity accumulation, tracklet expiry
  after memo_tracklet_frames, memo_backdrop_frames-deep backdrop ring
  (newest block first, like the reference's newest-first list) with IoU
  filtering.
"""
from __future__ import annotations

from typing import Tuple

import flax
import jax
import jax.numpy as jnp

from ..configs import TrackerConfig

_NEG = -1e30


@flax.struct.dataclass
class TrackerState:
    ids: jax.Array  # (T,) int32 track id, -1 = free slot
    embeds: jax.Array  # (T, E)
    bboxes: jax.Array  # (T, 5) x1,y1,x2,y2,score
    labels: jax.Array  # (T,) int32
    last_frame: jax.Array  # (T,) int32
    velocities: jax.Array  # (T, 5)
    acc_frames: jax.Array  # (T,) int32
    num_tracklets: jax.Array  # () int32 — next fresh id
    bd_embeds: jax.Array  # (D, E) backdrops (previous frame)
    bd_bboxes: jax.Array  # (D, 5)
    bd_labels: jax.Array  # (D,)
    bd_valid: jax.Array  # (D,) bool


def init_tracker_state(cfg: TrackerConfig, embed_dim: int) -> TrackerState:
    t, d = cfg.max_tracklets, cfg.max_detections
    # backdrop ring: memo_backdrop_frames blocks of max_detections slots,
    # newest block first (reference keeps a newest-first list,
    # quasi_dense_embed_tracker.py:28,96-99)
    bd = d * cfg.memo_backdrop_frames
    return TrackerState(
        ids=jnp.full((t,), -1, jnp.int32),
        embeds=jnp.zeros((t, embed_dim), jnp.float32),
        bboxes=jnp.zeros((t, 5), jnp.float32),
        labels=jnp.zeros((t,), jnp.int32),
        last_frame=jnp.zeros((t,), jnp.int32),
        velocities=jnp.zeros((t, 5), jnp.float32),
        acc_frames=jnp.zeros((t,), jnp.int32),
        num_tracklets=jnp.zeros((), jnp.int32),
        bd_embeds=jnp.zeros((bd, embed_dim), jnp.float32),
        bd_bboxes=jnp.zeros((bd, 5), jnp.float32),
        bd_labels=jnp.zeros((bd,), jnp.int32),
        bd_valid=jnp.zeros((bd,), bool),
    )


def bbox_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """mmdet-style IoU. a: (N, 4+), b: (M, 4+). Returns (N, M)."""
    ax1, ay1, ax2, ay2 = a[:, 0], a[:, 1], a[:, 2], a[:, 3]
    bx1, by1, bx2, by2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    iw = jnp.clip(jnp.minimum(ax2[:, None], bx2[None]) -
                  jnp.maximum(ax1[:, None], bx1[None]), 0.0)
    ih = jnp.clip(jnp.minimum(ay2[:, None], by2[None]) -
                  jnp.maximum(ay1[:, None], by1[None]), 0.0)
    inter = iw * ih
    area_a = jnp.clip(ax2 - ax1, 0.0) * jnp.clip(ay2 - ay1, 0.0)
    area_b = jnp.clip(bx2 - bx1, 0.0) * jnp.clip(by2 - by1, 0.0)
    union = area_a[:, None] + area_b[None] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def tracker_step(cfg: TrackerConfig, state: TrackerState, bboxes: jax.Array,
                 labels: jax.Array, embeds: jax.Array, det_valid: jax.Array,
                 frame_id: jax.Array
                 ) -> Tuple[TrackerState, jax.Array, jax.Array, jax.Array]:
    """One frame. bboxes: (D, 5) with score in col 4; labels: (D,);
    embeds: (D, E); det_valid: (D,) bool; frame_id: int32 scalar.

    Returns (new_state, ids (D,), order (D,), kept (D,)) in score-sorted
    order; ``order`` maps sorted position -> input index, ``kept`` marks
    detections that survived duplicate removal.
    ids: >=0 track id, -1 unmatched, -2 suppressed.
    """
    d = bboxes.shape[0]
    t = cfg.max_tracklets

    # sort by score desc, invalid last
    sort_key = jnp.where(det_valid, bboxes[:, 4], -jnp.inf)
    order = jnp.argsort(-sort_key)
    bboxes = bboxes[order]
    labels = labels[order]
    embeds = embeds[order]
    det_valid = det_valid[order]

    # intra-frame duplicate removal (triangular IoU vs all higher-scored)
    ious_dd = bbox_iou(bboxes, bboxes)
    tri = jnp.tril(jnp.ones((d, d), bool), k=-1)  # j < i
    thr = jnp.where(bboxes[:, 4] < cfg.obj_score_thr,
                    cfg.nms_backdrop_iou_thr, cfg.nms_class_iou_thr)
    dup = ((ious_dd > thr[:, None]) & tri & det_valid[None, :]).any(axis=1)
    det_valid = det_valid & ~dup

    # memory: tracklets ++ backdrops
    memo_embeds = jnp.concatenate([state.embeds, state.bd_embeds], axis=0)
    memo_labels = jnp.concatenate([state.labels, state.bd_labels])
    memo_ids = jnp.concatenate(
        [state.ids, jnp.full((state.bd_embeds.shape[0],), -1, jnp.int32)])
    memo_valid = jnp.concatenate([state.ids >= 0, state.bd_valid])

    feats = embeds @ memo_embeds.T  # (D, T+D)
    col_mask = memo_valid[None, :]
    row_mask = det_valid[:, None]
    if cfg.match_metric == "bisoftmax":
        d2t = jax.nn.softmax(jnp.where(col_mask, feats, _NEG), axis=1)
        t2d = jax.nn.softmax(jnp.where(row_mask, feats, _NEG), axis=0)
        scores_mat = (d2t + t2d) / 2.0
    elif cfg.match_metric == "softmax":
        scores_mat = jax.nn.softmax(jnp.where(col_mask, feats, _NEG), axis=1)
    else:  # cosine
        en = embeds / jnp.maximum(jnp.linalg.norm(embeds, axis=1, keepdims=True), 1e-12)
        mn = memo_embeds / jnp.maximum(
            jnp.linalg.norm(memo_embeds, axis=1, keepdims=True), 1e-12)
        scores_mat = en @ mn.T
    if cfg.with_cats:
        scores_mat = scores_mat * (labels[:, None] == memo_labels[None, :])
    scores_mat = jnp.where(col_mask & row_mask, scores_mat, 0.0)
    has_memo = memo_valid.any()

    # greedy assignment with column suppression.  The reference zeroes the
    # matched column of the score matrix for later rows; carrying a
    # used-column mask is equivalent (each row only sees suppressions from
    # earlier rows) and keeps the scan carry tiny.
    def scan_body(used, inp):
        row, det_score, valid = inp
        row = jnp.where(used, 0.0, row)
        memo_ind = jnp.argmax(row)
        conf = row[memo_ind]
        tid = memo_ids[memo_ind]
        confident = (conf > cfg.match_score_thr) & valid & has_memo
        take = confident & (tid > -1) & (det_score > cfg.obj_score_thr)
        suppress = confident & (tid > -1) & (det_score <= cfg.obj_score_thr) & \
            (conf > cfg.nms_conf_thr)
        out_id = jnp.where(take, tid, jnp.where(suppress, -2, -1))
        used = used | (take & (jnp.arange(used.shape[0]) == memo_ind))
        return used, out_id

    used0 = jnp.zeros((scores_mat.shape[1],), bool)
    # unroll: each iteration is a handful of tiny VPU ops — the per-step
    # loop overhead dominates the math on TPU without it
    _, ids = jax.lax.scan(scan_body, used0,
                          (scores_mat, bboxes[:, 4], det_valid), unroll=8)

    # new ids for confident unmatched detections
    new_mask = (ids == -1) & (bboxes[:, 4] > cfg.init_score_thr) & det_valid
    new_rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    ids = jnp.where(new_mask, state.num_tracklets + new_rank, ids)
    num_tracklets = state.num_tracklets + new_mask.sum(dtype=jnp.int32)

    # ---- memory update ---------------------------------------------------
    tracked = ids > -1
    # existing slots: match by id
    slot_of_det = jnp.argmax(ids[:, None] == state.ids[None, :], axis=1)
    in_table = (ids[:, None] == state.ids[None, :]).any(axis=1) & tracked

    # EMA update for dets whose id is already in the table
    def apply_existing(st: TrackerState) -> TrackerState:
        sel = in_table
        slot = jnp.where(sel, slot_of_det, t)  # overflow slot
        dt = jnp.maximum(frame_id - st.last_frame[jnp.clip(slot, 0, t - 1)], 1)
        vel = (bboxes - st.bboxes[jnp.clip(slot, 0, t - 1)]) / dt[:, None]
        old_emb = st.embeds[jnp.clip(slot, 0, t - 1)]
        new_emb = (1 - cfg.memo_momentum) * old_emb + cfg.memo_momentum * embeds
        old_v = st.velocities[jnp.clip(slot, 0, t - 1)]
        old_acc = st.acc_frames[jnp.clip(slot, 0, t - 1)]
        new_v = (old_v * old_acc[:, None] + vel) / (old_acc[:, None] + 1)

        def pad_set(arr, vals):
            ext = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], axis=0)
            return ext.at[slot].set(jnp.where(
                sel.reshape((-1,) + (1,) * (vals.ndim - 1)), vals,
                ext[slot]))[:t]

        return st.replace(
            bboxes=pad_set(st.bboxes, bboxes),
            embeds=pad_set(st.embeds, new_emb),
            labels=pad_set(st.labels, labels),
            last_frame=pad_set(st.last_frame, jnp.full((d,), frame_id, jnp.int32)),
            velocities=pad_set(st.velocities, new_v),
            acc_frames=pad_set(st.acc_frames, old_acc + 1),
        )

    state = apply_existing(state)

    # insert new tracklets into free slots
    is_new = tracked & ~in_table
    free = state.ids < 0
    free_order = jnp.argsort(~free)  # free slots first, stable
    new_rank2 = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    target_slot = jnp.where(is_new, free_order[jnp.clip(new_rank2, 0, t - 1)], t)

    def pad_set2(arr, vals, fill=None):
        ext = jnp.concatenate([arr, jnp.zeros_like(arr[:1])], axis=0)
        return ext.at[target_slot].set(
            jnp.where(is_new.reshape((-1,) + (1,) * (vals.ndim - 1)), vals,
                      ext[target_slot]))[:t]

    state = state.replace(
        ids=pad_set2(state.ids, ids),
        bboxes=pad_set2(state.bboxes, bboxes),
        embeds=pad_set2(state.embeds, embeds),
        labels=pad_set2(state.labels, labels),
        last_frame=pad_set2(state.last_frame, jnp.full((d,), frame_id, jnp.int32)),
        velocities=pad_set2(state.velocities, jnp.zeros((d, 5))),
        acc_frames=pad_set2(state.acc_frames, jnp.zeros((d,), jnp.int32)),
        num_tracklets=num_tracklets,
    )

    # backdrops: unmatched (-1) detections, IoU-filtered vs higher-ranked dets
    bd_cand = (ids == -1) & det_valid
    bd_overlap = ((ious_dd > cfg.nms_backdrop_iou_thr) & tri &
                  det_valid[None, :]).any(axis=1)
    bd_keep = bd_cand & ~bd_overlap
    # ring shift: newest block of max_detections slots first, oldest drops
    state = state.replace(
        bd_embeds=jnp.concatenate(
            [embeds * bd_keep[:, None], state.bd_embeds[:-d]], axis=0),
        bd_bboxes=jnp.concatenate(
            [bboxes * bd_keep[:, None], state.bd_bboxes[:-d]], axis=0),
        bd_labels=jnp.concatenate(
            [jnp.where(bd_keep, labels, -999), state.bd_labels[:-d]]),
        bd_valid=jnp.concatenate([bd_keep, state.bd_valid[:-d]]),
    )

    # expire stale tracklets
    expired = (state.ids >= 0) & (frame_id - state.last_frame >= cfg.memo_tracklet_frames)
    state = state.replace(ids=jnp.where(expired, -1, state.ids))

    return state, ids, order, det_valid
