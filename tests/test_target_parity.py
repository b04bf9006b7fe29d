"""Target-building parity against a sequential numpy oracle implementing the
reference's per-image loops literally (kernel_update_head.py:443-534,
kernel_head.py:571-640 incl. the ascending-overwrite rank/seg semantics)."""
import numpy as np

import jax.numpy as jnp

from polyphonicformer_tpu.data.structures import GTSample
from polyphonicformer_tpu.train.assign import AssignResult
from polyphonicformer_tpu.train.targets import build_seg_target, build_stage_targets

NP, NT, NC, NS = 20, 8, 19, 11  # proposals, things, classes, stuff
H, W = 16, 24
M = 6  # max thing slots


def random_case(seed):
    rng = np.random.RandomState(seed)
    n_valid = rng.randint(1, M + 1)
    thing_masks = (rng.rand(M, H, W) < 0.25).astype(np.float32) * \
        rng.rand(M, H, W).astype(np.float32)
    thing_valid = np.arange(M) < n_valid
    thing_masks *= thing_valid[:, None, None]
    thing_labels = np.where(thing_valid, rng.randint(0, NT, M), -1)
    stuff_masks = (rng.rand(NS, H, W) < 0.3).astype(np.float32) * \
        rng.rand(NS, H, W).astype(np.float32)
    stuff_valid = rng.rand(NS) > 0.4
    stuff_masks *= stuff_valid[:, None, None]
    depth = rng.rand(H, W).astype(np.float32) * 70
    depth[rng.rand(H, W) < 0.2] = 0
    valid = ((thing_masks.sum(0) + stuff_masks.sum(0)) > 0).astype(np.float32)
    # random distinct assignment of valid gts to pred rows
    perm = rng.permutation(NP)[:M]
    gt2pred = np.where(thing_valid, perm, -1).astype(np.int32)
    pred2gt = np.full(NP, -1, np.int32)
    for g, p in enumerate(gt2pred):
        if p >= 0:
            pred2gt[p] = g
    gt = GTSample(
        thing_masks=jnp.asarray(thing_masks),
        thing_labels=jnp.asarray(thing_labels, jnp.int32),
        thing_valid=jnp.asarray(thing_valid),
        thing_inst_ids=jnp.asarray(np.where(thing_valid, 1000 + np.arange(M), -1),
                                   jnp.int32),
        stuff_masks=jnp.asarray(stuff_masks),
        stuff_valid=jnp.asarray(stuff_valid),
        depth=jnp.asarray(depth),
        valid_mask=jnp.asarray(valid),
    )
    assign = AssignResult(pred2gt=jnp.asarray(pred2gt), gt2pred=jnp.asarray(gt2pred))
    return gt, assign, dict(thing_masks=thing_masks, thing_labels=thing_labels,
                            thing_valid=thing_valid, stuff_masks=stuff_masks,
                            stuff_valid=stuff_valid, depth=depth, valid=valid,
                            gt2pred=gt2pred, pred2gt=pred2gt)


def oracle_rcnn_targets(c):
    """Literal reference semantics (kernel_update_head.py:443-534)."""
    q = NP + NS
    labels = np.full(q, NC, np.int64)
    mask_targets = np.zeros((q, H, W), np.float32)
    lw = np.zeros((q, NC), np.float32)
    pos_inds, neg_inds = [], []
    for p in range(NP):
        g = c["pred2gt"][p]
        if g >= 0:
            pos_inds.append(p)
            labels[p] = c["thing_labels"][g]
            lw[p] = 1.0
            mask_targets[p] = c["thing_masks"][g]
        else:
            neg_inds.append(p)
            lw[p] = 1.0
    # stuff rows
    sem_lw = np.concatenate([np.zeros((NS, NT)), np.eye(NS)], axis=1)
    lw[:NP, NT:] = 0.0
    lw[NP:] = sem_lw
    for s in range(NS):
        if c["stuff_valid"][s]:
            labels[NP + s] = NT + s
            mask_targets[NP + s] = c["stuff_masks"][s]
    # rank target: ascending overwrite over pos rows
    rank = np.full((H, W), 255, np.int64)
    pos_rows = [j for j in range(q) if labels[j] < NC]
    for j in pos_rows:
        rank[mask_targets[j] > 0] = j
    # depth targets/weights
    dt = np.zeros((q, H, W), np.float32)
    dw = np.zeros((q, H, W), np.float32)
    for p in pos_inds:
        dt[p] = c["depth"]
        dw[p] = c["thing_masks"][c["pred2gt"][p]]
    for s in range(NS):
        if c["stuff_valid"][s]:
            dt[NP + s] = c["depth"]
            dw[NP + s] = c["stuff_masks"][s]
    dt[-1] = c["depth"]
    dw[-1] = 1.0
    dw *= (c["depth"] > 0)[None]
    return labels, lw, mask_targets, rank, dt, dw


def oracle_seg_target(c):
    """kernel_head.py:589-604: stuff ascending, then pos things ascending by
    matched pred row."""
    seg = np.full((H, W), NC, np.int64)
    for s in range(NS):
        if c["stuff_valid"][s]:
            seg[c["stuff_masks"][s] > 0] = NT + s
    rows = sorted(p for p in range(NP) if c["pred2gt"][p] >= 0)
    for p in rows:
        g = c["pred2gt"][p]
        seg[c["thing_masks"][g] > 0] = c["thing_labels"][g]
    return seg


def test_stage_targets_match_oracle():
    for seed in range(5):
        gt, assign, c = random_case(seed)
        t = build_stage_targets(assign, gt, NP, NT, NC, 255,
                                with_direct_row=True, stuff_in_rank=True)
        labels, lw, mt, rank, dt, dw = oracle_rcnn_targets(c)
        np.testing.assert_array_equal(np.asarray(t.labels), labels, str(seed))
        np.testing.assert_allclose(np.asarray(t.label_weights), lw)
        np.testing.assert_allclose(np.asarray(t.mask_targets), mt, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(t.rank_target), rank)
        np.testing.assert_allclose(np.asarray(t.depth_weights), dw, atol=1e-6)
        want_dt_nonzero = dt * (dw > 0)
        got_dt = (np.asarray(t.depth_has_target)[:, None, None]
                  * c["depth"][None]) * (np.asarray(t.depth_weights) > 0)
        np.testing.assert_allclose(got_dt, want_dt_nonzero, atol=1e-6)


def test_seg_target_matches_oracle():
    for seed in range(5):
        gt, assign, c = random_case(seed + 100)
        got = np.asarray(build_seg_target(assign, gt, NT, NC))
        want = oracle_seg_target(c)
        np.testing.assert_array_equal(got, want, str(seed))
