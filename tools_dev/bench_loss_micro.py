"""Dev-only: isolate every loss-side piece of the video train step on the
real chip — scheduling-free ground truth for the ~140 ms loss delta that
tools_dev/bench_train.py attributes only at group granularity.

Each piece is timed as its own jitted program (fwd, and fwd+grad where the
production step differentiates through it), at production shapes:
B=1, Q=111 (100 things + 11 stuff + 0? -> cfg), h4=(256,512), M=16.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

H, W = 1024, 2048
H4, W4 = H // 4, W // 4
H8, W8 = H // 8, W // 8
B = 1
M = 16


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(name, fn, *args, reps=3, inner=2):
    fn = jax.jit(fn)
    _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    dt = sorted(times)[len(times) // 2]
    print(f"{name:44s} {dt * 1000:8.2f} ms")
    return dt


def main():
    from polyphonicformer_tpu.configs import ModelConfig, TrackHeadConfig
    from polyphonicformer_tpu.train import losses as L
    from polyphonicformer_tpu.train.assign import (assignment_cost,
                                                   solve_assignment)
    from polyphonicformer_tpu.train.targets import (build_seg_target,
                                                    build_stage_targets)
    from polyphonicformer_tpu.data.structures import GTSample
    from polyphonicformer_tpu.ops.resize import resize_bilinear
    from polyphonicformer_tpu.ops.roi_align import (masks_to_boxes_mad,
                                                    multilevel_roi_align)

    cfg = ModelConfig(with_track=True)
    nq, np_, nc, nt = (cfg.num_queries, cfg.num_proposals, cfg.num_classes,
                       cfg.num_thing_classes)
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 16)

    # ---- synthetic production-shaped tensors ----------------------------
    mask8 = jax.random.normal(ks[0], (B, nq, H8, W8), jnp.float32)
    mask4 = jax.random.normal(ks[1], (B, nq, H4, W4), jnp.float32)
    tgt4 = (jax.random.uniform(ks[2], (B, nq, H4, W4)) > 0.9).astype(
        jnp.float32)
    valid = (jax.random.uniform(ks[3], (B, H4, W4)) > 0.1).astype(jnp.float32)
    pos = (jax.random.uniform(ks[4], (B, nq)) > 0.8).astype(jnp.float32)
    labels_px = jax.random.randint(ks[5], (B, H4, W4), 0, 140)
    gt_masks = (jax.random.uniform(ks[6], (B, M, H4, W4)) > 0.95).astype(
        jnp.float32)
    gt_valid = jnp.ones((B, M), bool)
    depth = jax.random.uniform(ks[7], (B, H4, W4)) * 70 + 1

    # 1. x2 upsample of one stage's (B, Q, h8, w8) mask volume, with grad
    def ups(m):
        return resize_bilinear(m, (H4, W4)).sum()

    timed("upsample2 (1,111,128x256)->256x512 fwd", lambda m: ups(m), mask8)
    timed("upsample2 fwd+bwd", lambda m: jax.grad(ups)(m).sum(), mask8)

    # 2. mask+dice einsum losses fwd / fwd+bwd
    def mask_dice(m):
        losses = {}
        from polyphonicformer_tpu.data.structures import GTSample as GS
        # direct reimpl of the einsum forms over production shapes
        m32 = m.astype(jnp.float32)
        from polyphonicformer_tpu.losses.cross_entropy import (
            binary_cross_entropy_with_logits)
        bce = binary_cross_entropy_with_logits(m32, tgt4)
        denom = jnp.maximum(jnp.einsum("bq,b->", pos,
                                       valid.sum(axis=(1, 2))), 1.0)
        lm = jnp.einsum("bqhw,bq,bhw->", bce, pos, valid) / denom
        p = jax.nn.sigmoid(m32)
        a = jnp.einsum("bqhw,bqhw,bhw->bq", p, tgt4, valid)
        bb = jnp.einsum("bqhw,bqhw,bhw->bq", p, p, valid) + 1e-3
        cc = jnp.einsum("bqhw,bqhw,bhw->bq", tgt4, tgt4, valid) + 1e-3
        dice = ((1.0 - 2.0 * a / (bb + cc)) * pos).sum()
        return lm + dice

    timed("mask+dice einsum fwd", mask_dice, mask4)
    timed("mask+dice einsum fwd+bwd",
          lambda m: jax.grad(mask_dice)(m).sum(), mask4)

    # 3. rank loss fwd / fwd+bwd
    def rank(m):
        m32 = m.astype(jnp.float32)
        rvalid = (labels_px != 255) & (labels_px >= 0) & (labels_px < nq)
        safe = jnp.where(rvalid, labels_px, 0)
        logp = jax.nn.log_softmax(m32, axis=1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
        return jnp.where(rvalid, nll, 0.0).mean()

    timed("rank CE fwd", rank, mask4)
    timed("rank CE fwd+bwd", lambda m: jax.grad(rank)(m).sum(), mask4)

    # 4. seg focal fwd+bwd (19ch at stride 4)
    seg4 = jax.random.normal(ks[8], (B, H4, W4, nc), jnp.float32)
    seg_tgt = jax.random.randint(ks[9], (B, H4, W4), 0, nc + 1)

    def seg(s):
        from polyphonicformer_tpu.losses.focal import (
            sigmoid_focal_loss_elements)
        onehot = jax.nn.one_hot(seg_tgt, nc + 1, dtype=jnp.float32)[..., :nc]
        sv = (seg_tgt != nc).astype(jnp.float32)
        f = sigmoid_focal_loss_elements(s, onehot, 2.0, 0.25)
        return (f * sv[..., None]).sum() / jnp.maximum(sv.sum(), 1.0)

    timed("seg focal fwd+bwd", lambda s: jax.grad(seg)(s).sum(), seg4)

    # 5. depth loss (111-row masked) fwd+bwd
    dl8 = jax.random.normal(ks[10], (B, nq, H4, W4), jnp.float32)
    dw = gt_masks.sum(1, keepdims=True) * jnp.ones((B, nq, 1, 1))

    def dloss(d):
        from polyphonicformer_tpu.losses.depth_loss import depth_loss
        return depth_loss(d, jnp.broadcast_to(depth[:, None], d.shape),
                          dw, loss_weight=5.0, depth_act_mode="sigmoid")

    timed("masked depth loss fwd+bwd",
          lambda d: jax.grad(dloss)(d).sum(), dl8)

    # 6. assignment cost (one problem)
    gt = GTSample(
        thing_masks=gt_masks[0], thing_labels=jnp.zeros((M,), jnp.int32),
        thing_valid=gt_valid[0], thing_inst_ids=jnp.zeros((M,), jnp.int32),
        stuff_masks=jnp.zeros((nc - nt, H4, W4)),
        stuff_valid=jnp.ones((nc - nt,), bool),
        depth=depth[0], valid_mask=valid[0])

    def one_cost(m):
        return assignment_cost(cfg.rcnn_assigner, m[0, :np_], None, gt).sum()

    timed("assignment cost (100x16) fwd", one_cost, mask4)

    # 7. lockstep solver: 4 stacked problems
    costs = jax.random.normal(ks[11], (4 * B, np_, M), jnp.float32)
    gv = jnp.ones((4 * B, M), bool)

    def solve(c):
        r = jax.vmap(lambda cc, vv: solve_assignment(cc, vv, np_))(c, gv)
        return r.pred2gt.sum()

    timed("lockstep Hungarian solve (4 problems)", solve, costs)

    # 8. stage targets + seg target
    from polyphonicformer_tpu.train.assign import AssignResult
    a = AssignResult(pred2gt=jnp.full((np_,), -1, jnp.int32),
                     gt2pred=jnp.arange(M, dtype=jnp.int32))

    def tg(_):
        t = build_stage_targets(a, gt, np_, nt, nc)
        return t.mask_targets.sum() + t.rank_target.sum()

    timed("build_stage_targets", tg, jnp.zeros(()))

    # 9. GT track-mask upsample to full res (fwd only, GT has no grad)
    def gtm(m):
        up = resize_bilinear(m, (H, W))
        return ((up > 0).astype(jnp.float32)).sum()

    timed("gt_track_masks x4 up+binarize (16 masks)", gtm, gt_masks[0])

    # 10. masks->MAD boxes at full res
    full_masks = (resize_bilinear(gt_masks[0], (H, W)) > 0).astype(
        jnp.float32)
    timed("masks_to_boxes_mad (16,1024,2048)",
          lambda m: masks_to_boxes_mad(m).sum(), full_masks)

    # 11. roi align fwd+bwd wrt features
    feats = tuple(
        jax.random.normal(ks[12 + i], (H // s, W // s, 256), jnp.float32)
        for i, s in enumerate((4, 8, 16, 32)))
    boxes = jnp.tile(jnp.asarray([[10., 10., 400., 300.]]), (M, 1))

    def roi(fs):
        r = multilevel_roi_align(fs, boxes, strides=(4, 8, 16, 32),
                                 out_size=7, sampling_ratio=2)
        return r.sum()

    timed("multilevel_roi_align fwd (16 rois)", roi, feats)
    timed("multilevel_roi_align fwd+bwd",
          lambda fs: jax.tree_util.tree_leaves(
              jax.grad(roi)(fs))[0].sum(), feats)

    # 12. track embed MLP fwd+bwd (32 rois: key+ref)
    from polyphonicformer_tpu.models.track_head import TrackEmbedMLP
    mlp = TrackEmbedMLP(cfg.track_head)
    rois = jax.random.normal(ks[11], (2 * M, 7, 7, 256), jnp.float32)
    mvars = mlp.init(ks[12], rois)

    def emb(v):
        return mlp.apply(v, rois).sum()

    timed("track embed MLP fwd+bwd (32 rois)",
          lambda v: jax.tree_util.tree_leaves(jax.grad(emb)(v))[0].sum(),
          mvars)


if __name__ == "__main__":
    main()
