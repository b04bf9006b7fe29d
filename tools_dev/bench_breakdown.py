"""Dev-only: per-component timing of the video frame step on the real chip.

All variants are T-frame lax.scans returning SCALARS only (any array output
gets stacked over T by scan and the HBM writes dwarf the thing measured).
The axon relay has a ~5.6ms dispatch floor; at T=8 that is ~0.7ms/frame.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

H, W = 1024, 2048
T = 8


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, reps=3, inner=2):
    _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    return sorted(times)[len(times) // 2], out


def main():
    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.infer.panoptic import fuse_panoptic
    from polyphonicformer_tpu.infer.pipeline import video_frame_step
    from polyphonicformer_tpu.infer.tracker import (init_tracker_state,
                                                    tracker_step)
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.ops.resize import resize_bilinear

    cfg = ModelConfig(with_track=True)
    model = PolyphonicFormer(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(rng, img, method=PolyphonicFormer.init_all)
    dtype = jnp.bfloat16
    cast_vars = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
        variables)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, H, W, 3), dtype)

    def fwd_body(im):
        fpn = model.apply(cast_vars, im[None],
                          method=PolyphonicFormer.extract_feat)
        out = model.apply(cast_vars, fpn, method=PolyphonicFormer.forward_heads)
        return fpn, out

    def fuse_from(out, num_track_masks):
        s = out.stages[-1]
        ml = resize_bilinear(s.mask_preds[0].astype(jnp.float32),
                             (s.mask_preds.shape[-2] * 2,
                              s.mask_preds.shape[-1] * 2))
        dl = resize_bilinear(s.depth_preds[0].astype(jnp.float32),
                             (s.depth_preds.shape[-2] * 2,
                              s.depth_preds.shape[-1] * 2))
        d0 = resize_bilinear(out.rpn.depth_pred[0:1].astype(jnp.float32),
                             (out.rpn.depth_pred.shape[-2] * 2,
                              out.rpn.depth_pred.shape[-1] * 2))[0]
        return fuse_panoptic(cfg,
                             jax.nn.sigmoid(s.cls_score[0].astype(jnp.float32)),
                             ml, dl, d0, (H, W), fusion_dtype=jnp.bfloat16,
                             num_track_masks=num_track_masks,
                             emit_marginals=True, defer_maps=True)

    def scan_over(body):
        @jax.jit
        def fn(xs):
            def b(c, im):
                return c, body(im)

            return jax.lax.scan(b, 0, xs)[1]

        return fn

    variants = {}

    variants["backbone"] = scan_over(lambda im: (
        model.apply(cast_vars, im[None],
                    method=lambda m, x: m.backbone(x))[-1]
        .astype(jnp.float32).sum(),))

    variants["fpn"] = scan_over(lambda im: (
        model.apply(cast_vars, im[None],
                    method=PolyphonicFormer.extract_feat)[-1]
        .astype(jnp.float32).sum(),))

    variants["rpn"] = scan_over(lambda im: (
        model.apply(cast_vars,
                    model.apply(cast_vars, im[None],
                                method=PolyphonicFormer.extract_feat),
                    method=lambda m, f: m.rpn_head(f)).mask_preds
        .astype(jnp.float32).sum(),))

    variants["fwd"] = scan_over(lambda im: (
        fwd_body(im)[1].stages[-1].cls_score.astype(jnp.float32).sum(),))

    # all variants below consume ONLY marginals/pix_arg/depth_pix scalars
    # (defer_maps production path) so deltas attribute real costs
    def v_fuse(im):
        _, out = fwd_body(im)
        pano = fuse_from(out, 1)
        return (pano.row_marg.sum(), pano.depth_pix.mean())

    variants["fuse"] = scan_over(v_fuse)

    from polyphonicformer_tpu.infer.pipeline import _tight_boxes_from_any
    from polyphonicformer_tpu.ops.roi_align import boxes_mad_from_marginals

    d = cfg.tracker.max_detections

    def v_boxes(im):
        _, out = fwd_body(im)
        pano = fuse_from(out, d)
        valid = (pano.keep & pano.is_thing)[:d]
        rowm = pano.row_marg[:d] * valid[:, None]
        colm = pano.col_marg[:d] * valid[:, None]
        tight = _tight_boxes_from_any(rowm > 0, colm > 0)
        mad = boxes_mad_from_marginals(rowm, colm)
        return (pano.row_marg.sum(), pano.depth_pix.mean(), tight.sum(),
                mad.sum())

    variants["boxes"] = scan_over(v_boxes)

    def v_embeds(im):
        fpn, out = fwd_body(im)
        pano = fuse_from(out, d)
        valid = (pano.keep & pano.is_thing)[:d]
        rowm = pano.row_marg[:d] * valid[:, None]
        colm = pano.col_marg[:d] * valid[:, None]
        mad = boxes_mad_from_marginals(rowm, colm)
        dummy = jnp.zeros((1, d, 1, 1), jnp.bool_)
        embeds = model.apply(cast_vars, fpn, dummy, valid[None], mad[None],
                             method=PolyphonicFormer.forward_track_embeds)
        return (pano.row_marg.sum(), embeds.astype(jnp.float32).sum())

    variants["embeds"] = scan_over(v_embeds)

    from polyphonicformer_tpu.ops.pallas.map_render import render_maps

    def v_render(im):
        _, out = fwd_body(im)
        pano = fuse_from(out, d)
        ids_vec = jnp.arange(pano.keep.shape[0], dtype=jnp.int32)
        sem, pan, dep, trk = render_maps(
            pano.pix_arg, pano.depth_pix, pano.depth_basic, pano.labels,
            pano.seg_ids, pano.keep, ids_vec, cfg.num_classes)
        return (sem.sum(), pan.sum(), dep.mean(), trk.sum())

    variants["render"] = scan_over(v_render)

    results = {}
    prev = None
    for name, fn in variants.items():
        t, _ = timed(fn, x)
        results[name] = t
        delta = "" if prev is None else f" (delta {(t - prev) / T * 1000:+.2f})"
        print(f"{name:10s} {t / T * 1000:8.2f} ms/frame{delta}")
        prev = t

    # full step via the production clip path
    from polyphonicformer_tpu.infer.pipeline import make_clip_step

    step = make_clip_step(model, cfg, (H, W), compute_dtype=jnp.bfloat16,
                          fusion_dtype=jnp.bfloat16)
    state = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)
    x32 = x.astype(jnp.float32)

    def full(v, xs, st):
        outs, st2 = step(v, xs, st, jnp.int32(1))
        return outs.semantic.sum() + outs.track_map.sum()

    t_full, _ = timed(full, variables, x32, state)
    print(f"{'full':10s} {t_full / T * 1000:8.2f} ms/frame "
          f"(delta vs embeds {(t_full - results['embeds']) / T * 1000:+.2f})")
    print(f"\nfps (full): {T / t_full:.2f}")


if __name__ == "__main__":
    main()
