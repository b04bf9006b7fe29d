"""Streaming inference: one jitted step per frame carrying tracker state.

reference flow: /root/reference/polyphonic/apis/video_inference.py:8-37 and
PolyphonicVideo.simple_test (polyphonic_former_video.py:327-451) — per frame:
panoptic fusion, thing-segment RoIAlign embeddings, tracker matching, track
id map.  Here the entire frame step (backbone -> fusion -> embeddings ->
tracker update) is ONE compiled program; the tracker state is a pytree
carried between calls, and the only host work is PNG decode and final
array readout.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..models.polyphonic import PolyphonicFormer
from ..ops.resize import resize_bilinear
from .panoptic import PanopticResult, fuse_panoptic
from .tracker import TrackerState, init_tracker_state, tracker_step


class FrameOutput(NamedTuple):
    semantic: jax.Array  # (H, W) int32
    track_map: jax.Array  # (H, W) int32 (0 = no instance)
    depth: jax.Array  # (H, W) float32
    depth_basic: jax.Array  # (H, W) float32
    panoptic: jax.Array  # (H, W) int32 segment ids
    pano: PanopticResult
    # kept thing segments beyond the tracker's max_detections capacity this
    # frame (those pixels get track id 0 silently otherwise) — surface it so
    # dense scenes (SemKITTI) don't drop IDs invisibly.
    track_overflow: jax.Array  # () int32


def _tight_boxes_from_any(any_y: jax.Array, any_x: jax.Array) -> jax.Array:
    """Exact min/max boxes from row/col occupancy (reference
    tensor_mask2box, funcs/utils.py:12-22).

    NOTE the reference's coords are (row, col) = nonzero order, so its
    "boxes" are (y1, x1, y2, x2); they are only used as tracker bbox state
    and for IoU tests, which are coordinate-order invariant."""
    _, h = any_y.shape
    _, w = any_x.shape
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    big = jnp.int32(1 << 30)
    x1 = jnp.min(jnp.where(any_x, xs, big), axis=1)
    x2 = jnp.max(jnp.where(any_x, xs, -1), axis=1)
    y1 = jnp.min(jnp.where(any_y, ys, big), axis=1)
    y2 = jnp.max(jnp.where(any_y, ys, -1), axis=1)
    empty = ~any_x.any(axis=1)
    box = jnp.stack([y1, x1, y2, x2], axis=1).astype(jnp.float32)
    return jnp.where(empty[:, None], jnp.asarray([-1.0, -1.0, 10.0, 10.0]), box)


def _mask_tight_boxes(masks: jax.Array) -> jax.Array:
    return _tight_boxes_from_any(masks.any(axis=2), masks.any(axis=1))


def video_frame_step(model: PolyphonicFormer, cfg: ModelConfig, variables,
                     image: jax.Array, tracker_state: TrackerState,
                     frame_id: jax.Array, out_hw: Tuple[int, int],
                     compute_dtype=jnp.float32, fusion_dtype=jnp.float32
                     ) -> Tuple[FrameOutput, TrackerState]:
    """image: (1, H, W, 3) normalized+padded. out_hw: original size.

    compute_dtype=bfloat16 runs the network in bf16 (MXU-native serving
    path); fusion and the tracker always run in f32.
    """
    if compute_dtype != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            variables)
        image = image.astype(compute_dtype)
    fpn = model.apply(variables, image, method=PolyphonicFormer.extract_feat)
    out = model.apply(variables, fpn, method=PolyphonicFormer.forward_heads)
    if compute_dtype != jnp.float32:
        out = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float32)
            if isinstance(a, jax.Array) and a.dtype == compute_dtype else a, out)
    cls_probs = jax.nn.sigmoid(out.stages[-1].cls_score[0])
    # final-stage mask/depth upsampled x2 to stride 4 (kernel_update.py:131-143)
    mask_logits = resize_bilinear(
        out.stages[-1].mask_preds[0],
        (out.stages[-1].mask_preds.shape[-2] * 2,
         out.stages[-1].mask_preds.shape[-1] * 2))
    depth_logits = resize_bilinear(
        out.stages[-1].depth_preds[0],
        (out.stages[-1].depth_preds.shape[-2] * 2,
         out.stages[-1].depth_preds.shape[-1] * 2))
    depth_init = resize_bilinear(
        out.rpn.depth_pred[0:1],
        (out.rpn.depth_pred.shape[-2] * 2, out.rpn.depth_pred.shape[-1] * 2))[0]

    from .panoptic import _use_pallas_fusion

    defer = fusion_dtype != jnp.float32 and _use_pallas_fusion()
    pano = fuse_panoptic(cfg, cls_probs, mask_logits, depth_logits,
                         depth_init, out_hw, fusion_dtype=fusion_dtype,
                         num_track_masks=cfg.tracker.max_detections,
                         emit_marginals=True, defer_maps=defer)

    # --- tracking over kept thing segments --------------------------------
    # Everything the tracker needs (tight boxes, MAD RoI boxes, the track-id
    # map) is a function of the fusion kernel's row/col marginals and
    # pixel argmax — the (D, H, W) mask stack is never materialized.
    d = cfg.tracker.max_detections
    kk = pano.instance_ids.shape[0]
    take = min(d, kk)

    def to_d(arr, fill=0):
        sliced = arr[:take]
        if take == d:
            return sliced
        pad = [(0, d - take)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(sliced, pad, constant_values=fill)

    thing_keep = pano.keep & pano.is_thing  # (K,)
    det_valid = to_d(thing_keep)
    det_scores = to_d(pano.scores)
    det_labels = to_d(pano.labels)
    # keep-gate the marginals so empty-mask fallbacks match the mask path
    det_rowm = to_d(pano.row_marg) * det_valid[:, None]
    det_colm = to_d(pano.col_marg) * det_valid[:, None]
    boxes_yx = _tight_boxes_from_any(det_rowm > 0, det_colm > 0)
    det_boxes = jnp.concatenate(
        [jnp.maximum(boxes_yx, 0.0), det_scores[:, None]], axis=1)

    from ..ops.roi_align import boxes_mad_from_marginals

    roi_boxes = boxes_mad_from_marginals(det_rowm, det_colm)
    dummy_masks = jnp.zeros((1, d, 1, 1), jnp.bool_)  # unused: boxes given
    embeds = model.apply(variables, fpn, dummy_masks, det_valid[None],
                         roi_boxes[None],
                         method=PolyphonicFormer.forward_track_embeds)[0]
    embeds = embeds.astype(jnp.float32)

    new_state, ids_sorted, order, kept_sorted = tracker_step(
        cfg.tracker, tracker_state, det_boxes, det_labels, embeds,
        det_valid, frame_id)
    # map sorted ids back to candidate order; reference: ids+1, -1/-2 -> 0
    ids_by_det = jnp.zeros((d,), jnp.int32)
    out_ids = jnp.where(kept_sorted & (ids_sorted >= 0), ids_sorted + 1, 0)
    ids_by_det = ids_by_det.at[order].set(out_ids)
    overflow = (jnp.sum(thing_keep.astype(jnp.int32))
                - jnp.sum(thing_keep[:take].astype(jnp.int32)))

    # per-pixel track id vector (candidates beyond D and non-kept get 0)
    cand_track_id = jnp.zeros((kk,), jnp.int32).at[:take].set(ids_by_det[:take])
    ids_full = cand_track_id * thing_keep.astype(jnp.int32)
    if defer:
        # one pallas pass renders all four maps (XLA per-pixel gathers
        # measured ~17ms each at 1024x2048 — ops/pallas/map_render.py).
        # Tables truncate to the renderable rows (rows beyond n_render have
        # keep=False by construction; sentinel pix values match nothing)
        from ..ops.pallas.map_render import render_maps

        nr = kk if pano.n_render is None else pano.n_render
        from .panoptic import _pallas_interpret

        semantic, panoptic, depth, track_map = render_maps(
            pano.pix_arg, pano.depth_pix, pano.depth_basic,
            pano.labels[:nr], pano.seg_ids[:nr], pano.keep[:nr],
            ids_full[:nr], cfg.num_classes, interpret=_pallas_interpret())
        pano = pano._replace(semantic=semantic, panoptic=panoptic,
                             depth=depth)
    else:
        semantic, panoptic, depth = pano.semantic, pano.panoptic, pano.depth
        track_map = ids_full[pano.pix_arg]

    fo = FrameOutput(semantic=semantic, track_map=track_map,
                     depth=depth, depth_basic=pano.depth_basic,
                     panoptic=panoptic, pano=pano,
                     track_overflow=overflow)
    return fo, new_state


def make_video_step(model: PolyphonicFormer, cfg: ModelConfig, out_hw,
                    compute_dtype=jnp.float32, fusion_dtype=jnp.float32):
    fn = functools.partial(video_frame_step, model, cfg, out_hw=tuple(out_hw),
                           compute_dtype=compute_dtype,
                           fusion_dtype=fusion_dtype)
    return jax.jit(fn)


def batched_video_step(model: PolyphonicFormer, cfg: ModelConfig, variables,
                       images: jax.Array, tracker_states: TrackerState,
                       frame_ids: jax.Array, out_hw: Tuple[int, int],
                       compute_dtype=jnp.float32, fusion_dtype=jnp.float32):
    """Multi-clip serving: B frames from B independent sequences in one
    program (BASELINE config #5).  tracker_states carries a batch axis.

    Returns (FrameOutput batched, TrackerState batched).
    """
    if compute_dtype != jnp.float32:
        cast_vars = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            variables)
        images_c = images.astype(compute_dtype)
    else:
        cast_vars = variables
        images_c = images
    fpn = model.apply(cast_vars, images_c, method=PolyphonicFormer.extract_feat)
    out = model.apply(cast_vars, fpn, method=PolyphonicFormer.forward_heads)
    out = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if isinstance(a, jax.Array)
        and a.dtype != jnp.int32 and a.dtype != bool else a, out)

    h8, w8 = out.stages[-1].mask_preds.shape[-2:]

    from .panoptic import _use_pallas_fusion

    defer = fusion_dtype != jnp.float32 and _use_pallas_fusion()

    def fuse_one(cls_logits, mask_p, depth_p, depth0):
        cls_probs = jax.nn.sigmoid(cls_logits)
        ml = resize_bilinear(mask_p, (h8 * 2, w8 * 2))
        dl = resize_bilinear(depth_p, (h8 * 2, w8 * 2))
        d0 = resize_bilinear(depth0[None], (h8 * 2, w8 * 2))[0]
        pano = fuse_panoptic(cfg, cls_probs, ml, dl, d0, out_hw,
                             fusion_dtype=fusion_dtype,
                             num_track_masks=cfg.tracker.max_detections,
                             emit_marginals=True, defer_maps=defer)
        # n_render is a STATIC int — returning it through vmap would batch-
        # trace it; recomputed below via static_n_render
        return pano._replace(n_render=None)

    pano = jax.vmap(fuse_one)(out.stages[-1].cls_score,
                              out.stages[-1].mask_preds,
                              out.stages[-1].depth_preds,
                              out.rpn.depth_pred)

    d = cfg.tracker.max_detections
    kk = pano.instance_ids.shape[1]
    take = min(d, kk)

    def to_d(arr, fill=0):
        sliced = arr[:, :take]
        if take == d:
            return sliced
        pad = [(0, 0), (0, d - take)] + [(0, 0)] * (arr.ndim - 2)
        return jnp.pad(sliced, pad, constant_values=fill)

    thing_keep = pano.keep & pano.is_thing
    det_valid = to_d(thing_keep)
    det_scores = to_d(pano.scores)
    det_labels = to_d(pano.labels)
    det_rowm = to_d(pano.row_marg) * det_valid[..., None]
    det_colm = to_d(pano.col_marg) * det_valid[..., None]
    boxes_yx = jax.vmap(
        lambda rm, cm: _tight_boxes_from_any(rm > 0, cm > 0))(det_rowm,
                                                              det_colm)
    det_boxes = jnp.concatenate(
        [jnp.maximum(boxes_yx, 0.0), det_scores[..., None]], axis=2)

    from ..ops.roi_align import boxes_mad_from_marginals

    roi_boxes = jax.vmap(boxes_mad_from_marginals)(det_rowm, det_colm)
    b = det_valid.shape[0]
    dummy_masks = jnp.zeros((b, d, 1, 1), jnp.bool_)  # unused: boxes given
    embeds = model.apply(cast_vars, fpn, dummy_masks, det_valid, roi_boxes,
                         method=PolyphonicFormer.forward_track_embeds)
    embeds = embeds.astype(jnp.float32)

    new_states, ids_sorted, order, kept_sorted = jax.vmap(
        lambda s, b, l, e, v, f: tracker_step(cfg.tracker, s, b, l, e, v, f)
    )(tracker_states, det_boxes, det_labels, embeds, det_valid, frame_ids)

    def ids_vec(ids_s, ord_, kept_s, keep_t):
        out_ids = jnp.where(kept_s & (ids_s >= 0), ids_s + 1, 0)
        ids_by_det = jnp.zeros((d,), jnp.int32).at[ord_].set(out_ids)
        cand_track_id = jnp.zeros((kk,), jnp.int32).at[:take].set(ids_by_det[:take])
        return cand_track_id * keep_t.astype(jnp.int32)

    ids_full = jax.vmap(ids_vec)(ids_sorted, order, kept_sorted, thing_keep)
    if defer:
        from ..ops.pallas.map_render import render_maps
        from .panoptic import static_n_render

        nr_static = static_n_render(cfg, out_hw, (h8 * 2, w8 * 2),
                                    fusion_dtype)
        nr = kk if nr_static is None else nr_static
        from .panoptic import _pallas_interpret

        semantic, panoptic, depth, track_map = jax.vmap(
            lambda pix, dp, db, lb, sg, kp, tr: render_maps(
                pix, dp, db, lb, sg, kp, tr, cfg.num_classes,
                interpret=_pallas_interpret())
        )(pano.pix_arg, pano.depth_pix, pano.depth_basic,
          pano.labels[:, :nr], pano.seg_ids[:, :nr], pano.keep[:, :nr],
          ids_full[:, :nr])
        pano = pano._replace(semantic=semantic, panoptic=panoptic,
                             depth=depth)
    else:
        semantic, panoptic, depth = pano.semantic, pano.panoptic, pano.depth
        track_map = jax.vmap(lambda v, pix: v[pix])(ids_full, pano.pix_arg)
    overflow = (jnp.sum(thing_keep.astype(jnp.int32), axis=1)
                - jnp.sum(thing_keep[:, :take].astype(jnp.int32), axis=1))
    fo = FrameOutput(semantic=semantic, track_map=track_map,
                     depth=depth, depth_basic=pano.depth_basic,
                     panoptic=panoptic, pano=pano,
                     track_overflow=overflow)
    return fo, new_states


def make_batched_video_step(model: PolyphonicFormer, cfg: ModelConfig, out_hw,
                            compute_dtype=jnp.float32, fusion_dtype=jnp.float32):
    fn = functools.partial(batched_video_step, model, cfg,
                           out_hw=tuple(out_hw), compute_dtype=compute_dtype,
                           fusion_dtype=fusion_dtype)
    return jax.jit(fn)


def init_batched_tracker_states(cfg: ModelConfig, batch: int) -> TrackerState:
    one = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (batch,) + a.shape), one)


class ClipOutput(NamedTuple):
    semantic: jax.Array  # (T, H, W) int32
    track_map: jax.Array  # (T, H, W) int32
    depth: jax.Array  # (T, H, W) float32
    panoptic: jax.Array  # (T, H, W) int32
    track_overflow: jax.Array  # (T,) int32


def clip_video_step(model: PolyphonicFormer, cfg: ModelConfig, variables,
                    images: jax.Array, tracker_state: TrackerState,
                    first_frame_id: jax.Array, out_hw: Tuple[int, int],
                    compute_dtype=jnp.float32, fusion_dtype=jnp.float32
                    ) -> Tuple[ClipOutput, TrackerState]:
    """Process T consecutive frames of ONE sequence in a single program
    (lax.scan over frames, tracker state carried on device).

    This is the offline-eval / serving mode: it amortizes per-dispatch host
    overhead over the clip while keeping the exact streaming semantics
    (frames still processed in order through the stateful tracker).

    images: (T, H, W, 3).
    """
    # hoist the whole-tree weight cast out of the frame scan: the in-step
    # cast is a no-op on already-bf16 leaves, so casting once here avoids
    # re-reading the f32 weights every iteration if XLA's LICM misses it
    if compute_dtype != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(compute_dtype)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            variables)

    def body(state, inp):
        img, fid = inp
        fo, state = video_frame_step(
            model, cfg, variables, img[None], state, fid, out_hw,
            compute_dtype=compute_dtype, fusion_dtype=fusion_dtype)
        slim = ClipOutput(semantic=fo.semantic, track_map=fo.track_map,
                          depth=fo.depth, panoptic=fo.panoptic,
                          track_overflow=fo.track_overflow)
        return state, slim

    t = images.shape[0]
    fids = first_frame_id + jnp.arange(t, dtype=jnp.int32)
    state, outs = jax.lax.scan(body, tracker_state, (images, fids))
    return outs, state


def make_clip_step(model: PolyphonicFormer, cfg: ModelConfig, out_hw,
                   compute_dtype=jnp.float32, fusion_dtype=jnp.float32):
    fn = functools.partial(clip_video_step, model, cfg, out_hw=tuple(out_hw),
                           compute_dtype=compute_dtype,
                           fusion_dtype=fusion_dtype)
    return jax.jit(fn)


def make_image_step(model: PolyphonicFormer, cfg: ModelConfig, out_hw,
                    compute_dtype=jnp.float32, fusion_dtype=jnp.float32):
    """Image-mode inference: fusion only (reference Polyphonic.simple_test).

    compute/fusion dtype bfloat16 selects the serving fast path (Pallas
    fusion + one-pass map rendering); float32 is reference-exact."""
    from .panoptic import _use_pallas_fusion

    defer = fusion_dtype != jnp.float32 and _use_pallas_fusion()

    def step(variables, image):
        if compute_dtype != jnp.float32:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(compute_dtype)
                if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
                variables)
            image = image.astype(compute_dtype)
        fpn = model.apply(variables, image, method=PolyphonicFormer.extract_feat)
        out = model.apply(variables, fpn, method=PolyphonicFormer.forward_heads)
        cls_probs = jax.nn.sigmoid(out.stages[-1].cls_score[0].astype(jnp.float32))
        s = out.stages[-1]
        mask_logits = resize_bilinear(
            s.mask_preds[0], (s.mask_preds.shape[-2] * 2, s.mask_preds.shape[-1] * 2))
        depth_logits = resize_bilinear(
            s.depth_preds[0], (s.depth_preds.shape[-2] * 2, s.depth_preds.shape[-1] * 2))
        depth_init = resize_bilinear(
            out.rpn.depth_pred[0:1],
            (out.rpn.depth_pred.shape[-2] * 2, out.rpn.depth_pred.shape[-1] * 2))[0]
        pano = fuse_panoptic(cfg, cls_probs, mask_logits, depth_logits,
                             depth_init, tuple(out_hw),
                             fusion_dtype=fusion_dtype,
                             emit_marginals=defer, defer_maps=defer)
        if defer:
            from ..ops.pallas.map_render import render_maps

            nr = (pano.seg_ids.shape[0] if pano.n_render is None
                  else pano.n_render)
            from .panoptic import _pallas_interpret

            zeros = jnp.zeros((nr,), pano.seg_ids.dtype)
            semantic, panoptic, depth, _ = render_maps(
                pano.pix_arg, pano.depth_pix, pano.depth_basic,
                pano.labels[:nr], pano.seg_ids[:nr], pano.keep[:nr],
                zeros, cfg.num_classes, interpret=_pallas_interpret())
            pano = pano._replace(semantic=semantic, panoptic=panoptic,
                                 depth=depth)
        return pano

    return jax.jit(step)
