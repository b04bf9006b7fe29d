"""Panoptic + depth fusion, fully vectorized (no data-dependent loops).

reference: /root/reference/polyphonic/kernel_update.py:421-535.  The
reference's greedy loop over score-sorted segments has NO cross-iteration
data dependence (each candidate's keep decision uses only the global pixel
argmax and its own areas), so the whole merge vectorizes:

  keep_k   = score gate & area gates on (argmax == k) regions
  seg_id_k = cumulative count of kept candidates in score order
  panoptic = seg_id[argmax(pixel)] masked by keep
  depth    = per-segment depth pasted over the dense initial depth

This removes the per-segment ``.item()`` device syncs of the reference.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import ModelConfig
from ..ops.depth import depth_act
from ..ops.resize import resize_bilinear


def _use_pallas_fusion() -> bool:
    """Default ON for TPU backends (opt out with POLY_PALLAS_FUSION=0;
    =interpret forces the interpreted kernels so the WHOLE bf16 serving
    path is exercisable on CPU in tests).  Only used for the bf16 serving
    path; the f32 reference-exact path always takes the XLA implementation."""
    import os

    flag = os.environ.get("POLY_PALLAS_FUSION", "1")
    if flag == "0":
        return False
    if flag == "interpret":
        return True
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _pallas_interpret() -> bool:
    import os

    return os.environ.get("POLY_PALLAS_FUSION") == "interpret"


def static_n_render(cfg, out_hw, mask_hw, fusion_dtype) -> int | None:
    """The static render-row count ``fuse_panoptic`` will report for these
    (cfg, shape, dtype) conditions — use when fuse_panoptic runs under
    vmap, which would batch-trace the int leaf (infer/pipeline.py)."""
    import jax.numpy as jnp

    h, w = out_hw
    hs, ws = mask_hw
    phased = (h % hs == 0 and w % ws == 0 and 1 <= h // hs <= 8
              and 1 <= w // ws <= 8)
    use_kernel = (phased and fusion_dtype != jnp.float32
                  and _use_pallas_fusion())
    k = cfg.max_per_img
    ns = cfg.num_stuff_classes
    if use_kernel and cfg.fusion_full_things < k:
        return min((cfg.fusion_full_things + ns + 7) // 8 * 8, k + ns)
    return None


def _shifted(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Edge-clamped shift of the last two axes by (dy, dx) in {-1, 0, 1}."""
    if dy == -1:
        x = jnp.concatenate([x[..., :1, :], x[..., :-1, :]], axis=-2)
    elif dy == 1:
        x = jnp.concatenate([x[..., 1:, :], x[..., -1:, :]], axis=-2)
    if dx == -1:
        x = jnp.concatenate([x[..., :, :1], x[..., :, :-1]], axis=-1)
    elif dx == 1:
        x = jnp.concatenate([x[..., :, 1:], x[..., :, -1:]], axis=-1)
    return x


def _phase_tap_weights(factor: int):
    """Per-phase (base_offset, (w0, w1)) for half-pixel bilinear upsampling."""
    import numpy as np

    p = np.arange(factor)
    src = (p + 0.5) / factor - 0.5
    base = np.floor(src).astype(int)  # -1 or 0
    lam = src - base
    return [(int(base[i]), (float(1 - lam[i]), float(lam[i])))
            for i in range(factor)]


def _phase_upsample(x: jax.Array, py: int, px: int, fy: int,
                    fx: int) -> jax.Array:
    """One (py, px) phase of the exact (fy, fx) bilinear upsample of the
    last two axes: a 4-tap lerp of edge-clamped shifts, same resolution as
    the input."""
    by, (wy0, wy1) = _phase_tap_weights(fy)[py]
    bx, (wx0, wx1) = _phase_tap_weights(fx)[px]
    d = x.dtype

    def t(dy, dx):
        return _shifted(x, dy, dx)

    return (jnp.asarray(wy0 * wx0, d) * t(by, bx)
            + jnp.asarray(wy0 * wx1, d) * t(by, bx + 1)
            + jnp.asarray(wy1 * wx0, d) * t(by + 1, bx)
            + jnp.asarray(wy1 * wx1, d) * t(by + 1, bx + 1))


def _interleave_phases(tiles, fy: int, fx: int) -> jax.Array:
    """tiles: list of fy*fx arrays (..., h, w) ordered (py, px) ->
    output (..., h*fy, w*fx)."""
    h, w = tiles[0].shape[-2:]
    stack = jnp.stack(tiles, axis=0)  # (fy*fx, ..., h, w)
    lead = stack.shape[1:-2]
    stack = stack.reshape((fy, fx) + lead + (h, w))
    # (py, px, ..., h, w) -> (..., h, py, w, px)
    nl = len(lead)
    perm = tuple(range(2, 2 + nl)) + (2 + nl, 0, 3 + nl, 1)
    stack = stack.transpose(perm)
    return stack.reshape(lead + (h * fy, w * fx))


class PanopticResult(NamedTuple):
    """Per-image fused outputs. Candidate arrays are ordered
    [things(top-100), stuff(11, score-sorted)] like the reference."""

    panoptic: jax.Array  # (H, W) int32 segment ids, 0 = void
    semantic: jax.Array  # (H, W) int32 class ids, num_classes = void
    depth: jax.Array  # (H, W) float32 final depth
    depth_basic: jax.Array  # (H, W) float32 dense (initial) depth
    keep: jax.Array  # (K,) bool kept candidates
    seg_ids: jax.Array  # (K,) int32 segment id per candidate (valid if keep)
    labels: jax.Array  # (K,) int32 class per candidate
    scores: jax.Array  # (K,) float32
    is_thing: jax.Array  # (K,) bool
    instance_ids: jax.Array  # (K,) int32 candidate index (reference's k)
    areas: jax.Array  # (K,) int32 argmax-region areas
    masks: jax.Array  # (K, H, W) bool final segment masks (kept rows only);
    # None when emit_marginals=True (marginals replace every consumer)
    # with emit_marginals=True: per-candidate argmax-region row/col counts
    # (NOT keep-gated) and the raw pixel argmax — together they replace the
    # (K, H, W) stack for boxes/areas/track-map
    row_marg: jax.Array | None = None  # (K, H) float32
    col_marg: jax.Array | None = None  # (K, W) float32
    pix_arg: jax.Array | None = None  # (H, W) int32 winning candidate
    # with defer_maps=True: the winner-depth map (panoptic/semantic/depth are
    # None; the caller renders all maps in one pallas pass, map_render.py)
    depth_pix: jax.Array | None = None  # (H, W) float32
    # candidate rows that can actually render (pallas fast path compacts
    # eligible candidates to the front — see fusion prune below); rows
    # beyond n_render have keep=False by construction, so per-candidate
    # tables passed to map rendering may be truncated to [:n_render]
    n_render: int | None = None  # static python int; None = all kk


def fuse_panoptic(cfg: ModelConfig,
                  cls_probs: jax.Array,
                  mask_logits: jax.Array,
                  depth_logits: jax.Array,
                  depth_init_logits: jax.Array,
                  out_hw: Tuple[int, int],
                  fusion_dtype=jnp.float32,
                  num_track_masks: int | None = None,
                  emit_marginals: bool = False,
                  defer_maps: bool = False) -> PanopticResult:
    """Args (single image, final refinement stage, stride-8/4 resolution):
      cls_probs: (111, C) sigmoid class probabilities.
      mask_logits: (111, h, w) mask logits.
      depth_logits: (111, h, w) raw per-query depth.
      depth_init_logits: (h', w') dense depth logits.
      out_hw: original image size (H, W).
      fusion_dtype: bfloat16 halves the HBM traffic of the full-resolution
        candidate stacks (serving fast path); float32 is reference-exact.
      emit_marginals: return row/col argmax-region marginals + pix_arg and
        SKIP materializing the (K, H, W) mask stack — every downstream
        consumer (tight boxes, MAD RoI boxes, track-id map) is a function
        of the marginals/argmax, so the video path avoids writing and
        re-reading ~128MB per frame.
    """
    nt = cfg.num_thing_classes
    ns = cfg.num_stuff_classes
    npp = cfg.num_proposals
    h, w = out_hw

    # --- thing candidates: flattened topk over (100 x 8) ----------------
    thing_scores_all = cls_probs[:npp, :nt].reshape(-1)
    k = cfg.max_per_img
    scores_t, top_idx = jax.lax.top_k(thing_scores_all, k)
    mask_idx = top_idx // nt
    labels_t = (top_idx % nt).astype(jnp.int32)

    # --- stuff candidates: class-diagonal scores, sorted descending ------
    stuff_scores = jnp.diagonal(cls_probs[npp:, nt:])
    order_s = jnp.argsort(-stuff_scores)
    scores_s = stuff_scores[order_s]
    labels_s = (order_s + nt).astype(jnp.int32)

    cand_rows = jnp.concatenate([mask_idx, npp + order_s])  # (K,) rows in 111
    scores = jnp.concatenate([scores_t, scores_s])
    labels = jnp.concatenate([labels_t, labels_s])
    kk = k + ns
    is_thing = jnp.arange(kk) < k

    hs, ws = mask_logits.shape[-2:]
    phased = (h % hs == 0 and w % ws == 0 and 1 <= h // hs <= 8
              and 1 <= w // ws <= 8)
    use_kernel = (phased and fusion_dtype != jnp.float32
                  and _use_pallas_fusion())
    n_render = None
    if use_kernel and cfg.fusion_full_things < k:
        # fusion prune: things are score-sorted, so things that can pass the
        # keep gate (score >= instance_score_thr) form a PREFIX; stuff is
        # always eligible.  Compact [top things, stuff] to the front; the
        # kernel folds the remaining (never-renderable) thing rows into one
        # exact max channel (ops/pallas/phase_fusion.py).  All candidate
        # arrays below use this permuted order consistently.  Capacity knob:
        # if more than fusion_full_things things pass the gate at once, the
        # excess (lowest-scoring) ones render void — same class of static
        # cap as tracker.max_detections.
        ke_t = cfg.fusion_full_things
        perm = jnp.concatenate([jnp.arange(ke_t), k + jnp.arange(ns),
                                jnp.arange(ke_t, k)])
        cand_rows = cand_rows[perm]
        scores = scores[perm]
        labels = labels[perm]
        is_thing = perm < k
        n_render = min((ke_t + ns + 7) // 8 * 8, kk)

    # --- upsample + merge, computed in PHASE SPACE ------------------------
    # For integer upscale factors the half-pixel bilinear upsample splits
    # into fy*fx phases, each a 4-tap lerp of shifted stride-4 maps.  All
    # per-candidate statistics (argmax regions, areas, winner depth) are
    # pointwise over pixels, so the merge runs entirely at stride-4
    # resolution per phase — no (K, H, W) tensor is ever materialized; only
    # the final small maps are interleaved.
    precise = fusion_dtype == jnp.float32
    masks_small = jax.nn.sigmoid(mask_logits[cand_rows].astype(fusion_dtype))
    depth_small = depth_act(depth_logits[cand_rows].astype(fusion_dtype),
                            cfg.depth_act_mode)
    depth_basic = resize_bilinear(
        depth_act(depth_init_logits.astype(jnp.float32), cfg.depth_act_mode)[None],
        (h, w))[0]

    scores_d = scores.astype(fusion_dtype)
    row_marg = col_marg = None
    if use_kernel:
        from ..ops.pallas.phase_fusion import phase_fusion

        fy, fx = h // hs, w // ws
        pix_arg, depth_pix, row_marg, col_marg, oarea = phase_fusion(
            masks_small, scores, depth_small, fy, fx,
            n_full=None if n_render is None else n_render,
            interpret=_pallas_interpret())
        if row_marg.shape[0] < kk:  # pad pruned rows back (zeros => not kept)
            pad = ((0, kk - row_marg.shape[0]), (0, 0))
            row_marg = jnp.pad(row_marg, pad)
            col_marg = jnp.pad(col_marg, pad)
            oarea = jnp.pad(oarea, (0, kk - oarea.shape[0]))
        mask_area = row_marg.sum(axis=1).astype(jnp.int32)
        orig_area = oarea.astype(jnp.int32)
        masks = None
    elif phased:
        fy, fx = h // hs, w // ws
        orig_area = jnp.zeros((kk,), jnp.int32)
        pix_tiles, depth_tiles = [], []
        rowm = [jnp.zeros((kk, hs), jnp.float32) for _ in range(fy)]
        colm = [jnp.zeros((kk, ws), jnp.float32) for _ in range(fx)]
        for py in range(fy):
            for px in range(fx):
                up = _phase_upsample(masks_small, py, px, fy, fx)
                prob = scores_d[:, None, None] * up
                pa = jnp.argmax(prob, axis=0)
                region_p = pa[None] == jnp.arange(kk, dtype=pa.dtype)[:, None, None]
                rowm[py] = rowm[py] + region_p.sum(axis=2)
                colm[px] = colm[px] + region_p.sum(axis=1)
                orig_area = orig_area + (up >= 0.5).sum(axis=(1, 2)).astype(jnp.int32)
                dup = _phase_upsample(depth_small, py, px, fy, fx)
                dsel = jnp.einsum("khw,khw->hw", region_p.astype(fusion_dtype),
                                  dup).astype(jnp.float32)
                pix_tiles.append(pa)
                depth_tiles.append(dsel)
        pix_arg = _interleave_phases(pix_tiles, fy, fx)
        depth_pix = _interleave_phases(depth_tiles, fy, fx)
        # (K, hs, fy) -> (K, H): full-res row r = ys*fy + py
        row_marg = jnp.stack(rowm, axis=-1).reshape(kk, hs * fy)
        col_marg = jnp.stack(colm, axis=-1).reshape(kk, ws * fx)
        mask_area = row_marg.sum(axis=1).astype(jnp.int32)
        masks = None
    else:  # general-resolution fallback: materialize full-res candidates
        masks = resize_bilinear(masks_small, (h, w), precise=precise)
        depth_cand = resize_bilinear(depth_small, (h, w), precise=precise)
        prob_masks = scores_d[:, None, None] * masks
        pix_arg = jnp.argmax(prob_masks, axis=0)
        region = pix_arg[None] == jnp.arange(kk, dtype=pix_arg.dtype)[:, None, None]
        row_marg = region.sum(axis=2).astype(jnp.float32)
        col_marg = region.sum(axis=1).astype(jnp.float32)
        mask_area = row_marg.sum(axis=1).astype(jnp.int32)
        orig_area = (masks >= 0.5).sum(axis=(1, 2)).astype(jnp.int32)
        depth_pix = jnp.einsum("khw,khw->hw", region.astype(fusion_dtype),
                               depth_cand).astype(jnp.float32)

    score_ok = (~is_thing) | (scores >= cfg.instance_score_thr)
    area_ok = (mask_area > 0) & (orig_area > 0)
    ratio_ok = mask_area.astype(jnp.float32) >= (
        cfg.overlap_thr * orig_area.astype(jnp.float32))
    keep = score_ok & area_ok & ratio_ok

    # segment ids assigned in descending score order
    order = jnp.argsort(-scores)
    keep_sorted = keep[order]
    ids_sorted = jnp.cumsum(keep_sorted.astype(jnp.int32))
    seg_ids = jnp.zeros((kk,), jnp.int32).at[order].set(ids_sorted)
    seg_ids = jnp.where(keep, seg_ids, 0)

    if defer_maps:
        # per-pixel table lookups through pix_arg are ~17ms EACH at full res
        # (XLA dynamic gather); the caller renders semantic/panoptic/depth/
        # track in ONE pallas pass (ops/pallas/map_render.py) once the
        # tracker ids are known
        assert emit_marginals, "defer_maps requires emit_marginals"
        panoptic = semantic = depth = None
    else:
        keep_at_pix = keep[pix_arg]
        panoptic = jnp.where(keep_at_pix, seg_ids[pix_arg], 0).astype(jnp.int32)
        semantic = jnp.where(keep_at_pix, labels[pix_arg],
                             cfg.num_classes).astype(jnp.int32)
        depth = jnp.where(keep_at_pix, depth_pix, depth_basic)

    # only the top candidates feed the tracker; avoid materializing the
    # full (K, H, W) stack when a cap is given — and skip it entirely when
    # the caller consumes the marginals instead
    if emit_marginals:
        seg_masks = None
    else:
        nt_masks = kk if num_track_masks is None else min(num_track_masks, kk)
        seg_masks = (pix_arg[None] ==
                     jnp.arange(nt_masks, dtype=pix_arg.dtype)[:, None, None]) \
            & keep[:nt_masks, None, None]

    return PanopticResult(
        panoptic=panoptic,
        semantic=semantic,
        depth=depth,
        depth_basic=depth_basic,
        keep=keep,
        seg_ids=seg_ids,
        labels=labels,
        scores=scores,
        is_thing=is_thing,
        instance_ids=jnp.arange(kk, dtype=jnp.int32),
        areas=mask_area,
        masks=seg_masks,
        row_marg=row_marg if emit_marginals else None,
        col_marg=col_marg if emit_marginals else None,
        pix_arg=pix_arg.astype(jnp.int32) if emit_marginals else None,
        depth_pix=depth_pix if defer_maps else None,
        n_render=n_render,
    )


def segments_info_host(res: PanopticResult, num_thing_classes: int):
    """Host-side conversion of the candidate arrays into the reference's
    ``segments_info`` list (kernel_update.py:519-533)."""
    import numpy as np

    keep = np.asarray(res.keep)
    out = []
    order = np.argsort(-np.asarray(res.scores), kind="stable")
    for kidx in order:
        if not keep[kidx]:
            continue
        entry = {
            "id": int(res.seg_ids[kidx]),
            "isthing": bool(res.is_thing[kidx]),
            "category_id": int(res.labels[kidx]),
        }
        if entry["isthing"]:
            entry["score"] = float(res.scores[kidx])
            entry["instance_id"] = int(res.instance_ids[kidx])
        else:
            entry["area"] = int(res.areas[kidx])
        out.append(entry)
    return out
