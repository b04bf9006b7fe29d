"""Shared image-mode evaluation runner: used by the eval CLI and by the
in-training EvalHook (reference: mmdet EvalHook registration,
/root/reference/mmdet/apis/train.py:183-204).

Multi-host: each process evaluates an interleaved shard of the val split
and the per-frame stat arrays are allgathered before aggregation — the
SPMD analogue of mmdet's multi_gpu_test + collect_results_cpu
(/root/reference/mmdet/apis/test.py) feeding EvalHook on rank 0.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .dvpq import DEPTH_THRS
from .vpq import (aggregate_pq, apply_depth_threshold, compute_depth_errors,
                  vpq_eval)

_DEPTH_KEYS = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")

# jitted image-step cache: configs are frozen (hashable) dataclasses, so the
# compiled program is reused across EvalHook invocations instead of
# re-tracing every eval epoch
_STEP_CACHE: Dict[tuple, object] = {}


def _cached_image_step(model_cfg, ori_hw, bf16: bool):
    import jax.numpy as jnp

    from ..infer.pipeline import make_image_step
    from ..models import PolyphonicFormer

    key = (model_cfg, tuple(ori_hw), bf16)
    if key not in _STEP_CACHE:
        dt = jnp.bfloat16 if bf16 else jnp.float32
        model = PolyphonicFormer(model_cfg)
        _STEP_CACHE[key] = make_image_step(model, model_cfg, ori_hw,
                                           compute_dtype=dt, fusion_dtype=dt)
    return _STEP_CACHE[key]


def frame_stats(pred_pan: np.ndarray, gt_pan: np.ndarray,
                pred_depth: np.ndarray, gt_depth: np.ndarray,
                num_classes: int = 19
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Raw per-frame stats, additive across frames/hosts.

    Returns (vpq (L, 4, num_classes+1) f64 — per depth-threshold iou/tp/fn/fp,
    depth (8,) f64 — the 7 depth metrics + a trailing valid flag)."""
    vpq = np.zeros((len(DEPTH_THRS), 4, num_classes + 1), np.float64)
    for li, thr in enumerate(DEPTH_THRS):
        pp = apply_depth_threshold(pred_pan, pred_depth, gt_depth, thr,
                                   num_classes)
        vpq[li] = np.stack(vpq_eval(pp, gt_pan, num_classes=num_classes))
    derr = compute_depth_errors(pred_depth, gt_depth)
    depth = np.asarray([derr[k] for k in _DEPTH_KEYS] + [1.0], np.float64)
    return vpq, depth


def metrics_from_stats(vpq_stats: np.ndarray, depth_stats: np.ndarray,
                       num_classes: int = 19, num_things: int = 8
                       ) -> Dict[str, float]:
    """(N, L, 4, C+1) + (N, 8) stat arrays -> the evaluate_image metric dict
    (reference: datasets/cityscapes_dvps.py:350-443)."""
    out: Dict[str, float] = {}
    w = depth_stats[:, -1]
    denom = max(w.sum(), 1.0)
    for i, k in enumerate(_DEPTH_KEYS):
        out[f"depth_{k}"] = float((depth_stats[:, i] * w).sum() / denom)
    for li, thr in enumerate(DEPTH_THRS):
        per_frame = [tuple(vpq_stats[n, li]) for n in range(vpq_stats.shape[0])]
        agg = aggregate_pq(per_frame, num_classes, num_things)
        key = "inf" if thr == 0 else str(thr)
        out[f"pq@{key}"] = agg["pq"]
        out[f"pq_thing@{key}"] = agg["pq_thing"]
        out[f"pq_stuff@{key}"] = agg["pq_stuff"]
    out["PQ_all"] = out["pq@inf"]
    return out


def _infer_frame_stats(model_cfg, data_cfg, variables, ds, infos,
                       bf16: bool, verbose: bool
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Inference + per-frame stats over ``infos`` on this process."""
    import jax.numpy as jnp

    from ..data.cityscapes_dvps import INSTANCE_DIVISOR
    from ..data.pipeline import make_test_input

    vpqs: List[np.ndarray] = []
    depths: List[np.ndarray] = []
    step = None
    for info in infos:
        frame = ds.load_frame(info, segments=False)
        inp = make_test_input(frame, data_cfg)
        if step is None:
            step = _cached_image_step(model_cfg, inp["ori_hw"], bf16)
        res = step(variables, jnp.asarray(inp["image"])[None])
        sem = np.asarray(res.semantic).astype(np.int64)
        pan = np.asarray(res.panoptic).astype(np.int64)
        is_thing_seg = np.zeros(int(np.asarray(res.seg_ids).max()) + 2, bool)
        keep = np.asarray(res.keep)
        for sid, th in zip(np.asarray(res.seg_ids)[keep],
                           np.asarray(res.is_thing)[keep]):
            is_thing_seg[sid] = th
        inst = np.where(is_thing_seg[pan], pan, 0)
        pred_pan = sem * INSTANCE_DIVISOR + inst
        v, d = frame_stats(pred_pan, frame["pan"], np.asarray(res.depth),
                           frame["depth"])
        vpqs.append(v)
        depths.append(d)
        if verbose:
            print(f"frame {info['seq_id']:06d}_{info['img_id']:06d} done",
                  flush=True)
    lthr, nc1 = len(DEPTH_THRS), 20
    if not vpqs:
        return (np.zeros((0, lthr, 4, nc1)), np.zeros((0, 8)))
    return np.stack(vpqs), np.stack(depths)


def allgather_frame_stats(vpq_stats: np.ndarray, depth_stats: np.ndarray,
                          n_total: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Gather per-process frame-stat shards into the full-split arrays on
    every process (mmdet collect_results_cpu analogue).  Shards are padded
    to equal size with zero rows: zero vpq stats are additive no-ops and a
    zero depth valid-flag drops the row from the weighted mean."""
    import jax
    from jax.experimental import multihost_utils

    world = jax.process_count()
    per = -(-n_total // world)
    pad = per - vpq_stats.shape[0]
    if pad:
        vpq_stats = np.concatenate(
            [vpq_stats, np.zeros((pad,) + vpq_stats.shape[1:])])
        depth_stats = np.concatenate(
            [depth_stats, np.zeros((pad, depth_stats.shape[1]))])
    vpq_all = np.asarray(multihost_utils.process_allgather(vpq_stats))
    depth_all = np.asarray(multihost_utils.process_allgather(depth_stats))
    return (vpq_all.reshape((-1,) + vpq_stats.shape[1:]),
            depth_all.reshape((-1, depth_stats.shape[1])))


def evaluate_frames(model_cfg, data_cfg, variables, ds, frames,
                    verbose: bool = False, bf16: bool = False,
                    sharded: bool = False) -> Dict[str, float]:
    """Run single-frame panoptic+depth inference over ``frames`` and compute
    image PQ + depth metrics (CityscapesDVPSDataset.evaluate equivalent).

    ``sharded=True`` under multi-process JAX: this process evaluates
    frames[rank::world]; the per-frame stats allgather across hosts so every
    process returns the FULL-split metrics.
    """
    import jax

    world = jax.process_count()
    if sharded and world > 1:
        rank = jax.process_index()
        mine = list(frames)[rank::world]
        vpq_stats, depth_stats = _infer_frame_stats(
            model_cfg, data_cfg, variables, ds, mine, bf16, verbose)
        vpq_all, depth_all = allgather_frame_stats(
            vpq_stats, depth_stats, n_total=len(frames))
        return metrics_from_stats(vpq_all, depth_all)

    vpq_stats, depth_stats = _infer_frame_stats(
        model_cfg, data_cfg, variables, ds, frames, bf16, verbose)
    return metrics_from_stats(vpq_stats, depth_stats)


def make_eval_hook(cfg, variables_fn, max_images: Optional[int] = 50,
                   split: str = "val", sharded: bool = False,
                   bf16: bool = False):
    """Returns eval_hook(step) -> Optional[dict]; None when the val split is
    absent (synthetic-data runs).  ``max_images`` None/0 = the FULL val
    split (reference EvalHook fidelity, mmdet/apis/train.py:183-204)."""
    from ..data.cityscapes_dvps import CityscapesDVPSDataset

    try:
        ds = CityscapesDVPSDataset(cfg.data.data_root, split=split,
                                   ref_sample_mode="img", with_depth=True)
        err = None
    except Exception as e:  # val split not on disk
        ds, err = None, e
    frames = [] if ds is None else (
        ds.images if not max_images else ds.images[:max_images])
    if sharded:
        # Every process must agree on whether the hook runs: a host that
        # failed to load the split while others succeeded would leave the
        # healthy ranks blocked forever in process_allgather at the first
        # eval step.  Gather an availability flag and decide consistently.
        import jax
        from jax.experimental import multihost_utils
        if jax.process_count() > 1:
            import numpy as np
            ok = np.asarray(
                multihost_utils.process_allgather(
                    np.asarray([1 if frames else 0], np.int32))).reshape(-1)
            if ok.min() != ok.max():
                raise RuntimeError(
                    f"val split visible on only {int(ok.sum())}/{ok.size} "
                    f"hosts (this rank: {'ok' if frames else err}); mount "
                    "the dataset on every host or drop --eval-interval")
    if err is not None:
        print(f"eval hook disabled ({err})")
        return None
    if not frames:
        print("eval hook disabled (empty val split)")
        return None

    def hook(step: int) -> Dict[str, float]:
        import jax

        metrics = evaluate_frames(cfg.model, cfg.data, variables_fn(), ds,
                                  frames, bf16=bf16, sharded=sharded)
        flat = {k: v for k, v in metrics.items() if isinstance(v, float)}
        if jax.process_index() == 0:
            summary = " ".join(
                f"{k}={v:.4f}" for k, v in sorted(flat.items())
                if k in ("pq@inf", "pq_thing@inf", "pq_stuff@inf",
                         "depth_abs_rel"))
            print(f"[eval @ step {step}] {summary} ({len(frames)} frames)",
                  flush=True)
        return flat

    return hook
