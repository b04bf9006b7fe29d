"""Depth-aware Video Panoptic Quality (DVPQ) evaluation.

reference: /root/reference/polyphonic/apis/video_evaluate.py:40-111 — for
each window size k in {1,2,3,4} and depth threshold lambda in
{inf, 0.5, 0.25, 0.1}: concatenate k consecutive same-sequence frames
width-wise, void out depth-inaccurate predictions, run vpq_eval, aggregate
PQ = SQ * RQ.  Clips are evaluated on a process pool.

Frame storage uses .npz (numpy) instead of torch .pth files.
"""
from __future__ import annotations

import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Sequence

import numpy as np

from .vpq import aggregate_pq, apply_depth_threshold, vpq_eval

WINDOWS = (1, 2, 3, 4)
DEPTH_THRS = (0.0, 0.5, 0.25, 0.1)


def save_frame(save_dir: str, kind: str, seq_id: int, img_id: int,
               panseg: np.ndarray, depth: np.ndarray) -> None:
    """Dump one frame. ``depth`` is either float32 meters (stored as-is,
    the reference's dump dtype — datasets/cityscapes_dvps.py:336) or uint16
    on the Cityscapes-DVPS disk grid (meters * 256, stored packed: half the
    bytes and much cheaper zlib; readers transparently decode)."""
    d = os.path.join(save_dir, kind)
    os.makedirs(d, exist_ok=True)
    dep = depth if depth.dtype == np.uint16 else depth.astype(np.float32)
    np.savez_compressed(os.path.join(d, f"{seq_id:06d}_{img_id:06d}.npz"),
                        panseg=panseg.astype(np.uint32), depth=dep)


def load_depth_dump(f) -> np.ndarray:
    """Depth from a frame dump in float32 meters, whichever way it was
    stored (f32 passthrough / uint16 grid / 256)."""
    dep = f["depth"]
    if dep.dtype == np.uint16:
        return dep.astype(np.float32) / 256.0
    return dep


def _eval_clip(args):
    pred_paths, gt_paths, depth_thr, num_classes = args
    preds = [np.load(p) for p in pred_paths]
    gts = [np.load(p) for p in gt_paths]
    pred_pan = np.concatenate([p["panseg"].astype(np.int64) for p in preds], axis=1)
    gt_pan = np.concatenate([g["panseg"].astype(np.int64) for g in gts], axis=1)
    pred_dep = np.concatenate([load_depth_dump(p) for p in preds], axis=1)
    gt_dep = np.concatenate([load_depth_dump(g) for g in gts], axis=1)
    pred_pan = apply_depth_threshold(pred_pan, pred_dep, gt_dep, depth_thr,
                                     num_classes)
    return vpq_eval(pred_pan, gt_pan, num_classes=num_classes)


def list_frames(eval_dir: str, kind: str) -> List[str]:
    d = os.path.join(eval_dir, kind)
    names = sorted(x for x in os.listdir(d)
                   if x.endswith(".npz") and not x.startswith("._"))
    return [os.path.join(d, x) for x in names]


def evaluate_dvpq(eval_dir: str, num_classes: int = 19, num_things: int = 8,
                  nproc: int = 32,
                  windows: Sequence[int] = WINDOWS,
                  depth_thrs: Sequence[float] = DEPTH_THRS
                  ) -> Dict[str, Dict[str, float]]:
    """Returns {f"k{k}_l{lambda}": {"pq":..., "pq_thing":..., "pq_stuff":...}}
    plus the reference's headline averages."""
    pred_paths = list_frames(eval_dir, "pred")
    gt_paths = list_frames(eval_dir, "gt")
    assert len(pred_paths) == len(gt_paths), "pred/gt frame count mismatch"
    seq_of = [int(os.path.basename(p).split("_")[0]) for p in pred_paths]
    n = len(pred_paths)

    results: Dict[str, Dict[str, float]] = {}
    all_pq, all_th, all_st = [], [], []
    with ProcessPoolExecutor(max_workers=nproc) as pool:
        for k in windows:
            for thr in depth_thrs:
                tasks = []
                for idx in range(n):
                    if idx + k - 1 >= n or seq_of[idx] != seq_of[idx + k - 1]:
                        continue
                    tasks.append((pred_paths[idx:idx + k], gt_paths[idx:idx + k],
                                  thr, num_classes))
                if not tasks:
                    continue
                clip_results = list(pool.map(_eval_clip, tasks, chunksize=8))
                agg = aggregate_pq(clip_results, num_classes, num_things)
                key = f"k{k}_l{'inf' if thr == 0 else thr}"
                results[key] = {
                    "pq": agg["pq"] * 100,
                    "pq_thing": agg["pq_thing"] * 100,
                    "pq_stuff": agg["pq_stuff"] * 100,
                }
                all_pq.append(agg["pq"] * 100)
                all_th.append(agg["pq_thing"] * 100)
                all_st.append(agg["pq_stuff"] * 100)
    results["average"] = {
        "pq": float(np.mean(all_pq)) if all_pq else 0.0,
        "pq_thing": float(np.mean(all_th)) if all_th else 0.0,
        "pq_stuff": float(np.mean(all_st)) if all_st else 0.0,
    }
    return results


def evaluate_image(pred_pans: List[np.ndarray], gt_pans: List[np.ndarray],
                   pred_depths: List[np.ndarray], gt_depths: List[np.ndarray],
                   num_classes: int = 19, num_things: int = 8
                   ) -> Dict[str, object]:
    """Image-mode evaluation: per-frame PQ at lambda in {inf,.5,.25,.1} plus
    depth metrics (reference: datasets/cityscapes_dvps.py:350-443)."""
    from .vpq import compute_depth_errors

    out: Dict[str, object] = {}
    depth_metrics: Dict[str, List[float]] = {}
    for dp, dg in zip(pred_depths, gt_depths):
        for k, v in compute_depth_errors(dp, dg).items():
            depth_metrics.setdefault(k, []).append(v)
    for k, v in depth_metrics.items():
        out[f"depth_{k}"] = float(np.mean(v))

    for thr in DEPTH_THRS:
        frame_results = []
        for pp, gp, dp, dg in zip(pred_pans, gt_pans, pred_depths, gt_depths):
            ppc = apply_depth_threshold(pp, dp, dg, thr, num_classes)
            frame_results.append(vpq_eval(ppc, gp, num_classes=num_classes))
        agg = aggregate_pq(frame_results, num_classes, num_things)
        key = "inf" if thr == 0 else str(thr)
        out[f"pq@{key}"] = agg["pq"]
        out[f"pq_thing@{key}"] = agg["pq_thing"]
        out[f"pq_stuff@{key}"] = agg["pq_stuff"]
    out["PQ_all"] = out["pq@inf"]
    return out
