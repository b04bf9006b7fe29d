"""Shared image-mode evaluation runner: used by the eval CLI and by the
in-training EvalHook (reference: mmdet EvalHook registration,
/root/reference/mmdet/apis/train.py:183-204)."""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def evaluate_frames(model_cfg, data_cfg, variables, ds, frames,
                    verbose: bool = False, bf16: bool = False) -> Dict[str, float]:
    """Run single-frame panoptic+depth inference over ``frames`` and compute
    image PQ + depth metrics (CityscapesDVPSDataset.evaluate equivalent,
    /root/reference/datasets/cityscapes_dvps.py:350-443)."""
    import jax
    import jax.numpy as jnp

    from ..data.cityscapes_dvps import INSTANCE_DIVISOR
    from ..data.pipeline import make_test_input
    from ..evalutils.dvpq import evaluate_image
    from ..infer.pipeline import make_image_step
    from ..models import PolyphonicFormer

    model = PolyphonicFormer(model_cfg)
    step = None
    pred_pans, gt_pans, pred_depths, gt_depths = [], [], [], []
    for info in frames:
        frame = ds.load_frame(info)
        inp = make_test_input(frame, data_cfg)
        if step is None:
            import jax.numpy as _jnp

            dt = _jnp.bfloat16 if bf16 else _jnp.float32
            step = make_image_step(model, model_cfg, inp["ori_hw"],
                                   compute_dtype=dt, fusion_dtype=dt)
        res = step(variables, jnp.asarray(inp["image"])[None])
        sem = np.asarray(res.semantic).astype(np.int64)
        pan = np.asarray(res.panoptic).astype(np.int64)
        is_thing_seg = np.zeros(int(np.asarray(res.seg_ids).max()) + 2, bool)
        keep = np.asarray(res.keep)
        for sid, th in zip(np.asarray(res.seg_ids)[keep],
                           np.asarray(res.is_thing)[keep]):
            is_thing_seg[sid] = th
        inst = np.where(is_thing_seg[pan], pan, 0)
        pred_pans.append(sem * INSTANCE_DIVISOR + inst)
        gt_pans.append(frame["pan"])
        pred_depths.append(np.asarray(res.depth))
        gt_depths.append(frame["depth"])
        if verbose:
            print(f"frame {info['seq_id']:06d}_{info['img_id']:06d} done",
                  flush=True)
    return evaluate_image(pred_pans, gt_pans, pred_depths, gt_depths)


def make_eval_hook(cfg, variables_fn, max_images: int = 50,
                   split: str = "val"):
    """Returns eval_hook(step) -> Optional[dict]; None when the val split is
    absent (synthetic-data runs)."""
    from ..data.cityscapes_dvps import CityscapesDVPSDataset

    try:
        ds = CityscapesDVPSDataset(cfg.data.data_root, split=split,
                                   ref_sample_mode="img", with_depth=True)
    except Exception as e:  # val split not on disk
        print(f"eval hook disabled ({e})")
        return None
    frames = ds.images[:max_images]
    if not frames:
        print("eval hook disabled (empty val split)")
        return None

    def hook(step: int) -> Dict[str, float]:
        metrics = evaluate_frames(cfg.model, cfg.data, variables_fn(), ds,
                                  frames)
        flat = {k: v for k, v in metrics.items() if isinstance(v, float)}
        summary = " ".join(
            f"{k}={v:.4f}" for k, v in sorted(flat.items())
            if k in ("pq@inf", "pq_thing@inf", "pq_stuff@inf",
                     "depth_abs_rel"))
        print(f"[eval @ step {step}] {summary}", flush=True)
        return flat

    return hook
