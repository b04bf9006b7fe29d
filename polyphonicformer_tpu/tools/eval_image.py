"""Image-mode evaluation CLI: single-frame panoptic+depth inference and
PQ@lambda + depth metrics.

reference: /root/reference/tools/test.py + CityscapesDVPSDataset.evaluate
(datasets/cityscapes_dvps.py:350-443).
"""
from __future__ import annotations

import argparse
import json
import pickle

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--checkpoint", required=True, help="converted .pkl variables")
    ap.add_argument("--preset", default=None,
                    help="config preset (default: full R50 model)")
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..configs import DataConfig, ModelConfig
    from ..data.cityscapes_dvps import CityscapesDVPSDataset
    from ..data.pipeline import make_test_input
    from ..evalutils.dvpq import evaluate_image
    from ..infer.pipeline import make_image_step
    from ..models import PolyphonicFormer

    if args.preset:
        from ..configs import get_preset

        exp = get_preset(args.preset)
        cfg, dc = exp.model, exp.data
    else:
        cfg, dc = ModelConfig(), DataConfig()
    model = PolyphonicFormer(cfg)
    with open(args.checkpoint, "rb") as f:
        variables = pickle.load(f)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    ds = CityscapesDVPSDataset(args.data_root, split=args.split,
                               ref_sample_mode="img", with_depth=True)
    frames = ds.images if args.max_frames is None else ds.images[:args.max_frames]

    from ..data.cityscapes_dvps import INSTANCE_DIVISOR

    step = None
    pred_pans, gt_pans, pred_depths, gt_depths = [], [], [], []
    for info in frames:
        frame = ds.load_frame(info)
        inp = make_test_input(frame, dc)
        if step is None:
            step = make_image_step(model, cfg, inp["ori_hw"])
        res = step(variables, jnp.asarray(inp["image"])[None])
        # cat_map * DIV + segment ids, stuff instances zeroed
        # (datasets/cityscapes_dvps.py:366-377)
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
        print(f"frame {info['seq_id']:06d}_{info['img_id']:06d} done", flush=True)

    metrics = evaluate_image(pred_pans, gt_pans, pred_depths, gt_depths)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({k: (v if isinstance(v, float) else None)
                       for k, v in metrics.items()}, f, indent=2)


if __name__ == "__main__":
    main()
