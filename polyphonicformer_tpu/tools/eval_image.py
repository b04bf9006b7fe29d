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
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute + Pallas fusion fast path")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ..configs import DataConfig, ModelConfig
    from ..data.cityscapes_dvps import CityscapesDVPSDataset
    from ..evalutils.runner import evaluate_frames

    if args.preset:
        from ..configs import get_preset

        exp = get_preset(args.preset)
        cfg, dc = exp.model, exp.data
    else:
        cfg, dc = ModelConfig(), DataConfig()
    with open(args.checkpoint, "rb") as f:
        variables = pickle.load(f)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    ds = CityscapesDVPSDataset(args.data_root, split=args.split,
                               ref_sample_mode="img", with_depth=True)
    frames = ds.images if args.max_frames is None else ds.images[:args.max_frames]

    metrics = evaluate_frames(cfg, dc, variables, ds, frames, verbose=True,
                              bf16=args.bf16)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}" if isinstance(v, float) else f"{k}: {v}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({k: (v if isinstance(v, float) else None)
                       for k, v in metrics.items()}, f, indent=2)


if __name__ == "__main__":
    main()
