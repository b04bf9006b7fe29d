"""Demo CLI: run panoptic+depth inference on arbitrary images and save
colorized visualizations (panoptic overlay + depth map).

reference capability: /root/reference/demo/ (visualization of predictions).
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np

# thing-first palette (reference datasets/cityscapes_dvps.py:37-86)
PALETTE = np.asarray([
    (220, 20, 60), (255, 0, 0), (0, 0, 142), (0, 0, 70),
    (0, 60, 100), (0, 80, 100), (0, 0, 230), (119, 11, 32),
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (0, 0, 0),
], np.uint8)


def colorize_panoptic(semantic: np.ndarray, panoptic: np.ndarray) -> np.ndarray:
    """Class colors with per-instance brightness jitter."""
    rgb = PALETTE[np.clip(semantic, 0, 19)]
    rng = np.random.RandomState(0)
    out = rgb.astype(np.int32)
    for sid in np.unique(panoptic):
        if sid == 0:
            continue
        jitter = rng.randint(-40, 40, (3,))
        out[panoptic == sid] = np.clip(out[panoptic == sid] + jitter, 0, 255)
    return out.astype(np.uint8)


def colorize_depth(depth: np.ndarray, max_depth: float = 80.0) -> np.ndarray:
    import cv2

    d = np.clip(depth / max_depth, 0, 1)
    d8 = (255 * (1 - d)).astype(np.uint8)
    return cv2.applyColorMap(d8, cv2.COLORMAP_MAGMA)[:, :, ::-1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="+", help="input image paths")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--preset", default=None)
    ap.add_argument("--out-dir", default="demo_out")
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from ..configs import DataConfig, ModelConfig, get_preset
    from ..data.pipeline import make_test_input
    from ..infer.pipeline import make_image_step
    from ..models import PolyphonicFormer

    if args.preset:
        exp = get_preset(args.preset)
        cfg, dc = exp.model, exp.data
    else:
        cfg, dc = ModelConfig(), DataConfig()
    model = PolyphonicFormer(cfg)
    with open(args.checkpoint, "rb") as f:
        variables = pickle.load(f)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)

    os.makedirs(args.out_dir, exist_ok=True)
    step = None
    for path in args.images:
        img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        frame = dict(img=img, seq_id=0, img_id=0)
        inp = make_test_input(frame, dc)
        if step is None:
            step = make_image_step(model, cfg, inp["ori_hw"])
        res = step(variables, jnp.asarray(inp["image"])[None])
        sem = np.asarray(res.semantic)
        pan = np.asarray(res.panoptic)
        depth = np.asarray(res.depth)
        vis = colorize_panoptic(sem, pan)
        blend = (0.5 * img + 0.5 * vis).astype(np.uint8)
        stem = os.path.splitext(os.path.basename(path))[0]
        cv2.imwrite(os.path.join(args.out_dir, f"{stem}_panoptic.png"),
                    blend[:, :, ::-1])
        cv2.imwrite(os.path.join(args.out_dir, f"{stem}_depth.png"),
                    colorize_depth(depth)[:, :, ::-1])
        print(f"{path} -> {args.out_dir}/{stem}_*.png")


if __name__ == "__main__":
    main()
