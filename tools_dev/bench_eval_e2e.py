"""End-to-end video-eval throughput: PNG decode (worker processes) +
clip-mode inference + pred/gt dump writes, on real 1024x2048 frames.

Round-3 VERDICT weak #3: the 47.9 fps headline was device-only clip mode,
while the real eval loop decoded PNGs on one thread.  This measures the
actual tools/eval_video.py inference path (MPEvalLoader ring + clip
dispatch + async npz writes) over a synthetic 1024x2048 PNG val tree, and
compares against the device-only clip rate.

Usage (real chip, axon env intact):
  PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/bench_eval_e2e.py \
      [--seqs 8] [--clip-len 6] [--workers 8] [--keep-tree]
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_val_tree(root: str, num_seqs: int, frames_per_seq: int = 6,
                  h: int = 1024, w: int = 2048) -> None:
    """Synthetic Cityscapes-DVPS val split with realistic PNG entropy:
    smooth structure + textured regions so decode cost is representative
    (pure noise over-states it ~3x, constant images understate it ~10x)."""
    import cv2

    d = os.path.join(root, "video_sequence", "val")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for seq in range(num_seqs):
        base = (
            80 + 60 * np.sin(xx / (97.0 + seq) + seq)
            + 50 * np.cos(yy / 53.0)
        )
        for t in range(frames_per_seq):
            img = np.stack([base + 10 * t, base * 0.8, base * 1.1], -1)
            # textured blocks (vegetation/road grain)
            tex = rng.randn(h // 4, w // 4, 3).astype(np.float32) * 25
            img[: h // 4 * 4 : 4, : w // 4 * 4 : 4] += tex
            img = np.clip(img, 0, 255).astype(np.uint8)
            stem = f"{seq:06d}_{t:06d}_loc_000019_000000"
            cv2.imwrite(os.path.join(d, f"{stem}_leftImg8bit.png"), img)
            pan = np.full((h, w), 0 * 1000, np.int32)
            pan[: h // 3] = 10 * 1000
            for i in range(6):
                y, x = 400 + 40 * i, 200 + 250 * i + 11 * t
                pan[y : y + 160, x : x + 220] = 13 * 1000 + (i + 1)
            cv2.imwrite(os.path.join(d, f"{stem}_gtFine_instanceTrainIds.png"),
                        pan.astype(np.uint16))
            depth = (rng.rand(h, w).astype(np.float32) * 60 + 1) * 256
            cv2.imwrite(os.path.join(d, f"{stem}_depth.png"),
                        depth.astype(np.uint16))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", type=int, default=8)
    ap.add_argument("--clip-len", type=int, default=6)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--tree", default=None,
                    help="existing val tree root (skips generation)")
    ap.add_argument("--keep-tree", action="store_true")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    import pickle

    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.tools import eval_video

    root = args.tree or tempfile.mkdtemp(prefix="dvps_bench_")
    if not args.tree:
        t0 = time.time()
        make_val_tree(root, args.seqs)
        print(f"synthetic val tree: {args.seqs} seqs x 6 frames "
              f"({time.time()-t0:.1f}s) at {root}")

    cfg = ModelConfig(with_track=True)
    model = PolyphonicFormer(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 128, 3), jnp.float32),
                           method=PolyphonicFormer.init_all)
    ckpt = os.path.join(root, "vars.pkl")
    with open(ckpt, "wb") as f:
        pickle.dump(jax.device_get(variables), f)

    eval_dir = os.path.join(root, "eval")
    ns = argparse.Namespace(
        data_root=root, split="val", checkpoint=ckpt, preset=None,
        eval_dir=eval_dir, nproc=4, max_frames=None, bf16=not args.f32,
        shard_id=0, num_shards=1, overrides=None, clip_len=args.clip_len,
        workers=args.workers)

    # warm run compiles; timed run measures steady state
    n_frames = args.seqs * 6
    for label in ("warm(compile)", "timed"):
        shutil.rmtree(eval_dir, ignore_errors=True)
        t0 = time.time()
        eval_video.run_inference(ns)
        dt = time.time() - t0
        print(f"{label}: {n_frames} frames in {dt:.2f}s = "
              f"{n_frames/dt:.2f} fps e2e")

    if not args.tree and not args.keep_tree:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
