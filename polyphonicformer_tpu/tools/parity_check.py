"""One-command checkpoint-parity runbook for the egress moment.

The reference's most important artifacts are its published checkpoints
(`polyphonic_r50_image.pth` / `polyphonic_r50_video.pth`,
/root/reference/configs/polyphonic_image/poly_r50_cityscapes_2x.py:8,
configs/polyphonic_video/poly_r50_cityscapes_1x.py:8, README.md:76,86).
This tool turns "convert + eval_image + eval_video glued by hand" into one
tested command that prints pass/fail against the BASELINE quality gates:

  python -m polyphonicformer_tpu.tools.parity_check \
      --image-pth polyphonic_r50_image.pth \
      --video-pth polyphonic_r50_video.pth \
      --data-root /data/cityscapes_dvps \
      --expected pq@inf=0.655 depth_abs_rel=0.084 dvpq_average=58.1

Stages (each skippable by omitting its inputs):
  1. convert: real torch.save file -> converted .pkl variables
  2. image eval: PQ@lambda + depth metrics over the val split
  3. video eval: streaming/clip inference + DVPQ over 16 (k, lambda) cells
  4. gates: measured vs --expected values within --tol-dvpq / --tol-absrel /
     --tol-pq; exit code 1 if any gate fails, 0 otherwise.

Without --expected the tool prints the measured table and reports the gates
UNVERIFIED (the reference repo records no numbers, BASELINE.md — expected
values must come from running the reference eval once).
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
from typing import Dict, Optional


def convert_checkpoint(pth_path: str, out_pkl: str, video: bool,
                       backbone: str = "resnet50",
                       allow_unsafe: bool = False) -> str:
    """Stage 1: real .pth file -> converted flax variables .pkl."""
    from ..configs import ModelConfig
    from .convert_torch_ckpt import convert_state_dict, load_torch_state_dict

    sd = load_torch_state_dict(pth_path, allow_unsafe=allow_unsafe)
    cfg = ModelConfig(with_track=video, backbone=backbone)
    variables = convert_state_dict(sd, cfg)
    os.makedirs(os.path.dirname(out_pkl) or ".", exist_ok=True)
    with open(out_pkl, "wb") as f:
        pickle.dump(variables, f)
    n = len(sd)
    print(f"[convert] {pth_path} -> {out_pkl} ({n} torch tensors)")
    return out_pkl


def run_image_eval(ckpt_pkl: str, data_root: str, split: str,
                   max_frames: Optional[int], bf16: bool,
                   preset: Optional[str]) -> Dict[str, float]:
    """Stage 2: image-mode PQ@lambda + depth metrics (tools/eval_image.py)."""
    import jax
    import jax.numpy as jnp

    from ..configs import DataConfig, ModelConfig, get_preset
    from ..data.cityscapes_dvps import CityscapesDVPSDataset
    from ..evalutils.runner import evaluate_frames

    if preset:
        exp = get_preset(preset)
        cfg, dc = exp.model, exp.data
    else:
        cfg, dc = ModelConfig(), DataConfig()
    with open(ckpt_pkl, "rb") as f:
        variables = pickle.load(f)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    ds = CityscapesDVPSDataset(data_root, split=split, ref_sample_mode="img",
                               with_depth=True)
    frames = ds.images if max_frames is None else ds.images[:max_frames]
    metrics = evaluate_frames(cfg, dc, variables, ds, frames, verbose=True,
                              bf16=bf16)
    return {k: v for k, v in metrics.items() if isinstance(v, float)}


def run_video_eval(ckpt_pkl: str, data_root: str, split: str,
                   max_frames: Optional[int], bf16: bool,
                   preset: Optional[str], eval_dir: str, clip_len: int,
                   workers: int, nproc: int) -> Dict[str, float]:
    """Stage 3: video inference + DVPQ aggregation (tools/eval_video.py)."""
    from ..evalutils.dvpq import evaluate_dvpq
    from .eval_video import run_inference

    ns = argparse.Namespace(
        data_root=data_root, split=split, checkpoint=ckpt_pkl, preset=preset,
        eval_dir=eval_dir, nproc=nproc, max_frames=max_frames, bf16=bf16,
        shard_id=0, num_shards=1, overrides=None, clip_len=clip_len,
        workers=workers, f32_depth=True)  # strict reference-format dumps
    run_inference(ns)
    results = evaluate_dvpq(eval_dir, nproc=nproc)
    flat: Dict[str, float] = {}
    for cell, vals in results.items():
        for name, v in vals.items():
            flat[f"dvpq_{cell}" if name == "pq"
                 else f"dvpq_{cell}_{name[3:]}"] = v
    flat["dvpq_average"] = results["average"]["pq"]
    return flat


def check_gates(measured: Dict[str, float], expected: Dict[str, float],
                tol_dvpq: float, tol_pq: float, tol_absrel: float) -> bool:
    """Stage 4: BASELINE gates — DVPQ within tol_dvpq (absolute points),
    PQ within tol_pq, depth absRel within tol_absrel."""
    if not expected:
        print("[gates] UNVERIFIED: no --expected values supplied; record the "
              "reference eval's numbers and re-run")
        return True
    ok = True
    for key, want in expected.items():
        if key not in measured:
            print(f"[gates] FAIL {key}: expected {want} but not measured "
                  f"(keys: {sorted(measured)[:8]}...)")
            ok = False
            continue
        got = measured[key]
        tol = (tol_absrel if "abs_rel" in key
               else tol_dvpq if key.startswith("dvpq") else tol_pq)
        status = "PASS" if abs(got - want) <= tol else "FAIL"
        if status == "FAIL":
            ok = False
        print(f"[gates] {status} {key}: measured {got:.4f} vs expected "
              f"{want:.4f} (tol {tol})")
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--image-pth", help="published image checkpoint (.pth)")
    ap.add_argument("--video-pth", help="published video checkpoint (.pth)")
    ap.add_argument("--data-root", help="Cityscapes-DVPS root (omit to only "
                    "convert)")
    ap.add_argument("--split", default="val")
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--preset-image", default=None)
    ap.add_argument("--preset-video", default=None)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--unsafe-load", action="store_true",
                    help="permit full-unpickle torch.load fallback "
                         "(arbitrary code execution on a tampered file)")
    ap.add_argument("--workdir", default="work_dirs/parity_check")
    ap.add_argument("--clip-len", type=int, default=6)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--nproc", type=int, default=8)
    ap.add_argument("--expected", nargs="*", default=[],
                    help="key=value gates, e.g. pq@inf=0.655 "
                    "depth_abs_rel=0.084 dvpq_average=58.1")
    ap.add_argument("--tol-dvpq", type=float, default=0.1,
                    help="BASELINE gate: DVPQ within 0.1 points")
    ap.add_argument("--tol-pq", type=float, default=0.001)
    ap.add_argument("--tol-absrel", type=float, default=0.002,
                    help="BASELINE gate: depth absRel parity")
    args = ap.parse_args(argv)

    expected = {}
    for kv in args.expected:
        k, _, v = kv.partition("=")
        expected[k] = float(v)

    measured: Dict[str, float] = {}
    if args.image_pth:
        image_pkl = os.path.join(args.workdir, "image_vars.pkl")
        convert_checkpoint(args.image_pth, image_pkl, video=False,
                           backbone=args.backbone,
                           allow_unsafe=args.unsafe_load)
        if args.data_root:
            measured.update(run_image_eval(
                image_pkl, args.data_root, args.split, args.max_frames,
                args.bf16, args.preset_image))
    if args.video_pth:
        video_pkl = os.path.join(args.workdir, "video_vars.pkl")
        convert_checkpoint(args.video_pth, video_pkl, video=True,
                           backbone=args.backbone,
                           allow_unsafe=args.unsafe_load)
        if args.data_root:
            measured.update(run_video_eval(
                video_pkl, args.data_root, args.split, args.max_frames,
                args.bf16, args.preset_video,
                os.path.join(args.workdir, "video_eval"), args.clip_len,
                args.workers, args.nproc))

    os.makedirs(args.workdir, exist_ok=True)
    with open(os.path.join(args.workdir, "parity.json"), "w") as f:
        json.dump(measured, f, indent=2)
    for k in sorted(measured):
        print(f"[measured] {k}: {measured[k]:.4f}")

    ok = check_gates(measured, expected, args.tol_dvpq, args.tol_pq,
                     args.tol_absrel)
    print(f"[parity_check] {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
