"""Video (DVPS) evaluation CLI: streaming per-frame inference with tracking,
then DVPQ over windows k in {1..4} x depth thresholds.

reference: /root/reference/tools/test_video.py +
polyphonic/apis/{video_inference,video_evaluate}.py.

Frame-id convention: the tracker sees frame ids counted from 1 at each
sequence start (the reference counts from the sequence's img_id==0).  Track
expiry (memo_frames) is relative to the current frame in both, so
associations are identical; only the absolute ids stored in tracker state
differ by 1.
"""
from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--checkpoint", required=True, help="converted .pkl variables")
    ap.add_argument("--preset", default=None,
                    help="config preset (default: full R50 model)")
    ap.add_argument("--eval-dir", default="work_dirs/video_eval")
    ap.add_argument("--nproc", type=int, default=8)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute + Pallas fusion fast path (2.8x; maps "
                    "differ from f32 only on argmax-boundary pixels)")
    ap.add_argument("--shard-id", type=int, default=0,
                    help="with --num-shards: process sequences with "
                    "seq_id %% num_shards == shard_id (dist_test.sh "
                    "equivalent: one process per chip, shared eval dir, "
                    "then aggregate once with --skip-infer)")
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--skip-infer", action="store_true",
                    help="only aggregate an existing eval dir")
    ap.add_argument("--skip-aggregate", action="store_true",
                    help="only run inference (aggregate later)")
    ap.add_argument("--set", nargs="*", dest="overrides",
                    help="dotted-path config overrides key=value "
                    "(reference --cfg-options, tools/test_video.py:94)")
    ap.add_argument("--eval-stq", action="store_true",
                    help="also aggregate STQ (the SemKITTI-DVPS challenge "
                    "metric; the reference ships the components in "
                    "datasets/utils.py:140-168 but never wires them to a "
                    "tool)")
    args = ap.parse_args()

    from ..evalutils.dvpq import evaluate_dvpq, save_frame

    if not args.skip_infer:
        run_inference(args)
    if args.skip_aggregate:
        return
    if args.num_shards > 1:
        # other shard processes may still be writing into the shared eval
        # dir; aggregating now would yield partial/racy DVPQ. Aggregate
        # once afterwards with --skip-infer.
        print(f"shard {args.shard_id}/{args.num_shards}: inference done; "
              "skipping aggregation (run once with --skip-infer when all "
              "shards have finished)")
        return

    results = evaluate_dvpq(args.eval_dir, nproc=args.nproc)
    for key, val in results.items():
        print(f"DVPQ[{key}] : {val['pq']:.3f} thing {val['pq_thing']:.3f} "
              f"stuff {val['pq_stuff']:.3f}")
    if args.eval_stq:
        results["stq"] = aggregate_stq(args.eval_dir)
        print("STQ : " + "  ".join(f"{k} {v:.4f}"
                                   for k, v in results["stq"].items()))
    with open(os.path.join(args.eval_dir, "dvpq.json"), "w") as f:
        json.dump(results, f, indent=2)


def aggregate_stq(eval_dir: str) -> dict:
    """STQ over the saved pred/gt frame dumps, per-sequence association."""
    import numpy as np

    from ..evalutils.dvpq import list_frames
    from ..evalutils.stq import STQAccumulator

    pred_paths = list_frames(eval_dir, "pred")
    gt_paths = list_frames(eval_dir, "gt")
    acc = STQAccumulator()
    for pp, gp in zip(pred_paths, gt_paths):
        seq_id = int(os.path.basename(pp).split("_")[0])
        pred = np.load(pp)["panseg"].astype(np.int64)
        gt = np.load(gp)["panseg"].astype(np.int64)
        acc.update(pred, gt, seq_id=seq_id)
    return acc.result()


def run_inference(args) -> None:
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    from ..data.cityscapes_dvps import CityscapesDVPSDataset, INSTANCE_DIVISOR
    from ..data.pipeline import make_test_input
    from ..evalutils.dvpq import save_frame
    from ..infer.pipeline import make_video_step
    from ..infer.tracker import init_tracker_state
    from ..models import PolyphonicFormer

    if args.preset:
        from ..configs import get_preset

        exp = get_preset(args.preset)
    else:
        import dataclasses

        from ..configs import ExperimentConfig

        exp = ExperimentConfig()
        exp = dataclasses.replace(
            exp, model=dataclasses.replace(exp.model, with_track=True))
    if getattr(args, "overrides", None):
        from ..configs import apply_overrides

        from .train import parse_overrides

        exp = apply_overrides(exp, parse_overrides(args.overrides))
    cfg, dc = exp.model, exp.data
    model = PolyphonicFormer(cfg)
    with open(args.checkpoint, "rb") as f:
        variables = pickle.load(f)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    ds = CityscapesDVPSDataset(args.data_root, split=args.split,
                               ref_sample_mode="img", with_depth=True)
    frames = ds.images if args.max_frames is None else ds.images[:args.max_frames]
    if args.num_shards > 1:
        # whole sequences per shard: the tracker state chain is sequential
        # within a sequence but sequences are independent
        frames = [f for f in frames
                  if f["seq_id"] % args.num_shards == args.shard_id]

    # Pipelined loop: the next frame decodes on a worker thread and the
    # previous frame's outputs are written while the device computes (JAX
    # dispatch is async; only np.asarray blocks).  The tracker-state chain
    # forces sequential steps but not sequential host IO.
    total_overflow = 0

    def save_outputs(info, frame, fo) -> None:
        nonlocal total_overflow
        sem = np.asarray(fo.semantic).astype(np.int64)
        track = np.asarray(fo.track_map).astype(np.int64)
        depth = np.asarray(fo.depth)
        pred_pan = sem * INSTANCE_DIVISOR + track
        save_frame(args.eval_dir, "pred", info["seq_id"], info["img_id"],
                   pred_pan, depth)
        save_frame(args.eval_dir, "gt", info["seq_id"], info["img_id"],
                   frame["pan"], frame["depth"])
        ovf = int(fo.track_overflow)
        total_overflow += ovf
        msg = f"frame {info['seq_id']:06d}_{info['img_id']:06d} done"
        if ovf:
            msg += (f"  WARNING: {ovf} kept thing segment(s) beyond tracker "
                    f"capacity ({cfg.tracker.max_detections}) dropped to id 0")
        print(msg, flush=True)

    def load(info):
        frame = ds.load_frame(info)
        return info, frame, make_test_input(frame, dc)

    step = None
    state = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)
    prev_seq = None
    frame_counter = 0
    pending = None  # (info, frame, fo) whose device outputs are in flight
    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(load, frames[0]) if frames else None
        for i in range(len(frames)):
            info, frame, inp = fut.result()
            if i + 1 < len(frames):
                fut = pool.submit(load, frames[i + 1])
            if step is None:
                step = make_video_step(model, cfg, inp["ori_hw"],
                                       compute_dtype=dtype,
                                       fusion_dtype=dtype)
            if info["seq_id"] != prev_seq:
                # tracker reset at sequence start (video_inference.py:24-25)
                state = init_tracker_state(cfg.tracker,
                                           cfg.track_head.embed_channels)
                frame_counter = 1
                prev_seq = info["seq_id"]
            fo, state = step(variables, jnp.asarray(inp["image"])[None],
                             state, jnp.int32(frame_counter))
            frame_counter += 1
            if pending is not None:
                save_outputs(*pending)
            pending = (info, frame, fo)
    if pending is not None:
        save_outputs(*pending)
    if total_overflow:
        print(f"tracker capacity overflow total: {total_overflow} segments "
              f"(raise tracker.max_detections)", flush=True)


if __name__ == "__main__":
    main()
