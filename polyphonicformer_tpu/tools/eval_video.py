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
    ap.add_argument("--clip-len", type=int, default=6,
                    help="frames per device dispatch (lax.scan clip mode; "
                    "6 = one Cityscapes-DVPS val sequence). 1 = per-frame "
                    "streaming dispatch")
    ap.add_argument("--workers", type=int, default=4,
                    help="PNG-decode worker processes (shared-memory ring; "
                    "reference analog: mmdet dataloader workers)")
    ap.add_argument("--f32-depth", dest="f32_depth", action="store_true",
                    help="dump predicted depth as raw float32 meters (the "
                         "reference's dump dtype) instead of the uint16 "
                         "1/256 m grid — for strict-parity runs")
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

    from ..evalutils.dvpq import evaluate_dvpq

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
    from ..data.mp_loader import MPEvalLoader
    from ..data.pipeline import make_test_input
    from ..evalutils.dvpq import save_frame
    from ..infer.pipeline import make_clip_step, make_video_step
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

    if not frames:
        return

    # Pipelined loop: PNG triplets decode on worker PROCESSES through a
    # shared-memory ring (workers also write the GT dumps), the device runs
    # clip-mode inference (lax.scan over --clip-len frames per dispatch,
    # amortizing the dispatch floor), and pred dumps compress on a thread
    # pool while the next clip computes.  The tracker-state chain forces
    # sequential device steps but not sequential host IO.
    total_overflow = 0

    # probe one frame for static shapes (val images share one size)
    probe = make_test_input(ds.load_frame(frames[0], segments=False), dc)
    ori_hw = probe["ori_hw"]
    padded_hw = probe["image"].shape[:2]
    t_clip = max(1, args.clip_len)

    # Device-side output packing: combine semantic/track into the single
    # int32 panoptic map (the exact sem * DIVISOR + track the host would
    # compute) and quantize depth onto the Cityscapes-DVPS disk grid
    # (uint16, meters * 256 — the same 1/256 m grid the GT itself is stored
    # at, so GT roundtrips losslessly and pred picks up <=2 mm quantization).
    # Halves device->host traffic per frame (24 -> 12 MB at 1024x2048),
    # which on PCIe is free and through this testbed's relay tunnel
    # (~6-10 MB/s D2H) is the difference between 9 s and ~1.5 s per frame.
    # --f32-depth opts out (strict reference-format parity runs): dumps the
    # raw float32 meters like the reference's pred dumps, at 2x D2H bytes.
    f32_depth = bool(getattr(args, "f32_depth", False))

    @jax.jit
    def pack_outputs(sem, track, depth):
        pan = sem.astype(jnp.int32) * INSTANCE_DIVISOR + track.astype(jnp.int32)
        if f32_depth:
            return pan, depth.astype(jnp.float32)
        d16 = jnp.clip(jnp.round(depth.astype(jnp.float32) * 256.0),
                       0, 65535).astype(jnp.uint16)
        return pan, d16

    def save_pred(info, pan_dev, d16_dev, ovf_dev):
        pred_pan = np.asarray(pan_dev).astype(np.int64)
        save_frame(args.eval_dir, "pred", info["seq_id"], info["img_id"],
                   pred_pan, np.asarray(d16_dev))
        ovf = int(ovf_dev)
        msg = f"frame {info['seq_id']:06d}_{info['img_id']:06d} done"
        if ovf:
            msg += (f"  WARNING: {ovf} kept thing segment(s) beyond tracker "
                    f"capacity ({cfg.tracker.max_detections}) dropped to id 0")
        return msg, ovf

    if t_clip == 1:
        step = make_video_step(model, cfg, ori_hw, compute_dtype=dtype,
                               fusion_dtype=dtype)
    else:
        step = make_clip_step(model, cfg, ori_hw, compute_dtype=dtype,
                              fusion_dtype=dtype)

    def fresh_state():
        return init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)

    loader = MPEvalLoader(ds, frames, dc, padded_hw,
                          num_workers=args.workers, gt_dir=args.eval_dir)
    state = fresh_state()
    prev_seq = None
    frames_in_seq = 0
    clip_infos: list = []
    clip_images: list = []
    saves: list = []

    def flush_clip(pool) -> None:
        """Dispatch the buffered clip and queue its per-frame pred writes."""
        nonlocal state
        if not clip_infos:
            return
        n_real = len(clip_infos)
        imgs = clip_images[:]
        while len(imgs) < t_clip:  # tail chunk: pad by repeating the last
            imgs.append(imgs[-1])  # frame; padded outputs are discarded
        first_id = jnp.int32(frames_in_seq - n_real + 1)
        if t_clip == 1:
            fo, state = step(variables, jnp.asarray(imgs[0])[None], state,
                             first_id)
            pan, d16 = pack_outputs(fo.semantic, fo.track_map, fo.depth)
            saves.append(pool.submit(save_pred, clip_infos[0], pan, d16,
                                     fo.track_overflow))
        else:
            co, state = step(variables, jnp.asarray(np.stack(imgs)), state,
                             first_id)
            pan, d16 = pack_outputs(co.semantic, co.track_map, co.depth)
            for j in range(n_real):
                saves.append(pool.submit(save_pred, clip_infos[j],
                                         pan[j], d16[j],
                                         co.track_overflow[j]))
        clip_infos.clear()
        clip_images.clear()

    with loader, ThreadPoolExecutor(max_workers=4) as pool:
        for info, image in loader:
            if info["seq_id"] != prev_seq:
                # tracker reset at sequence start (video_inference.py:24-25)
                flush_clip(pool)
                state = fresh_state()
                prev_seq = info["seq_id"]
                frames_in_seq = 0
            clip_infos.append(info)
            clip_images.append(image)
            frames_in_seq += 1
            if len(clip_infos) == t_clip:
                flush_clip(pool)
            while saves and saves[0].done():
                msg, ovf = saves.pop(0).result()
                total_overflow += ovf
                print(msg, flush=True)
        flush_clip(pool)
        for fut in saves:
            msg, ovf = fut.result()
            total_overflow += ovf
            print(msg, flush=True)
    if total_overflow:
        print(f"tracker capacity overflow total: {total_overflow} segments "
              f"(raise tracker.max_detections)", flush=True)


if __name__ == "__main__":
    main()
