"""Training CLI.

reference: /root/reference/tools/train.py + mmdet train_detector
(mmdet/apis/train.py).  Usage:

  python -m polyphonicformer_tpu.tools.train --preset image_r50_2x \
      --data-root /data/cityscapes-dvps [--set schedule.lr=2e-4 ...]

One SPMD program over the (data,) mesh replaces torchrun+DDP; checkpoints
are Orbax (keep last 2), resume scans the work dir like --auto-resume.
"""
from __future__ import annotations

import argparse
import dataclasses
import pickle

import jax
import jax.numpy as jnp


def parse_overrides(pairs):
    out = {}
    for pair in pairs or []:
        key, value = pair.split("=", 1)
        out[key] = value
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="image_r50_2x")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--load-from", default=None,
                    help="converted .pkl variables to warm-start from")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--loader", choices=("process", "thread"),
                    default="process",
                    help="host pipeline backend: worker processes (shared-"
                         "memory ring; the reference's DataLoader-worker "
                         "equivalent) or GIL-bound threads (debug)")
    ap.add_argument("--eval-every-epochs", type=int, default=1,
                    help="run PQ/depth eval on the val split every N epochs "
                         "(0 disables; reference EvalHook interval 1)")
    ap.add_argument("--eval-max-images", type=int, default=50,
                    help="0 = the FULL val split, sharded across hosts "
                         "(reference EvalHook fidelity)")
    ap.add_argument("--set", nargs="*", dest="overrides",
                    help="dotted-path config overrides key=value")
    args = ap.parse_args()

    from ..configs import apply_overrides, get_preset
    from ..data.cityscapes_dvps import CityscapesDVPSDataset
    from ..models import PolyphonicFormer
    from ..parallel.mesh import init_distributed, make_mesh
    from ..train.checkpoint import make_manager, restore_state, save_state
    from ..train.metrics import MetricWriter
    from ..train.step import create_train_state, make_sharded_train_step

    # multi-host: no-op unless launched (tools/launch.py / TPU pod); each
    # process then loads its own per-process batches (DDP-sampler analogue:
    # the loader seed is offset by rank below)
    init_distributed()
    rank = jax.process_index()

    cfg = get_preset(args.preset)
    if args.data_root:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data_root=args.data_root))
    if args.work_dir:
        cfg = dataclasses.replace(cfg, work_dir=args.work_dir)
    cfg = apply_overrides(cfg, parse_overrides(args.overrides))

    video = cfg.model.with_track
    ds = CityscapesDVPSDataset(
        cfg.data.data_root, split=cfg.data.split,
        ref_sample_mode=cfg.data.ref_sample_mode,
        ref_seq_index=cfg.data.ref_seq_index, with_depth=True)
    if args.loader == "process":
        from ..data.mp_loader import MPTrainLoader

        loader = MPTrainLoader(ds, cfg.data, cfg.model,
                               seed=args.seed + 1000 * rank)
    else:
        from ..data.loader import TrainLoader

        loader = TrainLoader(ds, cfg.data, cfg.model,
                             seed=args.seed + 1000 * rank)

    dataset_len = len(ds) * cfg.data.repeat_times
    # cfg.data.batch_size is PER-PROCESS (reference: samples_per_gpu); the
    # global batch consumed per step is batch_size × process_count, so the
    # step counts — and the LR schedule / ckpt / eval intervals derived from
    # them — divide by world size exactly like mmdet's DDP sampler does.
    global_batch = cfg.data.batch_size * jax.process_count()
    steps_per_epoch = max(dataset_len // global_batch, 1)
    total_steps = args.max_steps or steps_per_epoch * cfg.schedule.total_epochs

    model = PolyphonicFormer(cfg.model)
    h, w = cfg.data.img_size
    div = cfg.data.size_divisor
    ph, pw = (h + div - 1) // div * div, (w + div - 1) // div * div
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(args.seed),
                                   (cfg.data.batch_size, ph, pw, 3),
                                   steps_per_epoch)

    if args.load_from:
        with open(args.load_from, "rb") as f:
            variables = pickle.load(f)
        state = state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, variables["params"]),
            consts={"batch_stats": jax.tree_util.tree_map(
                jnp.asarray, variables["batch_stats"])})
        print(f"warm-started from {args.load_from}")

    mgr = make_manager(cfg.work_dir, cfg.schedule.max_keep_checkpoints)
    if args.resume and mgr.latest_step() is not None:
        state = restore_state(mgr, state)
        print(f"resumed from step {int(state.step)}")

    mesh = make_mesh(cfg.parallel)
    step_fn = make_sharded_train_step(model, cfg.model, tx, mesh, video=video)
    writer = MetricWriter(cfg.work_dir, cfg.schedule.log_interval) \
        if rank == 0 else None

    # periodic eval during training (reference EvalHook,
    # mmdet/apis/train.py:183-204); disabled automatically when no val split.
    # All hosts participate (each evaluates frames[rank::world], stats
    # allgather — mmdet multi_gpu_test + collect_results_cpu analogue);
    # rank 0 prints/logs.
    eval_hook = None
    if args.eval_every_epochs > 0:
        from ..evalutils.runner import make_eval_hook

        eval_hook = make_eval_hook(
            cfg, lambda: {"params": state.params, **state.consts},
            max_images=args.eval_max_images,
            sharded=jax.process_count() > 1)
    eval_every = steps_per_epoch * max(args.eval_every_epochs, 1)

    import time

    ckpt_every = steps_per_epoch * cfg.schedule.checkpoint_interval
    start = int(state.step)
    it = iter(loader)
    t_log = time.perf_counter()
    samples_done = 0
    for step_idx in range(start, total_steps):
        batch = next(it)
        state, metrics = step_fn(state, batch)
        samples_done += cfg.data.batch_size * jax.process_count()
        if (step_idx + 1) % cfg.schedule.log_interval == 0:
            dt = time.perf_counter() - t_log
            sps = samples_done / max(dt, 1e-9)
            steps_left = total_steps - (step_idx + 1)
            eta_min = steps_left * (dt / cfg.schedule.log_interval) / 60
            metrics = dict(metrics)
            metrics["samples_per_sec"] = sps
            metrics["eta_min"] = eta_min
            t_log = time.perf_counter()
            samples_done = 0
        if writer is not None:
            writer.write(step_idx + 1, metrics)
        if rank == 0 and ((step_idx + 1) % ckpt_every == 0
                          or step_idx + 1 == total_steps):
            save_state(mgr, step_idx + 1, jax.device_get(state))
        if eval_hook is not None and (step_idx + 1) % eval_every == 0:
            eval_hook(step_idx + 1)
    loader.stop()
    if writer is not None:
        writer.close()
    print("training done")


if __name__ == "__main__":
    main()
