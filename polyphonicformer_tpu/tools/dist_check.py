"""Distributed-setup smoke check: init, global mesh, cross-process
collective, and one REAL sharded train step of the tiny model.

Run under the launcher (see tools/launch.py) on a pod or in local
simulation; every process must print the same finite global loss.  Plays
the role of the sanity run one would do with the reference's
dist_train.sh before a long job.
"""
from __future__ import annotations

import sys


def main() -> None:
    from ..parallel.mesh import init_distributed

    init_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..configs import get_preset
    from ..data.loader import synthetic_batch
    from ..models import PolyphonicFormer
    from ..parallel.mesh import make_mesh
    from ..train.step import create_train_state, make_sharded_train_step

    nproc = jax.process_count()
    pid = jax.process_index()
    ndev = len(jax.devices())
    print(f"[proc {pid}/{nproc}] global devices: {ndev}", flush=True)

    # cross-process collective first: cheap, isolates wiring failures
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.full((ndev // max(nproc, 1),), 1.0, np.float32)) \
        if nproc > 1 else jnp.ones((ndev,))
    total = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(ones))
    assert total == ndev, (total, ndev)
    print(f"[proc {pid}] psum ok: {total}", flush=True)

    cfg = get_preset("debug_tiny")
    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, 128, 256, 3))
    step = make_sharded_train_step(model, cfg.model, tx, mesh, video=False)
    # per-process local batch (one sample per local device), distinct data
    local_bs = jax.local_device_count()
    batch = synthetic_batch(cfg.model, local_bs, hw=(128, 256), seed=pid)
    state, metrics = step(state, batch)
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), metrics
    print(f"[proc {pid}] sharded train step ok: total_loss={loss:.4f}",
          flush=True)

    # sharded EvalHook wiring: per-process frame stats -> allgather ->
    # identical full-split metrics on every rank (mmdet multi_gpu_test +
    # collect_results_cpu analogue feeding EvalHook)
    from ..evalutils.runner import (allgather_frame_stats, frame_stats,
                                    metrics_from_stats)

    rng = np.random.RandomState(0)  # same split on every rank
    all_frames = []
    for _ in range(5):  # 5 frames sharded over the processes
        gt_pan = rng.randint(0, 19, (16, 24)).astype(np.int64) * 10000
        pred_pan = gt_pan.copy()
        pred_pan[rng.rand(16, 24) < 0.2] = 3 * 10000
        gt_d = (rng.rand(16, 24) * 50 + 1).astype(np.float32)
        pred_d = gt_d * (1 + 0.1 * rng.randn(16, 24)).astype(np.float32)
        all_frames.append((pred_pan, gt_pan, pred_d, gt_d))
    mine = all_frames[pid::nproc]
    stats = [frame_stats(*f) for f in mine]
    vpq_stats = np.stack([s[0] for s in stats])
    depth_stats = np.stack([s[1] for s in stats])
    if nproc > 1:
        vpq_stats, depth_stats = allgather_frame_stats(
            vpq_stats, depth_stats, n_total=len(all_frames))
    m = metrics_from_stats(vpq_stats, depth_stats)
    # the gathered shards must reproduce the single-process full-split value
    ref_stats = [frame_stats(*f) for f in all_frames]
    m_ref = metrics_from_stats(np.stack([s[0] for s in ref_stats]),
                               np.stack([s[1] for s in ref_stats]))
    for k in ("pq@inf", "pq@0.25", "depth_abs_rel", "depth_rmse"):
        # gathered-stat summation order differs from sequential -> f64
        # rounding at the 1e-9 level
        assert abs(m[k] - m_ref[k]) < 1e-7, (k, m[k], m_ref[k])
    print(f"[proc {pid}] sharded eval stats ok: pq@inf={m['pq@inf']:.6f} "
          f"abs_rel={m['depth_abs_rel']:.6f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
