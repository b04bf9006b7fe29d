"""Dev-only: IMAGE-model train step on the real chip (the reference's
first-stage recipe: 24 epochs, 8 GPUs x bs 1, poly_r50_cityscapes_2x.py).

Single-frame batch, no track branch — the step the image_r50_2x preset
trains.  Reports synced and pipelined (donated, one host sync per K) ms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/bench_train_image.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main() -> None:
    from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import (create_train_state,
                                                 make_train_step)

    mc = ModelConfig(with_track=False, compute_dtype="bfloat16",
                     remat_backbone=True)
    cfg = ExperimentConfig(model=mc)
    model = PolyphonicFormer(mc)
    h, w = 1024, 2048
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, h, w, 3))
    batch = synthetic_batch(mc, 1, hw=(h, w))
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch)

    step = make_train_step(model, mc, tx, video=False, donate=False)

    def run(state, batch):
        new_state, metrics = step(state, batch)
        return metrics["total_loss"]

    t0 = time.perf_counter()
    _ = float(run(state, batch))
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s")
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = float(run(state, batch))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2] * 1000
    print(f"image train step (synced): {med:.1f} ms")

    pstep = make_train_step(model, mc, tx, video=False, donate=True)
    state, m = pstep(state, batch)
    _ = float(m["total_loss"])
    k = 20
    t0 = time.perf_counter()
    for _ in range(k):
        state, m = pstep(state, batch)
    _ = float(m["total_loss"])
    dt = (time.perf_counter() - t0) / k * 1000
    print(f"image train step (pipelined x{k}, donated): {dt:.1f} ms")


if __name__ == "__main__":
    main()
