"""Dev-only: the video_swinl preset's train step, measured (VERDICT weak #6:
Swin-L was never trained/measured; remat_backbone must hold at 1024x2048).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/bench_swinl_train.py \
         [--hw 1024 2048] [--steps 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[1024, 2048])
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import (create_train_state,
                                                 make_train_step)

    cfg = get_preset("video_swinl")
    mc = cfg.model
    assert mc.backbone == "swin_large" and mc.remat_backbone
    model = PolyphonicFormer(mc)
    h, w = args.hw
    t0 = time.time()
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, h, w, 3))
    print(f"init done ({time.time()-t0:.0f}s)")
    batch = synthetic_batch(mc, 1, hw=(h, w), two_frame=True)
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch)
    step = make_train_step(model, mc, tx, video=True, donate=True)
    t0 = time.time()
    state, m = step(state, batch)
    loss0 = float(m["total_loss"])
    print(f"compile+first step done ({time.time()-t0:.0f}s), "
          f"loss={loss0:.2f}")
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, m = step(state, batch)
        _ = float(m["total_loss"])
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"swin-l video train step ({h}x{w}, bf16, remat, donated): "
          f"{med*1e3:.1f} ms median of {args.steps}")


if __name__ == "__main__":
    main()
