"""Dev-only: Swin-L video serving on the real chip (BASELINE.json config #5).

Runs the full video_swinl preset pipeline (Swin-L backbone -> FPN ->
KernelHead -> 3 stages -> fusion -> track embeds -> tracker) at 1024x2048
bf16 on ONE chip, clip mode, and reports fps/frame latency + device memory.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools_dev/bench_swinl.py [--t 8]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

H, W = 1024, 2048


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=8, help="frames per clip")
    args = ap.parse_args()

    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.infer.pipeline import make_clip_step
    from polyphonicformer_tpu.infer.tracker import init_tracker_state
    from polyphonicformer_tpu.models import PolyphonicFormer

    exp = get_preset("video_swinl")
    cfg = exp.model
    model = PolyphonicFormer(cfg)
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    img = jnp.zeros((1, 224, 448, 3), jnp.float32)  # window-multiple init
    variables = model.init(rng, img, method=PolyphonicFormer.init_all)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"init: {n_params / 1e6:.1f}M params, "
          f"{time.perf_counter() - t0:.1f}s")

    state = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)
    step = make_clip_step(model, cfg, (H, W), compute_dtype=jnp.bfloat16,
                          fusion_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (args.t, H, W, 3),
                          jnp.float32)

    t0 = time.perf_counter()
    outs, state = step(variables, x, state, jnp.int32(1))
    _ = int(outs.semantic.sum())
    print(f"compile+first clip: {time.perf_counter() - t0:.1f}s")

    try:
        ms = jax.local_devices()[0].memory_stats()
        print("memory:", {k: f"{v / 2**30:.2f}GiB" for k, v in ms.items()
                          if "bytes" in k and v > 2**20})
    except Exception as e:
        print("memory stats unavailable:", e)

    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        outs, state = step(variables, x, state, jnp.int32(2 + rep * args.t))
        _ = int(outs.semantic.sum())
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    print(f"swin-l serving: {dt / args.t * 1000:.1f} ms/frame "
          f"({args.t / dt:.2f} fps/chip) at {H}x{W} bf16, T={args.t}")


if __name__ == "__main__":
    main()
