"""Benchmark: end-to-end video-model frame inference (forward + panoptic/depth
fusion + track embeddings + tracker update) at 1024x2048 on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against an estimated 2.5 fps for the reference
PyTorch pipeline on its original GPU setup (the repo publishes no throughput
numbers — BASELINE.md; K-Net-family models with dense 1024x2048 heads run
~2-5 fps on a V100-class GPU, and the reference adds depth + tracking on
top).  This constant is revisited once a measured reference number exists.
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_FPS_ESTIMATE = 2.5
H, W = 1024, 2048


def _enable_compile_cache() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main() -> None:
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.infer.pipeline import make_video_step
    from polyphonicformer_tpu.infer.tracker import init_tracker_state
    from polyphonicformer_tpu.models import PolyphonicFormer

    import os

    cfg = ModelConfig(with_track=True)
    model = PolyphonicFormer(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 128, 3), jnp.float32)  # tiny init (shape-agnostic)
    variables = model.init(rng, img, method=PolyphonicFormer.init_all)
    state = init_tracker_state(cfg.tracker, cfg.track_head.embed_channels)

    dtype = jnp.float32 if os.environ.get("POLY_BENCH_F32") == "1" else jnp.bfloat16
    step = make_video_step(model, cfg, (H, W), compute_dtype=dtype,
                           fusion_dtype=dtype)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3), jnp.float32)

    # warmup / compile
    fo, state = step(variables, x, state, jnp.int32(1))
    jax.block_until_ready(fo.semantic)
    fo, state = step(variables, x, state, jnp.int32(2))
    jax.block_until_ready(fo.semantic)

    # Throughput: chained frames (each step consumes the previous tracker
    # state, so the device must execute them sequentially) with a single
    # host sync at the end.  Per-iteration host readbacks would measure the
    # relay round-trip, which on this testbed is highly variable, not the
    # chip.  Median over repeats for robustness.
    iters = 10
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            fo, state = step(variables, x, state, jnp.int32(3 + rep * iters + i))
        _ = int(fo.semantic.sum())  # sync
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    fps = iters / dt

    print(json.dumps({
        "metric": "video_frame_inference_fps_1024x2048_r50",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / REFERENCE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
