"""Dev-only: multi-clip batched serving throughput on ONE chip.

B independent sequences step through one program (batched_video_step with
per-sequence tracker states) — the single-chip slice of BASELINE config #5
(the multi-chip version shards the same program over the 'data' mesh axis,
tests/test_sharded_serving.py).  Reports aggregate frames/sec/chip.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

H, W = 1024, 2048


def main():
    bs = [int(x) for x in sys.argv[1:]] or [1, 2]

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.infer.pipeline import (
        init_batched_tracker_states, make_batched_video_step)
    from polyphonicformer_tpu.models import PolyphonicFormer

    cfg = ModelConfig(with_track=True)
    model = PolyphonicFormer(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(rng, img, method=PolyphonicFormer.init_all)

    for b in bs:
        step = make_batched_video_step(model, cfg, (H, W),
                                       compute_dtype=jnp.bfloat16,
                                       fusion_dtype=jnp.bfloat16)
        states = init_batched_tracker_states(cfg, b)
        x = jax.random.normal(jax.random.PRNGKey(1), (b, H, W, 3),
                              jnp.float32)
        fids = jnp.ones((b,), jnp.int32)
        outs, states = step(variables, x, states, fids)
        _ = int(outs.semantic.sum())
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            for i in range(8):
                outs, states = step(variables, x, states, fids + 1 + i)
            _ = int(outs.semantic.sum())
            times.append((time.perf_counter() - t0) / 8)
        dt = sorted(times)[1]
        print(f"B={b}: {dt*1000:7.2f} ms/step = {b/dt:6.2f} frames/s/chip",
              flush=True)


if __name__ == "__main__":
    main()
