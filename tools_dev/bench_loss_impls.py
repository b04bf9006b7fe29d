"""Dev-only: full donated train step, XLA vs fused-Pallas mask-loss impl."""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def measure(impl: str) -> float:
    os.environ["POLY_MASK_LOSS_IMPL"] = impl
    from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import (create_train_state,
                                                 make_train_step)

    mc = ModelConfig(with_track=True, compute_dtype="bfloat16")
    cfg = ExperimentConfig(model=mc)
    model = PolyphonicFormer(mc)
    h, w = 1024, 2048
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, h, w, 3))
    batch = synthetic_batch(mc, 1, hw=(h, w), two_frame=True)
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch)
    step = make_train_step(model, mc, tx, video=True, donate=True)
    state, metrics = step(state, batch)
    loss0 = float(metrics["total_loss"])
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        _ = float(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2] * 1000
    print(f"{impl:6s} step {med:7.1f} ms  (first-loss {loss0:.4f})",
          flush=True)
    return med


def main():
    for impl in ("xla", "mega", "xla"):
        measure(impl)


if __name__ == "__main__":
    main()
