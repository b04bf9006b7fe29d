"""Dev-only: ONE number — the full video train step (bf16, 1024x2048)."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    import argparse

    from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import create_train_state, make_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument("--no-remat", action="store_true",
                    help="full backbone activations kept for backward "
                         "(fits HBM at bs1 1024x2048 R50)")
    args = ap.parse_args()

    mc = ModelConfig(with_track=True, compute_dtype="bfloat16",
                     remat_backbone=not args.no_remat)
    cfg = ExperimentConfig(model=mc)
    model = PolyphonicFormer(mc)
    h, w = 1024, 2048
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (1, h, w, 3))
    batch = synthetic_batch(mc, 1, hw=(h, w), two_frame=True)
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch)
    step = make_train_step(model, mc, tx, video=True, donate=False)

    def run(s, b):
        return step(s, b)[1]["total_loss"]

    _ = float(run(state, batch))
    times = []
    for _i in range(5):
        t0 = time.perf_counter()
        out = run(state, batch)
        _ = float(out)
        times.append(time.perf_counter() - t0)
    print("full step", sorted(times)[len(times) // 2] * 1000, "ms")


if __name__ == "__main__":
    main()
