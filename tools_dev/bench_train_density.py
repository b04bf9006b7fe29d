"""Dev-only: donated full video train step at realistic GT densities.

The synthetic test batch uses 1-7 things/image; real Cityscapes-DVPS frames
carry ~15-25 and SemKITTI 20-40.  The on-device Hungarian solver's serial
while_loop trip count scales with the valid GT count, so the light-density
step time understates real training cost — this measures the scaling.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import create_train_state, make_train_step

    densities = [int(x) for x in sys.argv[1:]] or [8, 24, 40]
    mc = ModelConfig(with_track=True, compute_dtype="bfloat16")
    cfg = ExperimentConfig(model=mc)
    model = PolyphonicFormer(mc)
    h, w = 1024, 2048
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (1, h, w, 3))
    step = make_train_step(model, mc, tx, video=True, donate=False)
    for d in densities:
        batch = synthetic_batch(mc, 1, hw=(h, w), two_frame=True,
                                max_instances=d)
        batch = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a) if a is not None else None, batch)
        s, m = step(state, batch)
        _ = float(m["total_loss"])
        times = []
        for _i in range(5):
            t0 = time.perf_counter()
            s, m = step(state, batch)
            _ = float(m["total_loss"])
            times.append(time.perf_counter() - t0)
        t = sorted(times)[len(times) // 2]
        print(f"density<= {d:3d}  {t*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
