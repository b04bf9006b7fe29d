"""Dev-only: full donated video train step under POLY_LOSS_SKIP variants.

Each variant removes one loss group from the graph (XLA dead-codes its cost);
the delta vs the baseline attributes that group's share of the step,
including its backward and any machinery only it uses.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def timed_step(step, state, batch, reps=5):
    s, m = step(state, batch)
    _ = float(m["total_loss"])
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        s2, m = step(s, batch)
        _ = float(m["total_loss"])
        times.append(time.perf_counter() - t0)
        s = s2
    return sorted(times)[len(times) // 2]


def main():
    from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import create_train_state, make_train_step

    variants = sys.argv[1:] or ["", "track", "rank", "mask,dice",
                                "__noassign__"]

    mc = ModelConfig(with_track=True, compute_dtype="bfloat16")
    cfg = ExperimentConfig(model=mc)
    model = PolyphonicFormer(mc)
    h, w = 1024, 2048
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (1, h, w, 3))
    batch = synthetic_batch(mc, 1, hw=(h, w), two_frame=True)
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch)

    base = None
    for v in variants:
        if v == "__noassign__":
            from polyphonicformer_tpu.train import losses as L
            import polyphonicformer_tpu.train.assign as A

            os.environ["POLY_LOSS_SKIP"] = ""
            orig = A.solve_assignment

            def fake_solve(cost, valid, n, topk=1):
                p2g = jnp.where(jnp.arange(cost.shape[0]) < valid.shape[0],
                                jnp.arange(cost.shape[0]) % valid.shape[0], -1)
                g2p = jnp.arange(valid.shape[0])
                return A.AssignResult(pred2gt=p2g.astype(jnp.int32),
                                      gt2pred=g2p.astype(jnp.int32))

            L.solve_assignment = fake_solve
            try:
                step = make_train_step(model, mc, tx, video=True, donate=False)
                t = timed_step(step, state, batch)
            finally:
                L.solve_assignment = orig
        else:
            os.environ["POLY_LOSS_SKIP"] = v
            step = make_train_step(model, mc, tx, video=True, donate=False)
            t = timed_step(step, state, batch)
        name = v or "baseline"
        if base is None:
            base = t
            print(f"{name:16s} {t*1000:8.1f} ms", flush=True)
        else:
            print(f"{name:16s} {t*1000:8.1f} ms (delta {(base-t)*1000:+.1f})",
                  flush=True)
    os.environ["POLY_LOSS_SKIP"] = ""


if __name__ == "__main__":
    main()
