"""Dev-only: XLA compiler-option sweep on the full video train step.

Round-3 sessions exhausted graph-level edits (op-count stacking moved
nothing; ROUND3.md session 2) — the remaining loss-side time is XLA
*scheduling* of hundreds of small fusions.  This sweeps the compiler knobs
that change fusion/scheduling decisions without touching the graph:

  scoped-vmem : --xla_tpu_scoped_vmem_limit_kib (bigger fusions allowed)
  flags passed per-compile via jax.jit(..., compiler_options=...)

Usage: python tools_dev/bench_train_copts.py [h w]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import (TrainState,
                                                 create_train_state)
    from polyphonicformer_tpu.train.video_losses import video_forward_losses

    import optax

    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (1024, 2048)
    mc = ModelConfig(with_track=True, compute_dtype="bfloat16")
    cfg = ExperimentConfig(model=mc)
    model = PolyphonicFormer(mc)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, h, w, 3))
    batch = synthetic_batch(mc, 1, hw=(h, w), two_frame=True)
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch)

    half = jnp.bfloat16

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(half)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            tree)

    def loss_fn(params, consts, b):
        params, consts = cast(params), cast(consts)
        b = b.replace(image=b.image.astype(half),
                      ref_image=b.ref_image.astype(half))
        variables = {"params": params, **consts}
        return video_forward_losses(model, variables, mc, b)

    def step(state: TrainState, b):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.consts, b)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return total, gnorm

    sweeps = [
        ("default", None),
        ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ]
    results = {}
    for name, opts in sweeps:
        try:
            fn = jax.jit(step, compiler_options=opts)
            t = timed(fn, state, batch)
            results[name] = t
            print(f"{name:12s} {t * 1000:8.1f} ms  opts={opts}")
        except Exception as e:  # noqa: BLE001 — sweep must survive bad flags
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
        sys.stdout.flush()
    return results


if __name__ == "__main__":
    main()
