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
    ap.add_argument("--pipelined", type=int, default=20,
                    help="also measure K donated steps back-to-back with "
                         "ONE host sync at the end (0 = skip)")
    ap.add_argument("--bs", type=int, default=1,
                    help="clips per step (reference video bs is 2/GPU, "
                         "configs/polyphonic_video/poly_r50_cityscapes_1x.py:55)")
    args = ap.parse_args()

    mc = ModelConfig(with_track=True, compute_dtype="bfloat16",
                     remat_backbone=not args.no_remat)
    cfg = ExperimentConfig(model=mc)
    model = PolyphonicFormer(mc)
    h, w = 1024, 2048
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (args.bs, h, w, 3))
    batch = synthetic_batch(mc, args.bs, hw=(h, w), two_frame=True)
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
    med = sorted(times)[len(times) // 2] * 1000
    print(f"full step bs={args.bs} (host-sync every step): {med:.1f} ms "
          f"({med / args.bs:.1f} ms/sample)")

    if args.pipelined > 0:
        # steady-state: thread the state through K donated steps, fetch
        # metrics once at the end — the device never waits on the host
        # float() round-trip (the production loop syncs every
        # log_interval=50 steps, tools/train.py)
        pstep = make_train_step(model, mc, tx, video=True, donate=True)
        state, m = pstep(state, batch)
        _ = float(m["total_loss"])  # compile + settle
        k = args.pipelined
        t0 = time.perf_counter()
        for _i in range(k):
            state, m = pstep(state, batch)
        _ = float(m["total_loss"])
        dt = (time.perf_counter() - t0) / k * 1000
        print(f"full step bs={args.bs} (pipelined x{k}, donated): "
              f"{dt:.1f} ms ({dt / args.bs:.1f} ms/sample)")


if __name__ == "__main__":
    main()
