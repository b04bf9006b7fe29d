"""Dev-only: time each train-step 'machinery' piece at real shapes.

Each piece runs REPS times inside one jitted lax.scan with a carried data
dependency (so XLA can neither CSE nor hoist it), dividing out this
testbed's per-dispatch relay floor.  Pieces mirror compute_losses exactly:
stacked x2 upsample, stacked mask+dice costs, Pallas lockstep solve,
stacked target build, mask-BCE loss fwd+bwd.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

REPS = 8


def timed_scan(name, fn, x, reps=REPS):
    """fn: x -> (new_x, scalar). Times reps sequential applications."""

    @jax.jit
    def run(x):
        def body(c, _):
            c2, s = fn(c)
            return c2, s

        c, ss = jax.lax.scan(body, x, None, length=reps)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a) if a.ndim else a,
                                      ss).sum()

    _ = float(run(x))  # compile
    ts = []
    for _i in range(4):
        t0 = time.perf_counter()
        _ = float(run(x))
        ts.append((time.perf_counter() - t0) / reps)
    print(f"{name:28s} {sorted(ts)[len(ts)//2]*1000:8.2f} ms", flush=True)


def main():
    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.ops.pallas.lsa import solve_lsa_pallas
    from polyphonicformer_tpu.ops.resize import resize_bilinear
    from polyphonicformer_tpu.train.assign import mask_dice_costs_stacked
    from polyphonicformer_tpu.train.targets import build_stage_targets
    from polyphonicformer_tpu.losses.cross_entropy import (
        binary_cross_entropy_with_logits)

    cfg = ModelConfig()
    b, s, nq, np_ = 1, 3, 111, 100
    h8, w8 = 128, 256
    h4, w4 = 256, 512
    rng = np.random.RandomState(0)
    batch = synthetic_batch(cfg, b, hw=(1024, 2048), two_frame=False)
    gt = jax.tree_util.tree_map(jnp.asarray, batch.gt)

    # 1. stacked x2 upsample of all mask volumes (4, B, 111, h8, w8)
    x = jnp.asarray(rng.randn(s + 1, b, nq, h8, w8), jnp.float32)

    def up(c):
        o = resize_bilinear(c, (h4, w4))
        return c + o[..., :c.shape[-2], :c.shape[-1]] * 1e-9, o[..., 0, 0].sum()

    timed_scan("upsample2 (4,1,111)", up, x)

    # 2. stacked mask+dice costs (3 problems)
    xm = jnp.asarray(rng.randn(s, b, np_, h4, w4), jnp.float32)

    def costs(c):
        o = mask_dice_costs_stacked(cfg.rcnn_assigner, c, gt)
        return c + o.sum() * 1e-12, o.sum()

    timed_scan("stacked costs (3,1,100)", costs, xm)

    # 3. lockstep Pallas solve (4 problems, 24 valid rows)
    cost = jnp.asarray(rng.randn(4, 64, 100), jnp.float32)
    valid = jnp.zeros((4, 64), bool).at[:, :24].set(True)

    def solve(c):
        o = solve_lsa_pallas(c, valid)
        return c + o.sum() * 1e-9, o.sum()

    timed_scan("pallas solve (4x24v)", solve, cost)

    def solve_lax(c):
        from polyphonicformer_tpu.ops.hungarian import match_gt_to_preds

        o = jax.vmap(match_gt_to_preds)(c, valid)
        return c + o.sum() * 1e-9, o.sum()

    timed_scan("lax solve    (4x24v)", solve_lax, cost)

    # 4. stacked target build (4 problems)
    from polyphonicformer_tpu.train.assign import AssignResult

    g2p = jnp.where(valid, jnp.arange(64)[None] % 100, -1).astype(jnp.int32)
    p2g = jnp.full((4, 100), -1, jnp.int32)
    assigns = AssignResult(pred2gt=jnp.tile(p2g[:, None], (1, b, 1)),
                           gt2pred=jnp.tile(g2p[:, None], (1, b, 1)))

    def tgts(c):
        build_one = jax.vmap(
            lambda a, g: build_stage_targets(a, g, np_, 8, 19, 255,
                                             with_direct_row=True))
        t = jax.vmap(lambda a: build_one(a, gt))(c)
        out = t.mask_targets.sum() + t.rank_target.sum()
        return jax.tree_util.tree_map(lambda a: a, c), out

    timed_scan("stacked targets (4,1)", tgts, assigns)

    # 5. mask BCE fwd+bwd over (4, B, 111, h4, w4)
    xl = jnp.asarray(rng.randn(s + 1, b, nq, h4, w4), jnp.float32)
    tgt = (jnp.asarray(rng.rand(s + 1, b, nq, h4, w4), jnp.float32) > 0.9
           ).astype(jnp.float32)
    pos = (jnp.asarray(rng.rand(s + 1, b, nq), jnp.float32) > 0.5
           ).astype(jnp.float32)
    vmask = gt.valid_mask

    def mask_loss(m):
        bce = binary_cross_entropy_with_logits(m, tgt)
        denom = jnp.maximum(
            jnp.einsum("sbq,b->s", pos, vmask.sum(axis=(1, 2))), 1.0)
        return (jnp.einsum("sbqhw,sbq,bhw->s", bce, pos, vmask) / denom).sum()

    def ml(c):
        v, g = jax.value_and_grad(mask_loss)(c)
        return c + g * 1e-9, v

    timed_scan("mask BCE fwd+bwd (4,1,111)", ml, xl)


if __name__ == "__main__":
    main()
