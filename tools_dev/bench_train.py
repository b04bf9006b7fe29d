"""Dev-only: video train-step breakdown on the real chip.

Variants attribute the 203 ms/step (bf16, ROUND2) between the 2-frame
forward+backward and the loss/target/assignment machinery:
  fwd_bwd_only : same forward, losses replaced by output sums (no targets/
                 assignment/loss reductions)
  no_assign    : full losses but the Hungarian solve replaced by a fixed
                 identity assignment (measures the solver's share)
  full         : the production step
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, reps=3, inner=1):
    out = fn(*args)
    _sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    return sorted(times)[len(times) // 2]


def main():
    from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import create_train_state
    from polyphonicformer_tpu.train import video_losses as vl
    from polyphonicformer_tpu.train.step import make_train_step

    cfg = ExperimentConfig()
    mc = ModelConfig(with_track=True, compute_dtype="bfloat16")
    cfg = ExperimentConfig(model=mc)
    model = PolyphonicFormer(mc)
    h, w = 1024, 2048
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, h, w, 3))
    batch = synthetic_batch(mc, 1, hw=(h, w), two_frame=True)
    batch = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if a is not None else None, batch)

    # full step
    step_full = make_train_step(model, mc, tx, video=True, donate=False)
    t_full = timed(lambda s, b: step_full(s, b)[1]["total_loss"], state, batch)
    print(f"full step      {t_full * 1000:8.1f} ms")

    # fwd+bwd only: dummy loss on every forward output
    half = jnp.bfloat16

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(half)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
            tree)

    def loss_fwd_only(params, consts, b):
        params, consts = cast(params), cast(consts)
        variables = {"params": params, **consts}
        out = model.apply(variables, b.image.astype(half))
        out_ref = model.apply(variables, b.ref_image.astype(half))
        tot = sum(x.astype(jnp.float32).sum()
                  for x in jax.tree_util.tree_leaves((out, out_ref)))
        return tot

    @jax.jit
    def step_fwd(state, b):
        g = jax.value_and_grad(loss_fwd_only)(state.params, state.consts, b)
        return g[0]

    t_fwd = timed(step_fwd, state, batch)
    print(f"fwd+bwd only   {t_fwd * 1000:8.1f} ms (delta losses "
          f"{(t_full - t_fwd) * 1000:+.1f})")

    # key-frame-only fwd+bwd (the ref branch is stop_gradiented in prod)
    def loss_key_only(params, consts, b):
        params, consts = cast(params), cast(consts)
        variables = {"params": params, **consts}
        out = model.apply(variables, b.image.astype(half))
        return sum(x.astype(jnp.float32).sum()
                   for x in jax.tree_util.tree_leaves(out))

    @jax.jit
    def step_key(state, b):
        return jax.value_and_grad(loss_key_only)(state.params, state.consts,
                                                 b)[0]

    t_key = timed(step_key, state, batch)
    print(f"key fwd+bwd    {t_key * 1000:8.1f} ms")

    # losses without the Hungarian solver: monkeypatch solve_assignment
    from polyphonicformer_tpu.train import losses as L
    import polyphonicformer_tpu.train.assign as A

    orig = A.solve_assignment

    def fake_solve(cost, valid, n, topk=1):
        m = cost.shape[1]
        p2g = jnp.where(jnp.arange(cost.shape[0]) < valid.shape[0],
                        jnp.arange(cost.shape[0]) % valid.shape[0], -1)
        g2p = jnp.arange(valid.shape[0])
        return A.AssignResult(pred2gt=p2g.astype(jnp.int32),
                              gt2pred=g2p.astype(jnp.int32))

    L.solve_assignment = fake_solve
    try:
        step_noassign = make_train_step(model, mc, tx, video=True,
                                        donate=False)
        t_na = timed(lambda s, b: step_noassign(s, b)[1]["total_loss"],
                     state, batch)
    finally:
        L.solve_assignment = orig
    print(f"no-assign step {t_na * 1000:8.1f} ms (solver share "
          f"{(t_full - t_na) * 1000:+.1f})")

    # per-loss-group attribution: POLY_LOSS_SKIP removes a group from the
    # graph so XLA dead-codes its fwd+bwd cost
    import os

    for skip in ("depth", "rank", "mask,dice", "seg,cls", "track"):
        os.environ["POLY_LOSS_SKIP"] = skip
        try:
            step_v = make_train_step(model, mc, tx, video=True, donate=False)
            t_v = timed(lambda s, b: step_v(s, b)[1]["total_loss"],
                        state, batch)
        finally:
            os.environ.pop("POLY_LOSS_SKIP", None)
        print(f"skip {skip:10s} {t_v * 1000:8.1f} ms (group cost "
              f"{(t_full - t_v) * 1000:+.1f})")

    # loss FORWARD alone (no grad): separates loss-fwd cost from loss-bwd
    from polyphonicformer_tpu.train.video_losses import video_forward_losses

    def loss_fwd(params, consts, b):
        params, consts = cast(params), cast(consts)
        b = b.replace(image=b.image.astype(half),
                      ref_image=b.ref_image.astype(half))
        variables = {"params": params, **consts}
        return video_forward_losses(model, variables, mc, b)[0]

    t_lf = timed(jax.jit(loss_fwd), state.params, state.consts, batch)
    print(f"loss fwd only  {t_lf * 1000:8.1f} ms (no grad)")

    # upsample-only grad: value_and_grad of the sum of all x2-upsampled
    # prediction tensors (no targets/assignment/loss math)
    from polyphonicformer_tpu.train.losses import _upsample2

    def loss_ups(params, consts, b):
        params, consts = cast(params), cast(consts)
        variables = {"params": params, **consts}
        out = model.apply(variables, b.image.astype(half))
        tot = _upsample2(out.rpn.mask_preds_things).astype(jnp.float32).sum()
        tot += _upsample2(jnp.moveaxis(out.rpn.seg_preds, -1, 1)) \
            .astype(jnp.float32).sum()
        tot += _upsample2(out.rpn.depth_pred[:, None]).astype(jnp.float32).sum()
        tot += _upsample2(out.rpn.mask_preds).astype(jnp.float32).sum()
        for so in out.stages:
            tot += _upsample2(so.mask_preds).astype(jnp.float32).sum()
            tot += _upsample2(so.depth_preds).astype(jnp.float32).sum()
        return tot

    @jax.jit
    def step_ups(state, b):
        return jax.value_and_grad(loss_ups)(state.params, state.consts, b)[0]

    t_u = timed(step_ups, state, batch)
    print(f"key+upsample   {t_u * 1000:8.1f} ms (upsample share vs key "
          f"{(t_u - t_key) * 1000:+.1f})")


if __name__ == "__main__":
    main()
