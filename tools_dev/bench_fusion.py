"""Dev-only: isolate fuse_panoptic's cost on the real chip."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

H, W = 1024, 2048
K = 111
hs, ws = H // 4, W // 4


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(name, fn, *args, reps=3, inner=4):
    _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    dt = sorted(times)[len(times) // 2]
    print(f"{name:42s} {dt * 1000:8.2f} ms")
    return dt


def main():
    import os

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.infer.panoptic import fuse_panoptic
    from polyphonicformer_tpu.ops.pallas.phase_fusion import phase_fusion
    from polyphonicformer_tpu.ops.resize import resize_bilinear

    cfg = ModelConfig(with_track=True)
    rng = jax.random.PRNGKey(0)
    probs = jax.nn.sigmoid(jax.random.normal(rng, (K, hs, ws), jnp.bfloat16))
    depth = jax.random.uniform(rng, (K, hs, ws), jnp.bfloat16) * 80
    scores = jax.random.uniform(rng, (K,), jnp.float32)
    cls_probs = jax.random.uniform(rng, (K, 19), jnp.float32)
    mask_logits8 = jax.random.normal(rng, (K, H // 8, W // 8), jnp.float32)
    depth_logits8 = jax.random.normal(rng, (K, H // 8, W // 8), jnp.float32)
    depth_init8 = jax.random.normal(rng, (1, H // 8, W // 8), jnp.float32)

    # 1. the pallas phase-fusion kernel alone
    pf = jax.jit(lambda p, s, d: phase_fusion(p, s, d, 4, 4))
    timed("phase_fusion kernel (K=111, 1024x2048)", pf, probs, scores, depth)

    # 2. the x2 resize of stride-8 logits (111ch)
    rs = jax.jit(lambda m: resize_bilinear(m, (hs, ws)))
    timed("resize x2 (111, 128x256 -> 256x512)", rs, mask_logits8)

    # 3. full fuse_panoptic bf16 (pallas path), masks capped at 64
    fp = jax.jit(lambda c, m, d, d0: fuse_panoptic(
        cfg, c, resize_bilinear(m, (hs, ws)), resize_bilinear(d, (hs, ws)),
        resize_bilinear(d0, (hs, ws))[0], (H, W), fusion_dtype=jnp.bfloat16,
        num_track_masks=64))
    timed("fuse_panoptic bf16+masks64", fp, cls_probs, mask_logits8,
          depth_logits8, depth_init8)

    # 4. fuse_panoptic without track masks
    fp0 = jax.jit(lambda c, m, d, d0: fuse_panoptic(
        cfg, c, resize_bilinear(m, (hs, ws)), resize_bilinear(d, (hs, ws)),
        resize_bilinear(d0, (hs, ws))[0], (H, W), fusion_dtype=jnp.bfloat16,
        num_track_masks=1))
    timed("fuse_panoptic bf16+masks1", fp0, cls_probs, mask_logits8,
          depth_logits8, depth_init8)

    # 5. XLA phased path (no pallas)
    os.environ["POLY_PALLAS_FUSION"] = "0"
    fpx = jax.jit(lambda c, m, d, d0: fuse_panoptic(
        cfg, c, resize_bilinear(m, (hs, ws)), resize_bilinear(d, (hs, ws)),
        resize_bilinear(d0, (hs, ws))[0], (H, W), fusion_dtype=jnp.bfloat16,
        num_track_masks=64))
    timed("fuse_panoptic XLA-phased bf16+masks64", fpx, cls_probs,
          mask_logits8, depth_logits8, depth_init8)
    os.environ["POLY_PALLAS_FUSION"] = "1"

    # 6. mask-stack materialization alone: pix_arg -> (64, H, W) + reductions
    pix = jax.random.randint(rng, (H, W), 0, K)

    @jax.jit
    def mask_stack(pa):
        masks = pa[None] == jnp.arange(64, dtype=pa.dtype)[:, None, None]
        any_x = masks.any(axis=1)
        any_y = masks.any(axis=2)
        colcount = masks.sum(axis=1)
        rowcount = masks.sum(axis=2)
        return (any_x.sum(), any_y.sum(), colcount.sum(), rowcount.sum())

    timed("mask stack (64,H,W) + 4 marginal passes", mask_stack, pix)

    # 7. marginal counts from pix_arg via one-hot matmul-style reduce
    @jax.jit
    def marginals(pa):
        onehot_rows = jax.nn.one_hot(pa, 64, axis=0, dtype=jnp.float32)
        rowcount = onehot_rows.sum(axis=2)
        colcount = onehot_rows.sum(axis=1)
        return rowcount.sum(), colcount.sum()

    timed("marginals via one_hot reduce", marginals, pix)


if __name__ == "__main__":
    main()
