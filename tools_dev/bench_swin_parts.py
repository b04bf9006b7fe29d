"""Dev-only: Swin-L forward attribution at 1024x2048 bf16 on the chip.

Times extract_feat (backbone+FPN) and forward_heads separately,
scan-amortized inside one program each, then stage-sliced Swin variants.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

REPS = 4
H, W = 1024, 2048


def timed(name, run, *args):
    # NOTE: block_until_ready is a no-op on the relay backend — force a
    # host read to synchronize
    _ = float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name:24s} {sorted(ts)[1]*1000:8.2f} ms", flush=True)


def main():
    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.models import PolyphonicFormer

    exp = get_preset("video_swinl")
    cfg = exp.model
    model = PolyphonicFormer(cfg)
    rng = jax.random.PRNGKey(0)
    img_init = jnp.zeros((1, 224, 448, 3), jnp.float32)
    variables = model.init(rng, img_init, method=PolyphonicFormer.init_all)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
        variables)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 3), jnp.bfloat16)

    @jax.jit
    def feat_loop(v, x):
        def body(c, _):
            f = model.apply(v, c, method=PolyphonicFormer.extract_feat)
            bump = sum(x.mean() for x in f).astype(c.dtype)
            return c + bump * 1e-9, bump

        _, ss = jax.lax.scan(body, x, None, length=REPS)
        return ss.astype(jnp.float32).sum()

    timed("extract_feat (swin+fpn)", feat_loop, variables, x)

    feats = jax.jit(
        lambda v, x: model.apply(v, x, method=PolyphonicFormer.extract_feat)
    )(variables, x)
    _ = float(feats[0].sum())

    @jax.jit
    def heads_loop(v, feats):
        def body(c, _):
            out = model.apply(v, c, method=PolyphonicFormer.forward_heads)
            bump = (out.stages[-1].mask_preds.mean()
                    + out.stages[-1].cls_score.mean()
                    + out.stages[-1].depth_preds.mean()).astype(jnp.bfloat16)
            c2 = jax.tree_util.tree_map(lambda a: a + bump * 1e-9, c)
            return c2, bump

        _, ss = jax.lax.scan(body, feats, None, length=REPS)
        return ss.astype(jnp.float32).sum()

    timed("forward_heads", heads_loop, variables, feats)

    # swin backbone alone (no FPN): stage-sliced
    from polyphonicformer_tpu.models.swin import SwinTransformer

    dim, depths, heads = 192, (2, 2, 18, 2), (6, 12, 24, 48)  # swin-L
    for nstages in (1, 2, 3, 4):
        sw = SwinTransformer(dim, tuple(depths[:nstages]),
                             tuple(heads[:nstages]))
        sv = sw.init(rng, jnp.zeros((1, 224, 448, 3), jnp.bfloat16))
        sv = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a, sv)

        @jax.jit
        def sw_loop(v, x, sw=sw):
            def body(c, _):
                f = sw.apply(v, c)
                bump = sum(x.mean() for x in f).astype(c.dtype)
                return c + bump * 1e-9, bump

            _, ss = jax.lax.scan(body, x, None, length=REPS)
            return ss.astype(jnp.float32).sum()

        timed(f"swin stages[:{nstages}]", sw_loop, sv, x)


if __name__ == "__main__":
    main()
