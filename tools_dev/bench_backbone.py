"""Dev-only: fine-grained forward-path timing on the real chip.

Splits the 14.2 ms/frame 'forward' (ROUND2.md) into
stem / res2 / res3 / res4 / res5 / FPN / semantic-FPN towers / branch convs /
query init (masked_pool) / 3 update stages by the variant-subtraction method
(each variant a T-frame lax.scan returning scalars; the relay dispatch floor
amortizes over T).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

H, W = 1024, 2048
T = 8


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).reshape(-1)[0])


def timed(fn, *args, reps=3, inner=2):
    _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    return sorted(times)[len(times) // 2], out


def main():
    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.models.semantic_fpn import SemanticFPNWrapper

    cfg = ModelConfig(with_track=True)
    model = PolyphonicFormer(cfg)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = model.init(rng, img, method=PolyphonicFormer.init_all)
    dtype = jnp.bfloat16
    cast_vars = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
        variables)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, H, W, 3), dtype)

    def scan_over(body):
        @jax.jit
        def fn(xs):
            def b(c, im):
                return c, body(im)

            return jax.lax.scan(b, 0, xs)[1]

        return fn

    variants = {}

    variants["noop"] = scan_over(
        lambda im: (im.astype(jnp.float32).sum(),))

    # standalone (non-remat) backbone bound to the same params
    from polyphonicformer_tpu.models.resnet import ResNet

    bbone = ResNet(cfg.backbone)
    bb_vars = {"params": cast_vars["params"]["backbone"],
               "batch_stats": cast_vars["batch_stats"]["backbone"]}

    def bb(k):
        return scan_over(lambda im: (
            bbone.apply(bb_vars, im[None], k)[-1]
            .astype(jnp.float32).sum(),))

    variants["stem"] = bb(0)
    variants["res2"] = bb(1)
    variants["res3"] = bb(2)
    variants["res4"] = bb(3)
    variants["res5"] = bb(4)

    variants["fpn"] = scan_over(lambda im: (
        model.apply(cast_vars, im[None],
                    method=PolyphonicFormer.extract_feat)[-1]
        .astype(jnp.float32).sum(),))

    # consume ALL FPN levels (earlier variants only touch P5, letting XLA
    # dead-code the P2..P4 laterals/upsamples — this variant attributes them)
    variants["fpn_all"] = scan_over(lambda im: tuple(
        f.astype(jnp.float32).sum()
        for f in model.apply(cast_vars, im[None],
                             method=PolyphonicFormer.extract_feat)))

    # semantic-FPN towers only (standalone module bound to the same params)
    sfpn = SemanticFPNWrapper(feat_channels=cfg.out_channels,
                              out_channels=cfg.out_channels)
    sfpn_vars = {"params":
                 variables["params"]["rpn_head"]["localization_fpn"]}
    sfpn_vars = jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a,
        sfpn_vars)

    def v_towers(im):
        fpn = model.apply(cast_vars, im[None],
                          method=PolyphonicFormer.extract_feat)
        fused = sfpn.apply(sfpn_vars, fpn, towers_only=True)[0]
        return (fused.astype(jnp.float32).sum(),)

    variants["sfpn_towers"] = scan_over(v_towers)

    def v_sfpn(im):
        fpn = model.apply(cast_vars, im[None],
                          method=PolyphonicFormer.extract_feat)
        outs = sfpn.apply(sfpn_vars, fpn)
        return (outs[0].astype(jnp.float32).sum(),
                outs[1].astype(jnp.float32).sum(),
                outs[2].astype(jnp.float32).sum())

    variants["sfpn_branches"] = scan_over(v_sfpn)

    variants["rpn"] = scan_over(lambda im: (
        model.apply(cast_vars,
                    model.apply(cast_vars, im[None],
                                method=PolyphonicFormer.extract_feat),
                    method=lambda m, f: m.rpn_head(f)).mask_preds
        .astype(jnp.float32).sum(),))

    def v_fwd(im):
        fpn = model.apply(cast_vars, im[None],
                          method=PolyphonicFormer.extract_feat)
        out = model.apply(cast_vars, fpn,
                          method=PolyphonicFormer.forward_heads)
        return (out.stages[-1].cls_score.astype(jnp.float32).sum(),)

    variants["fwd"] = scan_over(v_fwd)

    prev = None
    for name, fn in variants.items():
        t, _ = timed(fn, x)
        delta = "" if prev is None else f" (delta {(t - prev) / T * 1000:+.2f})"
        print(f"{name:14s} {t / T * 1000:8.2f} ms/frame{delta}")
        prev = t


if __name__ == "__main__":
    main()
