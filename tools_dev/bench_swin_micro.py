"""Dev-only: per-component timing of one Swin block at Swin-L shapes.

Isolates pad/crop, roll, window partition/unpartition, qkv, attention
math, proj, MLP, norms at stage-0 (256x512x192, 6 heads) and stage-2
(64x128x768, 24 heads) to find where the 13 ms/block (stage 0) goes.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

REPS = 64
WS = 7


def timed(name, fn, *args):
    run = jax.jit(fn)
    _ = float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name:32s} {sorted(ts)[1]*1000:8.3f} ms", flush=True)


def loop(body):
    def outer(x, *rest):
        def step(c, _):
            y = body(c, *rest)
            bump = y.mean().astype(c.dtype)
            return c + bump * 1e-9, bump

        _, ss = jax.lax.scan(step, x, None, length=REPS)
        return ss.astype(jnp.float32).sum()

    return outer


def bench_shape(tag, h, w, c, heads):
    from polyphonicformer_tpu.models.swin import (
        SwinBlock, _shift_attn_mask, window_partition, window_unpartition)

    hd = c // heads
    hp = (h + WS - 1) // WS * WS
    wp = (w + WS - 1) // WS * WS
    nw = (hp // WS) * (wp // WS)
    l = WS * WS
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, h, w, c), jnp.bfloat16)
    xp = jax.random.normal(key, (1, hp, wp, c), jnp.bfloat16)
    xw = jax.random.normal(key, (nw, l, c), jnp.bfloat16)
    qkv = jax.random.normal(key, (nw, l, 3 * c), jnp.bfloat16)
    wq = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) * 0.02
    wproj = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.02
    w1 = jax.random.normal(key, (c, 4 * c), jnp.bfloat16) * 0.02
    w2 = jax.random.normal(key, (4 * c, c), jnp.bfloat16) * 0.02
    bias = jax.random.normal(key, (heads, l, l), jnp.float32)
    mask = jnp.asarray(_shift_attn_mask(hp, wp, WS, WS // 2), jnp.bfloat16)

    print(f"--- {tag}: ({h}x{w}x{c}) heads={heads} nw={nw} ---", flush=True)

    timed("calib (x*1.0001)", loop(lambda v: v * 1.0001), x)

    timed("pad+crop", loop(
        lambda v: jnp.pad(v, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        [:, :h, :w]), x)
    timed("roll+unroll", loop(
        lambda v: jnp.roll(jnp.roll(v, (-3, -3), (1, 2)), (3, 3), (1, 2))), xp)
    timed("partition+unpartition", loop(
        lambda v: window_unpartition(window_partition(v, WS), WS, (hp, wp))), xp)
    timed("qkv dense (windowed)", loop(
        lambda v, wt: (v @ wt)[..., :c], xw, wq)
        if False else loop(lambda v, wt: (v @ wt)[..., :c]), xw, wq)
    timed("qkv dense (image)", loop(
        lambda v, wt: (v @ wt)[..., :c]), xp, wq)

    def attn_math(qkv3, b, m):
        q = qkv3[..., :c].reshape(nw, l, heads, hd)
        k = qkv3[..., c:2 * c].reshape(nw, l, heads, hd)
        v = qkv3[..., 2 * c:].reshape(nw, l, heads, hd)
        attn = jnp.einsum("wqhd,wkhd->whqk", q, k) / np.sqrt(hd)
        attn = attn + b[None]
        ntypes = m.shape[0]
        attn = attn.reshape(nw // ntypes, ntypes, heads, l, l) + \
            m[None, :, None].astype(attn.dtype)
        attn = attn.reshape(nw, heads, l, l)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.astype(qkv3.dtype)
        return jnp.einsum("whqk,wkhd->wqhd", attn, v).reshape(nw, l, c)

    timed("attn math (qk+sm+av)", loop(attn_math), qkv, bias, mask)

    def attn_nosm(qkv3, b):
        q = qkv3[..., :c].reshape(nw, l, heads, hd)
        k = qkv3[..., c:2 * c].reshape(nw, l, heads, hd)
        v = qkv3[..., 2 * c:].reshape(nw, l, heads, hd)
        attn = jnp.einsum("wqhd,wkhd->whqk", q, k) / np.sqrt(hd)
        attn = attn + b[None].astype(attn.dtype)
        return jnp.einsum("whqk,wkhd->wqhd", attn, v).reshape(nw, l, c)

    timed("attn dots only (no sm)", loop(attn_nosm), qkv, bias)
    timed("proj dense", loop(lambda v, wt: v @ wt), xw, wproj)
    timed("mlp (fc1+gelu+fc2)", loop(
        lambda v, a, b2: nn_gelu(v @ a) @ b2), xp, w1, w2)
    timed("layernorm x2", loop(
        lambda v: _ln(_ln(v))), xp)

    blk = SwinBlock(c, heads, window_size=WS, shift=3)
    bv = blk.init(jax.random.PRNGKey(1), x)
    bv = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a, bv)

    def full_block(v, params=bv):
        return blk.apply(params, v)

    timed("FULL block (shift=3)", loop(full_block), x)
    blk0 = SwinBlock(c, heads, window_size=WS, shift=0)
    bv0 = blk0.init(jax.random.PRNGKey(1), x)
    bv0 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a, bv0)
    timed("FULL block (shift=0)", loop(lambda v: blk0.apply(bv0, v)), x)


def nn_gelu(x):
    import flax.linen as nn

    return nn.gelu(x, approximate=False)


def _ln(x):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5)


def main():
    bench_shape("stage0", 256, 512, 192, 6)
    bench_shape("stage2", 64, 128, 768, 24)


if __name__ == "__main__":
    main()
