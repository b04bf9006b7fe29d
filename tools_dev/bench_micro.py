"""Dev-only: micro-timing of forward-path primitives on the real chip.

Isolates the two hot items from bench_backbone.py (stem +3.5 ms,
semantic-FPN towers +4.9 ms) into primitive costs: conv alone, GroupNorm
alone, conv+GN+relu fused, bilinear upsample, maxpool, at the exact shapes
the model uses.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

T = 8
DT = jnp.bfloat16


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
    return sorted(times)[len(times) // 2]


def scanbench(name, shape, body, noop_ms):
    x = jax.random.normal(jax.random.PRNGKey(0), (T,) + shape, DT)

    @jax.jit
    def fn(xs):
        def b(c, im):
            return c, (body(im).astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, xs)[1]

    t = timed(fn, x) / T * 1000
    print(f"{name:34s} {t - noop_ms:8.2f} ms  (raw {t:.2f})")
    return t


def main():
    from polyphonicformer_tpu.ops.resize import resize_bilinear_nhwc

    rng = jax.random.PRNGKey(0)

    # noop floor
    x = jax.random.normal(rng, (T, 256, 512, 256), DT)

    @jax.jit
    def noop(xs):
        def b(c, im):
            return c, (im.astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, xs)[1]

    noop_ms = timed(noop, x) / T * 1000
    print(f"{'noop (read 256x512x256)':34s} {noop_ms:8.2f} ms")

    kw = dict(use_bias=False, padding=[(1, 1), (1, 1)])
    conv_s2 = nn.Conv(256, (3, 3), strides=(2, 2), **kw)
    v_s2 = conv_s2.init(rng, jnp.zeros((1, 8, 8, 256), DT))
    v_s2 = jax.tree_util.tree_map(lambda a: a.astype(DT), v_s2)
    conv_s1 = nn.Conv(256, (3, 3), strides=(1, 1), **kw)
    v_s1 = conv_s1.init(rng, jnp.zeros((1, 8, 8, 256), DT))
    v_s1 = jax.tree_util.tree_map(lambda a: a.astype(DT), v_s1)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    v_gn = gn.init(rng, jnp.zeros((1, 8, 8, 256), DT))
    v_gn = jax.tree_util.tree_map(lambda a: a.astype(DT), v_gn)

    # tower t0: 3x3 s2 conv on P2 (256x512x256)
    scanbench("t0 conv3x3 s2 @256x512x256", (256, 512, 256),
              lambda im: conv_s2.apply(v_s2, im[None]), noop_ms)
    scanbench("t0 conv+GN+relu", (256, 512, 256),
              lambda im: nn.relu(gn.apply(v_gn, conv_s2.apply(v_s2, im[None]))),
              noop_ms)
    # tower t1: 3x3 conv on P3 (128x256x256)
    scanbench("t1 conv3x3 @128x256x256", (128, 256, 256),
              lambda im: conv_s1.apply(v_s1, im[None]), noop_ms)
    scanbench("t1 conv+GN+relu", (128, 256, 256),
              lambda im: nn.relu(gn.apply(v_gn, conv_s1.apply(v_s1, im[None]))),
              noop_ms)
    scanbench("GN alone @128x256x256", (128, 256, 256),
              lambda im: gn.apply(v_gn, im[None]), noop_ms)
    scanbench("GN alone @256x512x256", (256, 512, 256),
              lambda im: gn.apply(v_gn, im[None]), noop_ms)
    scanbench("relu alone @128x256x256", (128, 256, 256),
              lambda im: nn.relu(im), noop_ms)
    scanbench("up2x bilinear 64x128->128x256", (64, 128, 256),
              lambda im: resize_bilinear_nhwc(im[None], (128, 256)), noop_ms)
    scanbench("up2x bilinear 128x256->256x512", (128, 256, 256),
              lambda im: resize_bilinear_nhwc(im[None], (256, 512)), noop_ms)

    # stem pieces
    conv7 = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False,
                    padding=[(3, 3), (3, 3)])
    v7 = conv7.init(rng, jnp.zeros((1, 8, 8, 3), DT))
    v7 = jax.tree_util.tree_map(lambda a: a.astype(DT), v7)
    scanbench("stem conv7x7 s2 @1024x2048x3", (1024, 2048, 3),
              lambda im: conv7.apply(v7, im[None]), noop_ms)
    scanbench("stem maxpool3x3 s2 @512x1024x64", (512, 1024, 64),
              lambda im: nn.max_pool(im[None], (3, 3), strides=(2, 2),
                                     padding=[(1, 1), (1, 1)]), noop_ms)
    # 7x7x3 conv expressed as 4x4 space-to-depth is known-lost (ROUND2);
    # try channel-padding the input to 8 instead
    conv7p = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False,
                     padding=[(3, 3), (3, 3)])
    v7p = conv7p.init(rng, jnp.zeros((1, 8, 8, 8), DT))
    v7p = jax.tree_util.tree_map(lambda a: a.astype(DT), v7p)
    scanbench("stem conv7x7 s2, C padded to 8", (1024, 2048, 8),
              lambda im: conv7p.apply(v7p, im[None]), noop_ms)
    # and as a stride-2 1x1x147 matmul over patch-extracted input: skip —
    # measure first whether C-pad helps.

    # bottleneck res2 first block convs for context
    conv1x1 = nn.Conv(64, (1, 1), use_bias=False)
    v1 = conv1x1.init(rng, jnp.zeros((1, 8, 8, 256), DT))
    v1 = jax.tree_util.tree_map(lambda a: a.astype(DT), v1)
    scanbench("1x1 conv 256->64 @256x512", (256, 512, 256),
              lambda im: conv1x1.apply(v1, im[None]), noop_ms)


if __name__ == "__main__":
    main()
