"""Dev-only: stem (7x7/s2 conv @1024x2048x3) alternatives on the real chip.

XLA's native conv at C_in=3 runs ~20x off roofline (3.35 ms measured,
bench_micro.py).  Candidates:
  A. XLA conv baseline
  B. space-to-depth 2x2 via reshape/transpose (free relayout per ROUND2)
     -> XLA conv 4x4/s1 @512x1024x12 (known-lost: 4.6ms, re-measure)
  C. STD 2x2 -> im2col via 16 NON-strided shifted slices -> one matmul
     (B, 512*1024, 192) @ (192, 64)
  D. im2col direct: 49 stride-2 slices (known-bad relayout, re-measure)
  E. STD 4x4 -> conv 2x2/s1 @256x512x48 ... shape mismatch for s2 output;
     skipped (output stride must be 2, not 4)
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

T = 8
DT = jnp.bfloat16
H, W = 1024, 2048


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


def scanbench(name, body, x, noop_ms, check_against=None):
    @jax.jit
    def fn(xs):
        def b(c, im):
            return c, (body(im).astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, xs)[1]

    t = timed(fn, x) / T * 1000
    extra = ""
    if check_against is not None:
        got = np.asarray(jax.jit(body)(x[0]), np.float32)
        err = np.abs(got - check_against).max() / max(
            np.abs(check_against).max(), 1e-6)
        extra = f"  relerr {err:.2e}"
    print(f"{name:44s} {t - noop_ms:8.2f} ms{extra}")
    return t


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (T, H, W, 3), DT)

    @jax.jit
    def noop(xs):
        def b(c, im):
            return c, (im.astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, xs)[1]

    noop_ms = timed(noop, x) / T * 1000
    print(f"{'noop (read input)':44s} {noop_ms:8.2f} ms")

    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64), DT) * 0.05

    # A. XLA conv baseline
    def conv_a(im):
        return jax.lax.conv_general_dilated(
            im[None], w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    ref = np.asarray(jax.jit(conv_a)(x[0]), np.float32)
    scanbench("A: XLA conv 7x7/s2", conv_a, x, noop_ms)

    # B. STD 2x2 (reshape/transpose) -> XLA conv 4x4/s1 on 12ch
    # out(p,q,n) = sum_{a,b,c} w[a,b,c,n] x[2p+a-3, 2q+b-3, c]
    # with x std'd: x4[p', q', (dy,dx,c)] = x[2p'+dy, 2q'+dx, c]
    # 2p+a-3 = 2(p+u)+dy with a-3 = 2u+dy -> a in 0..6 maps to
    # u in {-2,-1,0,1}, dy in {0,1}: a = 2u+dy+3
    w4 = np.zeros((4, 4, 12, 64), np.float32)
    wn = np.asarray(w, np.float32)
    for a in range(7):
        for b_ in range(7):
            u, dy = divmod(a - 3 + 4, 2)
            u -= 2
            v, dx = divmod(b_ - 3 + 4, 2)
            v -= 2
            for c in range(3):
                w4[u + 2, v + 2, (dy * 2 + dx) * 3 + c] += wn[a, b_, c]
    w4 = jnp.asarray(w4, DT)

    def std(im):
        # (H, W, 3) -> (H/2, W/2, 12); relayout only
        return im.reshape(H // 2, 2, W // 2, 2, 3).transpose(
            0, 2, 1, 3, 4).reshape(H // 2, W // 2, 12)

    def conv_b(im):
        x4 = std(im)
        return jax.lax.conv_general_dilated(
            x4[None], w4, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    scanbench("B: STD2x2 + conv 4x4/s1 @12ch", conv_b, x, noop_ms,
              check_against=ref)

    # C. STD + im2col(16 shifted slices) + one matmul
    wmat = jnp.asarray(w4.reshape(16 * 12, 64), DT)

    def conv_c(im):
        x4 = std(im)
        xp = jnp.pad(x4, ((2, 1), (2, 1), (0, 0)))
        cols = [xp[a:a + H // 2, b_:b_ + W // 2] for a in range(4)
                for b_ in range(4)]
        patches = jnp.concatenate(cols, axis=-1)  # (512, 1024, 192)
        return patches @ wmat

    scanbench("C: STD2x2 + 16-shift im2col + matmul", conv_c, x, noop_ms,
              check_against=ref)

    # C2: same but einsum without materializing concat
    def conv_c2(im):
        x4 = std(im)
        xp = jnp.pad(x4, ((2, 1), (2, 1), (0, 0)))
        acc = jnp.zeros((H // 2, W // 2, 64), DT)
        for a in range(4):
            for b_ in range(4):
                acc = acc + xp[a:a + H // 2, b_:b_ + W // 2] @ w4[a, b_]
        return acc

    scanbench("C2: STD2x2 + 16 shifted K=12 matmuls", conv_c2, x, noop_ms,
              check_against=ref)

    # D. conv_general_dilated_patches + matmul (no STD)
    def conv_d(im):
        p = jax.lax.conv_general_dilated_patches(
            im[None], (7, 7), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
        # patches channel order: C-major then spatial (c, a, b)
        wperm = jnp.asarray(
            np.transpose(np.asarray(w, np.float32), (2, 0, 1, 3))
            .reshape(147, 64), DT)
        return p @ wperm

    scanbench("D: dilated_patches + matmul", conv_d, x, noop_ms,
              check_against=ref)


if __name__ == "__main__":
    main()
