"""Dev-only round 2: stem layout experiments.

Hypothesis: (H, W, 3) puts C=3 on the TPU lane axis (128 lanes), inflating
every read of the input ~40x. Try channel-major layouts and f32.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

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


def scanbench(name, body, x, noop_ms, check=None):
    @jax.jit
    def fn(xs):
        def b(c, im):
            return c, (body(im).astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, xs)[1]

    t = timed(fn, x) / T * 1000
    extra = ""
    if check is not None:
        got = np.asarray(jax.jit(body)(x[0]), np.float32)
        err = np.abs(got.reshape(-1) - check.reshape(-1)).max() / max(
            np.abs(check).max(), 1e-6)
        extra = f"  relerr {err:.2e}"
    print(f"{name:44s} {t - noop_ms:8.2f} ms{extra}")


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (T, H, W, 3), DT)
    xc = jnp.moveaxis(x, -1, 1)  # (T, 3, H, W)

    @jax.jit
    def noop(xs):
        def b(c, im):
            return c, (im.astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, xs)[1]

    noop_ms = timed(noop, x) / T * 1000
    noop_c_ms = timed(noop, xc) / T * 1000
    print(f"{'noop NHWC':44s} {noop_ms:8.2f} ms")
    print(f"{'noop NCHW':44s} {noop_c_ms:8.2f} ms")

    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 64), DT) * 0.05

    def conv_a(im):
        return jax.lax.conv_general_dilated(
            im[None], w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    ref = np.asarray(jax.jit(conv_a)(x[0]), np.float32)
    scanbench("A: NHWC->NHWC (baseline)", conv_a, x, noop_ms)

    # B: NCHW input -> NCHW output
    def conv_b(im):
        return jax.lax.conv_general_dilated(
            im[None], w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"))[0]

    scanbench("B: NCHW->NCHW", conv_b, xc, noop_c_ms,
              check=np.moveaxis(ref, -1, 0))

    # C: NCHW input -> NHWC output
    def conv_c(im):
        return jax.lax.conv_general_dilated(
            im[None], w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NCHW", "HWIO", "NHWC"))[0]

    scanbench("C: NCHW->NHWC", conv_c, xc, noop_c_ms, check=ref)

    # D: NHWC input, transpose inside, NCHW conv, transpose back
    def conv_d(im):
        imc = jnp.moveaxis(im, -1, 0)
        out = jax.lax.conv_general_dilated(
            imc[None], w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"))[0]
        return jnp.moveaxis(out, 0, -1)

    scanbench("D: NHWC->(T)->NCHW conv->(T)", conv_d, x, noop_ms, check=ref)

    # E: f32 everything
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    def conv_e(im):
        return jax.lax.conv_general_dilated(
            im[None], wf, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    scanbench("E: NHWC f32", conv_e, xf, noop_ms)

    # F: stem + maxpool fused NCHW
    def stem_f(im):
        out = jax.lax.conv_general_dilated(
            im[None], w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        out = jax.lax.reduce_window(
            out, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
            [(0, 0), (0, 0), (1, 1), (1, 1)])
        return out[0]

    scanbench("F: NCHW conv+maxpool", stem_f, xc, noop_c_ms)

    # G: full NHWC stem conv+maxpool for comparison
    def stem_g(im):
        out = jax.lax.conv_general_dilated(
            im[None], w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = jax.lax.reduce_window(
            out, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        return out[0]

    scanbench("G: NHWC conv+maxpool", stem_g, x, noop_ms)


if __name__ == "__main__":
    main()
