"""Dev-only: x2 bilinear upsample variants, same process, scan-amortized.

Variants: 'moveaxis' (generic axis move + interleave), 'rows' (transpose-
free sublane shifts + (H, f, W) reshape), 'einsum' (dense interpolation
matmuls).  Also times a bf16 (precise=False) flavor of the winner.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

REPS = 8


def timed(name, make_fn, x):
    fn = make_fn()

    @jax.jit
    def run(x):
        def body(c, _):
            o = fn(c)
            return c + o[..., :c.shape[-2], :c.shape[-1]] * 1e-9, o[..., 0, 0].sum()

        _, ss = jax.lax.scan(body, x, None, length=REPS)
        return ss.sum()

    _ = float(run(x))
    ts = []
    for _i in range(4):
        t0 = time.perf_counter()
        _ = float(run(x))
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name:24s} {sorted(ts)[len(ts)//2]*1000:8.2f} ms", flush=True)


def main():
    from polyphonicformer_tpu.ops import resize as R

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 1, 111, 128, 256), jnp.float32)
    h4, w4 = 256, 512

    def make_env(impl):
        def mk():
            os.environ["POLY_UPSAMPLE_IMPL"] = impl

            def f(c):
                return R.resize_bilinear(c, (h4, w4))

            return f

        return mk

    def make_einsum():
        rh = jnp.asarray(R._bilinear_matrix(128, h4))
        rw = jnp.asarray(R._bilinear_matrix(256, w4))

        def f(c):
            y = jnp.einsum("oh,...hw->...ow", rh, c,
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.einsum("pw,...ow->...op", rw, y,
                              precision=jax.lax.Precision.HIGHEST)

        return f

    timed("pallas", make_env("pallas"), x)
    timed("moveaxis", make_env("moveaxis"), x)
    timed("rows", make_env("rows"), x)
    timed("einsum-f32-highest", make_einsum, x)

    def make_einsum_fast():
        rh = jnp.asarray(R._bilinear_matrix(128, h4))
        rw = jnp.asarray(R._bilinear_matrix(256, w4))

        def f(c):
            y = jnp.einsum("oh,...hw->...ow", rh, c)
            return jnp.einsum("pw,...ow->...op", rw, y)

        return f

    timed("einsum-f32-default", make_einsum_fast, x)
    os.environ["POLY_UPSAMPLE_IMPL"] = "pallas"


if __name__ == "__main__":
    main()
