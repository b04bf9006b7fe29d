"""Dev-only: win_attn_math kernel vs XLA attn math — parity + timing."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

REPS = 64


def timed(name, fn, *args):
    run = jax.jit(fn)
    _ = float(run(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(*args))
        ts.append((time.perf_counter() - t0) / REPS)
    print(f"{name:34s} {sorted(ts)[1]*1000:8.3f} ms", flush=True)


def loop(body):
    def outer(x, *rest):
        def step(c, _):
            y = body(c, *rest)
            bump = y.mean().astype(c.dtype)
            return c + bump * 1e-9, bump

        _, ss = jax.lax.scan(step, x, None, length=REPS)
        return ss.astype(jnp.float32).sum()

    return outer


def bench(tag, nw, heads, c, with_mask):
    from polyphonicformer_tpu.ops.pallas.win_attn_math import (
        _jnp_reference, window_attn_math)

    l = 49
    key = jax.random.PRNGKey(0)
    qkv = jax.random.normal(key, (nw, l, 3 * c), jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(1), (heads, l, l),
                             jnp.float32) * 0.1
    mask = None
    if with_mask:
        mvals = (np.random.RandomState(0).rand(nw, l, l) < 0.2) * -100.0
        mask = jnp.asarray(mvals, jnp.float32)

    a = jax.jit(lambda q: window_attn_math(q, bias, mask, heads))(qkv)
    b = jax.jit(lambda q: _jnp_reference(q, bias, mask, heads))(qkv)
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                b.astype(jnp.float32))))
    print(f"--- {tag}: nw={nw} heads={heads} c={c} mask={with_mask} "
          f"maxerr={err:.4f}", flush=True)
    assert err < 0.15, err

    timed("pallas", loop(lambda q: window_attn_math(q, bias, mask, heads)),
          qkv)
    timed("xla", loop(lambda q: _jnp_reference(q, bias, mask, heads)), qkv)


def main():
    bench("stage0", 2738, 6, 192, True)
    bench("stage1", 703, 12, 384, False)
    bench("stage2", 190, 24, 768, True)
    bench("stage3", 50, 48, 1536, False)


if __name__ == "__main__":
    main()
