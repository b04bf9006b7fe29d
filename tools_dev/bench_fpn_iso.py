"""Dev-only: FPN and semantic-FPN towers in ISOLATION (random inputs),
removing variant-subtraction artifacts from bench_backbone.py."""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

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


def main():
    from polyphonicformer_tpu.models.fpn import FPN
    from polyphonicformer_tpu.models.semantic_fpn import SemanticFPNWrapper

    rng = jax.random.PRNGKey(0)
    # backbone C2..C5 at 1024x2048 input
    shapes_c = [(256, 512, 256), (128, 256, 512), (64, 128, 1024),
                (32, 64, 2048)]
    cs = [jax.random.normal(jax.random.PRNGKey(i), (T,) + s, DT)
          for i, s in enumerate(shapes_c)]
    fpn = FPN(256)
    vars_fpn = fpn.init(rng, [jnp.zeros((1,) + s, DT) for s in shapes_c])
    vars_fpn = jax.tree_util.tree_map(lambda a: a.astype(DT), vars_fpn)

    @jax.jit
    def run_fpn(c2, c3, c4, c5):
        def b(carry, xs):
            outs = fpn.apply(vars_fpn, [x[None] for x in xs])
            return carry, tuple(o.astype(jnp.float32).sum() for o in outs)

        return jax.lax.scan(b, 0, (c2, c3, c4, c5))[1]

    t = timed(run_fpn, *cs) / T * 1000
    print(f"FPN isolated (all 4 outs): {t:.2f} ms/frame")

    # towers on random P2..P5
    shapes_p = [(256, 512, 256), (128, 256, 256), (64, 128, 256),
                (32, 64, 256)]
    ps = [jax.random.normal(jax.random.PRNGKey(10 + i), (T,) + s, DT)
          for i, s in enumerate(shapes_p)]
    sfpn = SemanticFPNWrapper(feat_channels=256, out_channels=256)
    vars_s = sfpn.init(rng, [jnp.zeros((1,) + s, DT) for s in shapes_p])
    vars_s = jax.tree_util.tree_map(lambda a: a.astype(DT), vars_s)

    @jax.jit
    def run_towers(p2, p3, p4, p5):
        def b(carry, xs):
            fused = sfpn.apply(vars_s, [x[None] for x in xs],
                               towers_only=True)[0]
            return carry, (fused.astype(jnp.float32).sum(),)

        return jax.lax.scan(b, 0, (p2, p3, p4, p5))[1]

    t = timed(run_towers, *ps) / T * 1000
    print(f"towers isolated:           {t:.2f} ms/frame")

    @jax.jit
    def run_sfpn(p2, p3, p4, p5):
        def b(carry, xs):
            outs = sfpn.apply(vars_s, [x[None] for x in xs])
            return carry, tuple(o.astype(jnp.float32).sum() for o in outs)

        return jax.lax.scan(b, 0, (p2, p3, p4, p5))[1]

    t = timed(run_sfpn, *ps) / T * 1000
    print(f"towers+branches isolated:  {t:.2f} ms/frame")

    # noop floor for these inputs
    @jax.jit
    def noop(c2, c3, c4, c5):
        def b(carry, xs):
            return carry, tuple(x.astype(jnp.float32).sum() for x in xs)

        return jax.lax.scan(b, 0, (c2, c3, c4, c5))[1]

    t = timed(noop, *cs) / T * 1000
    print(f"noop (read C2..C5):        {t:.2f} ms/frame")


if __name__ == "__main__":
    main()
