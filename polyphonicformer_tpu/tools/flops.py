"""FLOPs / memory analysis of the compiled model.

reference capability: ``forward_dummy`` paths used for FLOPs counting
(polyphonic/kernel_head.py:708-713, mmdet two_stage.py:72-88).  Here the
numbers come from XLA's own cost analysis of the compiled program, which
accounts for fusion — more faithful than operator-level counting.
"""
from __future__ import annotations

import argparse


def analyze(preset: str = None, hw=(1024, 2048), batch: int = 1):
    import jax
    import jax.numpy as jnp

    from ..configs import ModelConfig, get_preset
    from ..models import PolyphonicFormer

    cfg = get_preset(preset).model if preset else ModelConfig()
    model = PolyphonicFormer(cfg)
    img = jnp.zeros((batch, *hw, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img,
                           method=PolyphonicFormer.init_all))
    # real init for compilation
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 128, 3), jnp.float32),
                           method=PolyphonicFormer.init_all)

    lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(variables, img)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    out = {
        "params_M": n_params / 1e6,
        "flops_G": cost.get("flops", 0) / 1e9,
        "bytes_accessed_GB": cost.get("bytes accessed", 0) / 1e9,
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default=None)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    out = analyze(args.preset, (args.height, args.width), args.batch)
    for k, v in out.items():
        print(f"{k}: {v:.2f}")


if __name__ == "__main__":
    main()
