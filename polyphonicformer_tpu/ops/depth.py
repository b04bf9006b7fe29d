"""Depth activation, matching the reference exactly.

reference: /root/reference/polyphonic/funcs/depth_utils.py:1-19
"""
from __future__ import annotations

import jax


def depth_act(depth_out: jax.Array, mode: str = "sigmoid",
              min_depth: float = 0.01, max_depth: float = 80.0) -> jax.Array:
    if mode == "monodepth":
        disp = jax.nn.sigmoid(depth_out)
        min_disp = 1.0 / max_depth
        max_disp = 1.0 / min_depth
        scaled_disp = min_disp + (max_disp - min_disp) * disp
        return 1.0 / scaled_disp
    if mode == "sigmoid":
        disp = jax.nn.sigmoid(depth_out)
        return disp * (max_depth - min_depth) + min_depth
    raise NotImplementedError(mode)
