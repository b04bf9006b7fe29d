"""Gated adaptive kernel update (K-Net dynamic kernel update).

reference: /root/reference/polyphonic/funcs/kernel_updator.py:55-93 with
in=feat=out=256, LN everywhere, ReLU, gate_sigmoid=True
(configs/_base_/models/polyphonic_former.py:131-138).  conv_kernel_size=1 in
all shipped configs, so kernels are flat (B, N, C) vectors.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_uniform()


class KernelUpdator(nn.Module):
    channels: int = 256

    @nn.compact
    def __call__(self, update_feature: jax.Array, input_feature: jax.Array) -> jax.Array:
        """update_feature: (B, N, C) mask-pooled features;
        input_feature: (B, N, C) current kernels. Returns (B, N, C)."""
        c = self.channels
        params = nn.Dense(2 * c, name="dynamic_layer", kernel_init=_XAVIER)(update_feature)
        param_in, param_out = params[..., :c], params[..., c:]
        inputs = nn.Dense(2 * c, name="input_layer", kernel_init=_XAVIER)(input_feature)
        input_in, input_out = inputs[..., :c], inputs[..., c:]

        gate_feats = input_in * param_in
        input_gate = nn.LayerNorm(epsilon=1e-5, name="input_norm_in")(
            nn.Dense(c, name="input_gate", kernel_init=_XAVIER)(gate_feats))
        update_gate = nn.LayerNorm(epsilon=1e-5, name="norm_in")(
            nn.Dense(c, name="update_gate", kernel_init=_XAVIER)(gate_feats))
        input_gate = jax.nn.sigmoid(input_gate)
        update_gate = jax.nn.sigmoid(update_gate)

        param_out = nn.LayerNorm(epsilon=1e-5, name="norm_out")(param_out)
        input_out = nn.LayerNorm(epsilon=1e-5, name="input_norm_out")(input_out)

        features = update_gate * param_out + input_gate * input_out
        features = nn.Dense(c, name="fc_layer", kernel_init=_XAVIER)(features)
        features = nn.LayerNorm(epsilon=1e-5, name="fc_norm")(features)
        return nn.relu(features)
