"""Pallas kernel correctness (CPU fallback path + vjp semantics; the TPU
path is exercised by bench.py on hardware)."""
import numpy as np

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.ops.pallas.mask_pool import masked_pool


def test_masked_pool_matches_einsum():
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.randn(2, 13, 8, 16).astype(np.float32) * 3)
    feat = jnp.asarray(rng.randn(2, 8, 16, 32).astype(np.float32))
    got = masked_pool(mask, feat, 0.5)
    hard = (jax.nn.sigmoid(mask) > 0.5).astype(jnp.float32)
    want = jnp.einsum("bnhw,bhwc->bnc", hard, feat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_masked_pool_grads():
    rng = np.random.RandomState(1)
    mask = jnp.asarray(rng.randn(1, 5, 4, 8).astype(np.float32))
    feat = jnp.asarray(rng.randn(1, 4, 8, 16).astype(np.float32))

    def f(m, x):
        return masked_pool(m, x, 0.5).sum()

    gm, gx = jax.grad(f, argnums=(0, 1))(mask, feat)
    # hard threshold: no gradient to the mask logits (torch semantics)
    np.testing.assert_array_equal(np.asarray(gm), 0.0)
    hard = (jax.nn.sigmoid(mask) > 0.5).astype(jnp.float32)
    want_gx = jnp.einsum("bnh,bnc->bhc", hard.reshape(1, 5, 32),
                         jnp.ones((1, 5, 16))).reshape(1, 4, 8, 16)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(want_gx), rtol=1e-5)
