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


def test_pallas_lsa_matches_scipy_and_lax():
    """The Pallas JV solver (interpret mode here; compiled on TPU) produces
    scipy-optimal assignments on batched rectangular problems with invalid
    rows, matching the lax solver's contract (ops/hungarian.py)."""
    from scipy.optimize import linear_sum_assignment

    from polyphonicformer_tpu.ops.pallas.lsa import solve_lsa_pallas

    rng = np.random.RandomState(3)
    n, g, p = 5, 16, 100
    costs = rng.randn(n, g, p).astype(np.float32) * 7
    valids = rng.rand(n, g) > 0.4
    valids[0] = False
    valids[1] = True
    got = np.asarray(solve_lsa_pallas(jnp.asarray(costs), jnp.asarray(valids),
                                      interpret=True))
    for i in range(n):
        idx = np.where(valids[i])[0]
        assert (got[i][~valids[i]] == -1).all()
        if len(idx) == 0:
            continue
        sub = costs[i][idx]
        rows, cols_ref = linear_sum_assignment(sub)
        want = sub[rows, cols_ref].sum()
        cols = got[i][idx]
        assert len(set(cols.tolist())) == len(idx)
        total = sub[np.arange(len(idx)), cols].sum()
        np.testing.assert_allclose(total, want, rtol=1e-5, atol=1e-4)


def test_pallas_upsample2_bitexact_and_grad():
    """The Pallas x2 upsample is BIT-equal to the XLA phase path (same ops,
    same order) and its custom-VJP transpose matches autodiff of the XLA
    path exactly."""
    from polyphonicformer_tpu.ops.pallas.upsample2 import upsample2_pallas
    from polyphonicformer_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(0)
    for n, h, w in [(7, 16, 32), (3, 8, 128), (2, 1, 8)]:
        x = jnp.asarray(rng.randn(n, h, w), jnp.float32)
        a = np.asarray(upsample2_pallas(x, True))
        b = np.asarray(resize_bilinear(x, (2 * h, 2 * w)))
        if h >= 2 and w >= 2:
            assert (a == b).all(), (n, h, w, np.abs(a - b).max())
        else:
            # size-1 axes: XLA simplifies the clamped 0.25x+0.75x to x,
            # the kernel computes it -> 1 ulp
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=3e-7)

        ct = jnp.asarray(rng.randn(n, 2 * h, 2 * w), jnp.float32)
        ga = jax.grad(lambda v: (upsample2_pallas(v, True) * ct).sum())(x)
        gb = jax.grad(lambda v: (resize_bilinear(v, (2 * h, 2 * w)) * ct
                                 ).sum())(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-5)


def test_pallas_upsample_int_factors():
    """Generalized integer-factor kernel matches the XLA phase path (x3/x4)
    including gradients."""
    from polyphonicformer_tpu.ops.pallas.upsample2 import upsample_int_pallas
    from polyphonicformer_tpu.ops.resize import resize_bilinear

    rng = np.random.RandomState(1)
    for f in (3, 4):
        x = jnp.asarray(rng.randn(3, 8, 16), jnp.float32)
        a = np.asarray(upsample_int_pallas(x, f, True))
        b = np.asarray(resize_bilinear(x, (8 * f, 16 * f)))
        # same math; compilers may differ in FMA contraction for the
        # non-dyadic phase weights -> ulp-level tolerance
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=5e-7)
        ct = jnp.asarray(rng.randn(3, 8 * f, 16 * f), jnp.float32)
        ga = jax.grad(lambda v: (upsample_int_pallas(v, f, True) * ct).sum())(x)
        gb = jax.grad(
            lambda v: (resize_bilinear(v, (8 * f, 16 * f)) * ct).sum())(x)
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-5, atol=1e-5)
