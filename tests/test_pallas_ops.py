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


class TestFusedMaskLoss:
    """ops/pallas/mask_loss.py vs a plain-jnp reference of the three loss
    reductions (mmdet BCE / dice eps=1e-3 / rank softmax-CE semantics)."""

    def _ref(self, m, t, pos, v, lbl):
        bce = (jnp.maximum(m, 0.0) - m * t + jnp.log1p(jnp.exp(-jnp.abs(m))))
        bce_s = jnp.einsum("nqhw,nq,nhw->n", bce, pos, v)
        sig = jax.nn.sigmoid(m)
        a = jnp.einsum("nqhw,nqhw,nhw->nq", sig, t, v)
        b = jnp.einsum("nqhw,nqhw,nhw->nq", sig, sig, v)
        c = jnp.einsum("nqhw,nqhw,nhw->nq", t, t, v)
        q = m.shape[1]
        rvalid = (lbl >= 0) & (lbl < q) & (lbl != 255)
        safe = jnp.where(rvalid, lbl, 0)
        logp = jax.nn.log_softmax(m, axis=1)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
        rank_s = jnp.where(rvalid, nll, 0.0).sum(axis=(1, 2))
        return bce_s, rank_s, a, b, c

    def _inputs(self, seed=0, n=2, q=7, h=16, w=128):
        rng = np.random.RandomState(seed)
        m = jnp.asarray(rng.randn(n, q, h, w).astype(np.float32) * 3)
        t = jnp.asarray((rng.rand(n, q, h, w) < 0.3).astype(np.float32))
        pos = jnp.asarray((rng.rand(n, q) < 0.5).astype(np.float32))
        v = jnp.asarray((rng.rand(n, h, w) < 0.9).astype(np.float32))
        lbl = rng.randint(-1, q + 2, (n, h, w))
        lbl[rng.rand(n, h, w) < 0.2] = 255
        return m, t, pos, v, jnp.asarray(lbl.astype(np.int32))

    def test_forward_matches_reference(self):
        from polyphonicformer_tpu.ops.pallas.mask_loss import (
            fused_mask_loss_stats)

        m, t, pos, v, lbl = self._inputs()
        stats, dice = fused_mask_loss_stats(m, t, pos, v, lbl, True)
        bce_s, rank_s, a, b, c = self._ref(m, t, pos, v, lbl)
        np.testing.assert_allclose(stats[:, 0], bce_s, rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(stats[:, 1], rank_s, rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(dice[:, 0], a, rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(dice[:, 1], b, rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(dice[:, 2], c, rtol=2e-5, atol=1e-4)

    def test_grads_match_reference(self):
        from polyphonicformer_tpu.ops.pallas.mask_loss import (
            fused_mask_loss_stats)

        m, t, pos, v, lbl = self._inputs(seed=3, n=1, q=5, h=8, w=128)
        rng = np.random.RandomState(4)
        ws = jnp.asarray(rng.randn(2).astype(np.float32))
        wd = jnp.asarray(rng.randn(3, 5).astype(np.float32))

        def fused(mm):
            stats, dice = fused_mask_loss_stats(mm, t, pos, v, lbl, True)
            return (stats[0, 0] * ws[0] + stats[0, 1] * ws[1]
                    + (dice[0] * wd).sum())

        def ref(mm):
            bce_s, rank_s, a, b, c = self._ref(mm, t, pos, v, lbl)
            abc = jnp.stack([a[0], b[0], c[0]])
            return bce_s[0] * ws[0] + rank_s[0] * ws[1] + (abc * wd).sum()

        np.testing.assert_allclose(fused(m), ref(m), rtol=1e-5, atol=1e-5)
        gf = jax.grad(fused)(m)
        gr = jax.grad(ref)(m)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-5)

    def test_stacked_loss_path_parity(self):
        """The losses.py integration (POLY_MASK_LOSS_IMPL=interpret) equals
        the XLA path bit-for-bit-ish on the real target structures."""
        import os

        from polyphonicformer_tpu.configs import ModelConfig
        from polyphonicformer_tpu.data.loader import synthetic_batch
        from polyphonicformer_tpu.train import losses as L
        from polyphonicformer_tpu.train.targets import build_stage_targets

        cfg = ModelConfig()
        batch = synthetic_batch(cfg, 1, hw=(64, 128))
        gt = batch.gt
        rng = np.random.RandomState(7)
        s, b = 2, 1
        q = cfg.num_proposals + cfg.num_classes - cfg.num_thing_classes
        h, w = 32, 64
        masks = jnp.asarray(rng.randn(s, b, q, h, w).astype(np.float32))
        m = gt.thing_masks.shape[1]
        p2g = jnp.asarray(rng.randint(-1, m, (s, b, q)).astype(np.int32))
        g2p = jnp.full((s, b, m), -1, np.int32)
        from polyphonicformer_tpu.train.assign import AssignResult
        assign = AssignResult(pred2gt=p2g, gt2pred=g2p)
        build = jax.vmap(jax.vmap(
            lambda a, g: build_stage_targets(a, g, cfg.num_proposals,
                                             cfg.num_thing_classes,
                                             cfg.num_classes, 255),
            in_axes=(0, 0)), in_axes=(0, None))
        # gt arrives at the scaled res for this test
        import dataclasses

        gt_small = dataclasses.replace(
            gt,
            thing_masks=jnp.asarray(
                (rng.rand(b, m, h, w) < 0.3).astype(np.float32)),
            stuff_masks=jnp.asarray(
                (rng.rand(b, cfg.num_classes - cfg.num_thing_classes, h, w)
                 < 0.3).astype(np.float32)),
            depth=jnp.asarray(rng.rand(b, h, w).astype(np.float32)),
            valid_mask=jnp.asarray((rng.rand(b, h, w) < 0.95)))
        targets = build(assign, gt_small)

        def _loss_dict(mm):
            d = {}
            L._mask_dice_rank_losses_stacked(cfg, mm, targets, gt_small, q,
                                             ["p0", "p1"], d)
            return d

        def run(impl):
            os.environ["POLY_MASK_LOSS_IMPL"] = impl
            try:
                (_, d), grads = jax.value_and_grad(
                    lambda mm: (sum(_loss_dict(mm).values()), _loss_dict(mm)),
                    has_aux=True)(masks)
                return {k: float(v) for k, v in d.items()}, grads
            finally:
                os.environ["POLY_MASK_LOSS_IMPL"] = "xla"

        want, gw = run("xla")
        got, gg = run("interpret")
        assert want.keys() == got.keys()
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=2e-5,
                                       atol=1e-5, err_msg=k)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   rtol=2e-4, atol=1e-5)
