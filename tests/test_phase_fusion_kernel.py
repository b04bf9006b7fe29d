"""Pallas phase-fusion kernel parity (interpret mode on CPU) vs the XLA
phase-space implementation in infer/panoptic.py."""
import numpy as np

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.infer.panoptic import _interleave_phases, _phase_upsample
from polyphonicformer_tpu.ops.pallas.phase_fusion import phase_fusion


def xla_reference(probs, scores, depth, fy, fx):
    kk = probs.shape[0]
    oarea = jnp.zeros((kk,), jnp.int32)
    pix_tiles, dep_tiles = [], []
    for py in range(fy):
        for px in range(fx):
            up = _phase_upsample(probs, py, px, fy, fx)
            prob = scores[:, None, None] * up
            pa = jnp.argmax(prob, axis=0)
            region = pa[None] == jnp.arange(kk, dtype=pa.dtype)[:, None, None]
            oarea = oarea + (up >= 0.5).sum(axis=(1, 2)).astype(jnp.int32)
            dup = _phase_upsample(depth, py, px, fy, fx)
            dep_tiles.append(jnp.einsum("khw,khw->hw",
                                        region.astype(jnp.float32), dup))
            pix_tiles.append(pa)
    return pix_tiles, dep_tiles, oarea


def test_kernel_matches_xla_phase_path():
    rng = np.random.RandomState(0)
    kk, hs, ws = 23, 16, 32
    probs = jax.nn.sigmoid(jnp.asarray(rng.randn(kk, hs, ws), jnp.float32) * 3)
    scores = jnp.asarray(rng.rand(kk), jnp.float32)
    depth = jnp.asarray(rng.rand(kk, hs, ws) * 70 + 1, jnp.float32)

    pix, dep, rowm, colm, oarea = phase_fusion(probs, scores, depth, 4, 4,
                                               interpret=True)
    # the kernel stores tiles in bf16; reference on the same rounded inputs
    probs = probs.astype(jnp.bfloat16).astype(jnp.float32)
    depth = depth.astype(jnp.bfloat16).astype(jnp.float32)
    pix_t, dep_t, oarea_w = xla_reference(probs, scores, depth, 4, 4)

    got_pix = np.asarray(pix)  # kernel returns the full-res raster directly
    want_pix = np.asarray(_interleave_phases(pix_t, 4, 4))
    np.testing.assert_array_equal(got_pix, want_pix)

    got_dep = dep
    want_dep = _interleave_phases(dep_t, 4, 4)
    np.testing.assert_allclose(np.asarray(got_dep), np.asarray(want_dep),
                               rtol=1e-5, atol=1e-4)
    # marginals: row/col counts of the full-res argmax regions
    region_full = want_pix[None] == np.arange(kk)[:, None, None]
    np.testing.assert_array_equal(np.asarray(rowm).astype(np.int32),
                                  region_full.sum(axis=2))
    np.testing.assert_array_equal(np.asarray(colm).astype(np.int32),
                                  region_full.sum(axis=1))
    np.testing.assert_array_equal(
        np.asarray(rowm).sum(axis=1).astype(np.int32),
        region_full.sum(axis=(1, 2)))
    np.testing.assert_array_equal(np.asarray(oarea).astype(np.int32),
                                  np.asarray(oarea_w))


def test_kernel_prune_fold_matches_full_semantics():
    """n_full < K: pruned rows fold into an exact max channel.  Wherever a
    pruned row would have won the full argmax, the kernel must emit the
    sentinel (rendered void — the same as the full kernel's outcome for a
    below-threshold winner); everywhere else pix/depth/marginals match the
    full kernel restricted to full rows."""
    rng = np.random.RandomState(1)
    kk, hs, ws = 23, 16, 32
    nf_req = 10
    nf = (nf_req + 7) // 8 * 8  # kernel pads to 16
    probs = jax.nn.sigmoid(jnp.asarray(rng.randn(kk, hs, ws), jnp.float32) * 3)
    scores = jnp.asarray(rng.rand(kk), jnp.float32)
    depth = jnp.asarray(rng.rand(kk, hs, ws) * 70 + 1, jnp.float32)

    pix_p, dep_p, rowm_p, colm_p, oarea_p = phase_fusion(
        probs, scores, depth, 4, 4, interpret=True, n_full=nf_req)
    pix_f, dep_f, rowm_f, colm_f, oarea_f = phase_fusion(
        probs, scores, depth, 4, 4, interpret=True)

    pix_f = np.asarray(pix_f)
    pix_p = np.asarray(pix_p)
    pruned_won = pix_f >= nf
    # full-row winners identical; pruned winners -> sentinel nf
    np.testing.assert_array_equal(pix_p[~pruned_won], pix_f[~pruned_won])
    assert (pix_p[pruned_won] == nf).all()
    assert pruned_won.any(), "test vector should exercise pruned wins"
    # depth: full-row winners keep their depth, sentinel pixels emit 0
    np.testing.assert_allclose(np.asarray(dep_p)[~pruned_won],
                               np.asarray(dep_f)[~pruned_won],
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(dep_p)[pruned_won], 0.0)
    # marginals over full rows match the region counts of the pruned pix map
    region = pix_p[None] == np.arange(nf)[:, None, None]
    np.testing.assert_array_equal(np.asarray(rowm_p).astype(np.int64),
                                  region.sum(axis=2))
    np.testing.assert_array_equal(np.asarray(colm_p).astype(np.int64),
                                  region.sum(axis=1))
    np.testing.assert_array_equal(np.asarray(oarea_p), np.asarray(oarea_f)[:nf])


def test_fuse_panoptic_prune_consistent_with_unpruned(monkeypatch):
    """End-to-end fuse_panoptic: the pruned fast path must keep/render the
    same segments as the unpruned kernel path (candidate order differs by
    the documented compaction permutation)."""
    import dataclasses

    from polyphonicformer_tpu.configs import ModelConfig
    from polyphonicformer_tpu.infer import panoptic as P

    monkeypatch.setattr(P, "_use_pallas_fusion", lambda: True)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # interpret-mode pallas on CPU
    import polyphonicformer_tpu.ops.pallas.phase_fusion as PF

    orig = PF.phase_fusion

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    monkeypatch.setattr(PF, "phase_fusion", interp)

    rng = np.random.RandomState(2)
    cfg = ModelConfig()
    nq, hs, ws = cfg.num_queries, 16, 32
    h, w = hs * 4, ws * 4
    cls_probs = jnp.asarray(rng.rand(nq, cfg.num_classes), jnp.float32)
    mask_logits = jnp.asarray(rng.randn(nq, hs, ws), jnp.float32) * 3
    depth_logits = jnp.asarray(rng.randn(nq, hs, ws), jnp.float32)
    dinit = jnp.asarray(rng.randn(hs, ws), jnp.float32)

    def run(ke_t):
        c = dataclasses.replace(cfg, fusion_full_things=ke_t)
        return P.fuse_panoptic(c, cls_probs, mask_logits, depth_logits,
                               dinit, (h, w), fusion_dtype=jnp.bfloat16,
                               emit_marginals=True, defer_maps=True)

    full = run(cfg.num_proposals)  # prune disabled
    pruned = run(53)
    assert full.n_render is None and pruned.n_render == 64

    # kept segment sets agree: map candidate ids through labels/scores
    fk = np.asarray(full.keep)
    pk = np.asarray(pruned.keep)
    kept_full = {(int(l), round(float(s), 5))
                 for l, s, k in zip(np.asarray(full.labels),
                                    np.asarray(full.scores), fk) if k}
    kept_pruned = {(int(l), round(float(s), 5))
                   for l, s, k in zip(np.asarray(pruned.labels),
                                      np.asarray(pruned.scores), pk) if k}
    assert kept_full == kept_pruned
