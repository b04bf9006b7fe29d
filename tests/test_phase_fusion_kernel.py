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
