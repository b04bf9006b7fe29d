"""Swin backbone tests: shapes, shifted-window masking, full-model drop-in."""
import numpy as np

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import ModelConfig
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.models.swin import (
    SwinTransformer,
    window_partition,
    window_unpartition,
)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 14, 28, 8).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 4, 49, 8)
    back = window_unpartition(w, 7, (14, 28))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swin_tiny_shapes():
    model = SwinTransformer(32, (1, 1, 2, 1), (2, 4, 8, 16), window_size=7)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = jax.jit(lambda v, a: model.apply(v, a))(variables, x)
    assert [f.shape for f in feats] == [
        (1, 16, 32, 32), (1, 8, 16, 64), (1, 4, 8, 128), (1, 2, 4, 256)]
    for f in feats:
        assert np.isfinite(np.asarray(f)).all()


def test_swin_backbone_in_full_model():
    cfg = ModelConfig(backbone="swin_tiny", out_channels=64, in_channels=64,
                      fpn_out_channels=64, feedforward_channels=128,
                      num_proposals=10, max_things=4)
    model = PolyphonicFormer(cfg)
    img = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert out.stages[-1].mask_preds.shape == (1, cfg.num_queries, 8, 16)
    assert np.isfinite(np.asarray(out.stages[-1].cls_score)).all()


def test_fused_window_attention_matches_xla(monkeypatch):
    """The fused Pallas window-attention path (interpret mode here;
    compiled on TPU) matches the XLA windowed path through the full Swin
    backbone, shifted blocks and pad/crop included, on one parameter set."""
    import os

    from polyphonicformer_tpu.models.swin import SwinTransformer

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 18, 25, 3), jnp.float32)  # forces padding
    model = SwinTransformer(32, (2, 2), (2, 4))
    monkeypatch.setenv("POLY_FUSED_WATTN", "0")
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)
    monkeypatch.setenv("POLY_FUSED_WATTN", "interpret")
    got = model.apply(variables, x)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_wattn_math_kernel_matches_xla(monkeypatch):
    """The attention-math Pallas path (ops/pallas/win_attn_math, interpret
    mode here; compiled on TPU) matches the XLA einsum chain through the
    full backbone — shifted blocks, pad/crop, and the per-window shift
    mask included."""
    from polyphonicformer_tpu.models.swin import SwinTransformer

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 18, 25, 3), jnp.float32)  # forces padding
    model = SwinTransformer(32, (2, 2), (2, 4))
    monkeypatch.setenv("POLY_WATTN_MATH", "xla")
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)
    monkeypatch.setenv("POLY_WATTN_MATH", "interpret")
    got = model.apply(variables, x)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_wattn_math_kernel_grads(monkeypatch):
    """The custom VJP (pure-jnp recompute) matches grads of the XLA path."""
    from polyphonicformer_tpu.models.swin import SwinTransformer

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 14, 14, 3), jnp.float32)
    model = SwinTransformer(16, (2,), (2,))

    def loss(v, a):
        return sum((o ** 2).mean() for o in model.apply(v, a))

    monkeypatch.setenv("POLY_WATTN_MATH", "xla")
    variables = model.init(jax.random.PRNGKey(0), x)
    gref = jax.grad(loss)(variables, x)
    monkeypatch.setenv("POLY_WATTN_MATH", "interpret")
    ggot = jax.grad(loss)(variables, x)
    flat_r, _ = jax.tree_util.tree_flatten(gref)
    flat_g, _ = jax.tree_util.tree_flatten(ggot)
    for a, b in zip(flat_g, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_wattn_pair_matches_unpaired(monkeypatch):
    """Lane-packed paired-window attention (POLY_WATTN_PAIR=1) matches the
    unpaired XLA path through the full backbone: shifted blocks, per-window
    shift masks, pad/crop, and an ODD window count (dummy-window padding)
    all covered."""
    from polyphonicformer_tpu.models.swin import SwinTransformer

    rng = np.random.RandomState(3)
    # 18x25 -> padded 21x28 -> 3x4=12 windows stage0 (even), then 2x2=4;
    # the 11x18 case pads to 14x21 -> 2x3=6, halved grid 7x14 -> 1x2
    for hw in ((18, 25), (11, 18)):
        x = jnp.asarray(rng.randn(1, hw[0], hw[1], 3), jnp.float32)
        model = SwinTransformer(32, (2, 2), (2, 4))
        monkeypatch.setenv("POLY_WATTN_PAIR", "0")
        variables = model.init(jax.random.PRNGKey(0), x)
        ref = model.apply(variables, x)
        monkeypatch.setenv("POLY_WATTN_PAIR", "1")
        got = model.apply(variables, x)
        for a, b in zip(got, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_wattn_pair_odd_window_count(monkeypatch):
    """Odd nw exercises the zero-window pad + slice directly in one block."""
    from polyphonicformer_tpu.models.swin import SwinBlock

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 7, 21, 16), jnp.float32)  # 1x3 = 3 windows
    block = SwinBlock(16, 4, shift=3)
    monkeypatch.setenv("POLY_WATTN_PAIR", "0")
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    monkeypatch.setenv("POLY_WATTN_PAIR", "1")
    got = block.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_wattn_pair_grads(monkeypatch):
    from polyphonicformer_tpu.models.swin import SwinTransformer

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 14, 21, 3), jnp.float32)
    model = SwinTransformer(16, (2,), (2,))

    def loss(v, a):
        return sum((o ** 2).mean() for o in model.apply(v, a))

    monkeypatch.setenv("POLY_WATTN_PAIR", "0")
    variables = model.init(jax.random.PRNGKey(0), x)
    gref = jax.grad(loss)(variables, x)
    monkeypatch.setenv("POLY_WATTN_PAIR", "1")
    ggot = jax.grad(loss)(variables, x)
    flat_r, _ = jax.tree_util.tree_flatten(gref)
    flat_g, _ = jax.tree_util.tree_flatten(ggot)
    for a, b in zip(flat_g, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
