"""Train-step tests: loss decreases on a fixed synthetic batch; the sharded
step runs on the simulated 8-device CPU mesh."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    ScheduleConfig,
)
from polyphonicformer_tpu.data.loader import synthetic_batch
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.parallel.mesh import make_mesh
from polyphonicformer_tpu.train.optim import is_frozen, lr_mult, make_lr_schedule
from polyphonicformer_tpu.train.step import (
    create_train_state,
    make_sharded_train_step,
    make_train_step,
)

TINY = ModelConfig(out_channels=64, in_channels=64, fpn_out_channels=64,
                   feedforward_channels=128, num_proposals=20, max_things=8)
H, W = 64, 128


def test_lr_schedule_matches_reference_recipe():
    sched = make_lr_schedule(ScheduleConfig(lr=1e-4), steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-4 * 1e-3, rel=1e-4)
    assert float(sched(500)) == pytest.approx(1e-4 * (1 - 0.999 * 0.5), rel=1e-4)
    assert float(sched(1000)) == pytest.approx(1e-4, rel=1e-4)
    assert float(sched(1599)) == pytest.approx(1e-4, rel=1e-4)
    assert float(sched(1600)) == pytest.approx(1e-5, rel=1e-4)
    assert float(sched(2200)) == pytest.approx(1e-6, rel=1e-4)


def test_frozen_and_lr_mult_classification():
    assert is_frozen("backbone/conv1/kernel")
    assert is_frozen("backbone/bn1/scale")
    assert is_frozen("backbone/layer1_0/conv1/kernel")
    assert not is_frozen("backbone/layer2_0/conv1/kernel")
    assert not is_frozen("neck/lateral_0/kernel")
    assert lr_mult("backbone/layer3_1/conv2/kernel", 0.25) == 0.25
    assert lr_mult("rpn_head/init_kernels", 0.25) == 1.0
    assert lr_mult("backbone/layer1_0/conv1/kernel", 0.25) == 0.0


def test_train_step_decreases_loss():
    cfg = ExperimentConfig(model=TINY, schedule=ScheduleConfig(
        lr=5e-4, warmup_iters=1, warmup_ratio=1.0))
    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (2, H, W, 3))
    step = make_train_step(model, cfg.model, tx, donate=False)
    batch = synthetic_batch(cfg.model, 2, hw=(H, W))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    first = None
    prev_params = state.params
    for i in range(8):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(last)
    assert last < first, (first, last)
    # frozen params unchanged
    p0 = prev_params["backbone"]["conv1"]["kernel"]
    p1 = state.params["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    # trainable backbone params changed
    q0 = prev_params["backbone"]["layer2_0"]["conv1"]["kernel"]
    q1 = state.params["backbone"]["layer2_0"]["conv1"]["kernel"]
    assert np.abs(np.asarray(q0) - np.asarray(q1)).max() > 0


def test_sharded_step_on_8_device_mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    cfg = ExperimentConfig(model=TINY)
    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (8, H, W, 3))
    mesh = make_mesh()
    step = make_sharded_train_step(model, cfg.model, tx, mesh)
    batch = synthetic_batch(cfg.model, 8, hw=(H, W))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))


def test_bf16_mixed_precision_training():
    """compute_dtype='bfloat16' runs the fwd/bwd in bf16 with f32 master
    weights (the reference's optional fp16 hook, mmdet/apis/train.py:162);
    loss must stay finite and decrease."""
    import dataclasses

    cfg = ExperimentConfig(
        model=dataclasses.replace(TINY, compute_dtype="bfloat16",
                                  frozen_stages=-1),
        schedule=ScheduleConfig(lr=5e-4, warmup_iters=1, warmup_ratio=1.0))
    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (2, H, W, 3))
    step = make_train_step(model, cfg.model, tx, donate=False)
    batch = synthetic_batch(cfg.model, 2, hw=(H, W))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    first = None
    for _ in range(6):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["total_loss"])
    last = float(metrics["total_loss"])
    assert np.isfinite(last) and last < first, (first, last)
    # master weights stay f32
    assert state.params["backbone"]["conv1"]["kernel"].dtype == jnp.float32


def test_uint8_batch_matches_host_normalized():
    """A uint8 image batch (the loader's divisor-aligned fast path) must
    produce the SAME loss/grads as the host-normalized f32 path — the
    device-side normalize (step.py::normalize_uint8_image) is the exact
    (x - mean)/std the host computed before."""
    from polyphonicformer_tpu.data.pipeline import normalize_image

    cfg = ExperimentConfig(model=TINY)
    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, H, W, 3))
    step = make_train_step(model, cfg.model, tx, donate=False)

    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 256, (1, H, W, 3), np.uint8)
    base = synthetic_batch(cfg.model, 1, hw=(H, W))
    batch_u8 = dataclasses.replace(base, image=jnp.asarray(u8))
    batch_f32 = dataclasses.replace(
        base, image=jnp.asarray(np.stack([
            normalize_image(u8[0], DataConfig().mean, DataConfig().std)])))

    _, m_u8 = step(state, jax.tree_util.tree_map(jnp.asarray, batch_u8))
    _, m_f32 = step(state, jax.tree_util.tree_map(jnp.asarray, batch_f32))
    np.testing.assert_allclose(float(m_u8["total_loss"]),
                               float(m_f32["total_loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m_u8["grad_norm"]),
                               float(m_f32["grad_norm"]), rtol=1e-5)
