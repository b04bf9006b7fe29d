"""Checkpoint converter mapping self-test + orbax save/restore round-trip."""
import numpy as np

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.tools.convert_torch_ckpt import self_test
from polyphonicformer_tpu.train.checkpoint import (
    make_manager,
    restore_state,
    save_state,
)
from polyphonicformer_tpu.train.step import create_train_state


def test_converter_bijective_mapping():
    self_test()


def test_converter_bijective_mapping_swin():
    self_test("swin_tiny")


def test_orbax_roundtrip(tmp_path):
    cfg = ExperimentConfig(model=ModelConfig(
        out_channels=64, in_channels=64, fpn_out_channels=64,
        feedforward_channels=128, num_proposals=10, max_things=4))
    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, 64, 128, 3))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    mgr = make_manager(str(tmp_path), max_keep=2)
    save_state(mgr, 7, jax.device_get(state))
    assert mgr.latest_step() == 7
    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(state))
    restored = restore_state(mgr, template)
    assert int(restored.step) == 7
    a = state.params["rpn_head"]["init_kernels"]
    b = restored.params["rpn_head"]["init_kernels"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
