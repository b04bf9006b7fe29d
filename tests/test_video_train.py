"""Video (2-frame + tracking) training-path tests."""
import numpy as np

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import ExperimentConfig, ModelConfig
from polyphonicformer_tpu.data.loader import synthetic_batch
from polyphonicformer_tpu.models import PolyphonicFormer
from polyphonicformer_tpu.train.step import create_train_state, make_train_step

TINY = ModelConfig(out_channels=64, in_channels=64, fpn_out_channels=64,
                   feedforward_channels=128, num_proposals=20, max_things=8,
                   with_track=True)
H, W = 64, 128


def test_video_train_step():
    cfg = ExperimentConfig(model=TINY)
    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (2, H, W, 3))
    step = make_train_step(model, cfg.model, tx, video=True, donate=False)
    batch = synthetic_batch(cfg.model, 2, hw=(H, W), two_frame=True)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"])), metrics
    assert "loss_track" in metrics and "loss_track_aux" in metrics
    assert np.isfinite(float(metrics["loss_track"]))
    assert np.isfinite(float(metrics["loss_track_aux"]))
    # track head received gradients (params changed after one step)
    state2, _ = step(state, batch)
    p0 = state.params["track_head"]["embed_mlp"]["fc_embed"]["kernel"]
    p1 = state2.params["track_head"]["embed_mlp"]["fc_embed"]["kernel"]
    assert np.abs(np.asarray(p0) - np.asarray(p1)).max() > 0
