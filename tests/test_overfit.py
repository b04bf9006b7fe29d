"""Slow integration: training actually LEARNS.

Overfits the tiny video model on a fixed batch from the synthetic on-disk
dataset, asserting a large loss drop, then runs the image eval path with the
trained weights and checks the panoptic quality is real (the r1 gap: every
train-step test only checked finiteness, never convergence)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_dataset_and_cli import dataset_root, write_synthetic_dataset  # noqa: F401


@pytest.mark.slow
def test_overfit_and_eval(dataset_root):  # noqa: F811
    from polyphonicformer_tpu.configs import get_preset
    from polyphonicformer_tpu.data.cityscapes_dvps import CityscapesDVPSDataset
    from polyphonicformer_tpu.data.loader import TrainLoader
    from polyphonicformer_tpu.evalutils.runner import evaluate_frames
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.train.step import (create_train_state,
                                                 make_train_step)

    cfg = get_preset("debug_tiny_video")
    ds = CityscapesDVPSDataset(dataset_root, split="train",
                               ref_sample_mode="random",
                               ref_seq_index=cfg.data.ref_seq_index)
    loader = TrainLoader(ds, cfg.data, cfg.model, num_workers=1, seed=3)
    batch = next(iter(loader))
    loader.stop()
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, 128, 256, 3))
    step = make_train_step(model, cfg.model, tx, video=True, donate=False)

    losses = []
    n_steps = 120
    for i in range(n_steps):
        state, metrics = step(state, batch)
        if i % 20 == 0 or i == n_steps - 1:
            losses.append(float(metrics["total_loss"]))
    first, last = losses[0], losses[-1]
    assert np.isfinite(last)
    assert last < 0.5 * first, (
        f"no convergence: loss {first:.3f} -> {last:.3f} over {n_steps} steps "
        f"(trace {['%.2f' % l for l in losses]})")

    # eval the overfit weights on the training frames: panoptic quality must
    # be far above random (it has memorized the scene)
    variables = {"params": state.params, **state.consts}
    metrics = evaluate_frames(cfg.model, cfg.data, variables, ds,
                              ds.images[:2])
    pq = metrics["pq@inf"]
    assert np.isfinite(pq) and pq > 0.05, f"overfit PQ implausibly low: {pq}"
    print(f"overfit: loss {first:.2f}->{last:.2f}, PQ@inf {pq:.3f}")
