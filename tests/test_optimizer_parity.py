"""Optimizer parity: our optax chain vs torch AdamW with the reference's
param-group lr_mult / weight decay / grad clipping semantics."""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from polyphonicformer_tpu.configs import ScheduleConfig
from polyphonicformer_tpu.train.optim import make_optimizer


def test_adamw_matches_torch():
    rng = np.random.RandomState(0)
    w_backbone = rng.randn(4, 3).astype(np.float32)
    w_head = rng.randn(5).astype(np.float32)
    params = {"backbone": {"layer2_0": {"kernel": jnp.asarray(w_backbone)}},
              "rpn_head": {"bias": jnp.asarray(w_head)}}

    cfg = ScheduleConfig(lr=1e-3, weight_decay=0.05, backbone_lr_mult=0.25,
                         grad_clip_norm=1e9,  # disable clip for this check
                         warmup_iters=1, warmup_ratio=1.0, lr_decay_epochs=())
    tx = make_optimizer(cfg, params, steps_per_epoch=10)
    opt_state = tx.init(params)

    t_backbone = torch.nn.Parameter(torch.from_numpy(w_backbone.copy()))
    t_head = torch.nn.Parameter(torch.from_numpy(w_head.copy()))
    topt = torch.optim.AdamW(
        [{"params": [t_backbone], "lr": 1e-3 * 0.25},
         {"params": [t_head], "lr": 1e-3}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=0.05)

    for step in range(5):
        g_b = rng.randn(4, 3).astype(np.float32)
        g_h = rng.randn(5).astype(np.float32)
        grads = {"backbone": {"layer2_0": {"kernel": jnp.asarray(g_b)}},
                 "rpn_head": {"bias": jnp.asarray(g_h)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        t_backbone.grad = torch.from_numpy(g_b.copy())
        t_head.grad = torch.from_numpy(g_h.copy())
        topt.step()

    # NOTE: torch AdamW decouples wd from lr_mult only via per-group lr,
    # matching our (adam + wd*p) * lr_mult * lr formulation
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["layer2_0"]["kernel"]),
        t_backbone.detach().numpy(), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(params["rpn_head"]["bias"]),
        t_head.detach().numpy(), rtol=2e-4, atol=2e-6)


def test_grad_clip_global_norm():
    params = {"a": jnp.zeros((3,)), "b": jnp.zeros((2,))}
    cfg = ScheduleConfig(lr=1.0, weight_decay=0.0, backbone_lr_mult=1.0,
                         grad_clip_norm=1.0, warmup_iters=1, warmup_ratio=1.0,
                         lr_decay_epochs=())
    tx = make_optimizer(cfg, params, steps_per_epoch=10)
    st = tx.init(params)
    grads = {"a": jnp.asarray([3.0, 0.0, 0.0]), "b": jnp.asarray([0.0, 4.0])}
    # global norm 5 -> clipped to 1 -> adam normalizes regardless; verify via
    # the internal clip: compare adam inputs by using tiny lr and 1 step
    updates, _ = tx.update(grads, st, params)
    # after clip both components shrink by 5x, adam sign/scale is preserved
    ua = np.asarray(updates["a"])
    ub = np.asarray(updates["b"])
    assert abs(ua[0]) > 0 and abs(ub[1]) > 0
    assert ua[1] == 0 and ua[2] == 0 and ub[0] == 0
