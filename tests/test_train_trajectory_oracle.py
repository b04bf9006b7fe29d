"""Multi-step TRAINING TRAJECTORY parity against the reference stack.

Three full optimization steps — forward_train -> backward -> global-norm
grad clip -> AdamW with backbone lr_mult 0.25 + weight decay 0.05 ->
mmcv linear lr warmup — run through the actual reference torch model and
through our jitted ``make_train_step``/``make_optimizer`` loop from
converted-identical weights, comparing every per-parameter weight DELTA
after step 3.

This composes the already-oracled pieces (loss dict, per-parameter grads,
AdamW formula, clip, warmup) the way the reference runner composes them
(/root/reference/mmdet/apis/train.py:215 hot loop +
mmcv optimizer hook semantics: clip over requires_grad params,
configs/_base_/schedules/schedule_1x.py AdamW/paramwise/warmup), and
would catch any divergence in clip placement, warmup step indexing,
decay masking, or frozen-param handling that single-step oracles cannot.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

sys.path.insert(0, os.path.dirname(__file__))

from test_train_loss_oracle import (_install, _our_gt, _ref_gt_args,
                                    _train_cfg_dict, make_frame)

LR = 1e-3
WD = 0.05
BB_MULT = 0.25
CLIP = 1.0
WARM_ITERS = 2
WARM_RATIO = 0.5
STEPS = 3


def _mmcv_warm(it: int) -> float:
    # mmcv LrUpdaterHook linear warmup: lr * (1 - (1 - i/n)*(1 - ratio))
    if it >= WARM_ITERS:
        return 1.0
    return 1.0 - (1.0 - it / WARM_ITERS) * (1.0 - WARM_RATIO)


def test_three_step_trajectory_parity():
    import torch

    poly = _install()
    from test_reference_parity import _as_cfg, _reference_model_cfg

    import jax
    import jax.numpy as jnp

    from polyphonicformer_tpu.configs import (ExperimentConfig, ModelConfig,
                                              ScheduleConfig)
    from polyphonicformer_tpu.models import PolyphonicFormer
    from polyphonicformer_tpu.tools.convert_torch_ckpt import \
        convert_state_dict
    from polyphonicformer_tpu.train.step import (TrainState,
                                                 make_train_step)
    from polyphonicformer_tpu.train.optim import make_optimizer

    torch.manual_seed(0)
    rcfg = _as_cfg(_reference_model_cfg())
    model = poly.Polyphonic(
        backbone=rcfg["backbone"], neck=rcfg["neck"],
        rpn_head=rcfg["rpn_head"], roi_head=rcfg["roi_head"],
        train_cfg=_as_cfg(_train_cfg_dict()), test_cfg=rcfg["test_cfg"],
        num_thing_classes=rcfg["num_thing_classes"],
        num_stuff_classes=rcfg["num_stuff_classes"])
    model.train()
    init_sd = {k: v.detach().numpy().copy()
               for k, v in model.state_dict().items()}

    rng = np.random.RandomState(5)
    frame = make_frame(rng, n_things=5, inst_ids=[11, 12, 13, 14, 15],
                       stuff_classes=[8, 9, 11, 13, 16, 18])
    img, metas, bm, labels, _, depth = _ref_gt_args(frame)

    # mmcv DefaultOptimizerConstructor with custom_keys={'backbone':
    # {lr_mult: 0.25}}: per-group lr, shared decay; frozen (requires_grad
    # False) params never reach the optimizer step (grad None)
    bb, rest = [], []
    for name, p in model.named_parameters():
        if not p.requires_grad:
            continue
        (bb if name.startswith("backbone") else rest).append(p)
    opt = torch.optim.AdamW(
        [{"params": bb, "lr": LR * BB_MULT},
         {"params": rest, "lr": LR}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    base_lrs = [g["lr"] for g in opt.param_groups]

    ref_losses_per_step = []
    for it in range(STEPS):
        for g, base in zip(opt.param_groups, base_lrs):
            g["lr"] = base * _mmcv_warm(it)
        opt.zero_grad(set_to_none=True)
        losses = model.forward_train(
            img, metas, gt_labels=[labels], gt_masks=[bm], gt_depth=depth)
        total = sum(v for k, v in losses.items() if "loss" in k)
        total.backward()
        torch.nn.utils.clip_grad_norm_(
            [p for p in model.parameters()
             if p.requires_grad and p.grad is not None], CLIP)
        opt.step()
        ref_losses_per_step.append(float(total))
    final_sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    # ---- ours: same init, same batch, jitted step loop -------------------
    cfg = ModelConfig()  # compute_dtype float32 = reference-exact numerics
    sched = ScheduleConfig(lr=LR, weight_decay=WD, backbone_lr_mult=BB_MULT,
                           grad_clip_norm=CLIP, warmup_iters=WARM_ITERS,
                           warmup_ratio=WARM_RATIO, lr_decay_epochs=())
    our_model = PolyphonicFormer(cfg)
    variables = jax.tree_util.tree_map(jnp.asarray,
                                       convert_state_dict(init_sd, cfg))
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(sched, params, steps_per_epoch=10_000,
                        frozen_stages=1)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       consts=consts, opt_state=tx.init(params))
    step = make_train_step(our_model, cfg, tx, video=False, donate=False)

    from polyphonicformer_tpu.data.structures import TrainBatch

    gt, _ = _our_gt(frame, cfg)
    batch = TrainBatch(image=jnp.asarray(frame["img"])[None], gt=gt)
    for it in range(STEPS):
        state, metrics = step(state, batch)
        np.testing.assert_allclose(
            float(metrics["total_loss"]), ref_losses_per_step[it],
            rtol=3e-3, err_msg=f"step {it} loss diverged")

    # ---- per-parameter weight-delta comparison ---------------------------
    delta_sd = {k: final_sd[k] - init_sd[k] for k in init_sd}
    want_delta = convert_state_dict(delta_sd, cfg)["params"]
    got_delta = jax.tree_util.tree_map(
        lambda new, old: np.asarray(new) - np.asarray(old),
        state.params, variables["params"])

    want = dict(jax.tree_util.tree_leaves_with_path(want_delta))
    got = dict(jax.tree_util.tree_leaves_with_path(got_delta))
    assert set(want) == set(got)
    errs = []
    for path in want:
        w = np.asarray(want[path], np.float64)
        g = np.asarray(got[path], np.float64)
        nw = np.linalg.norm(w)
        if nw < 1e-12:  # frozen on the torch side (stem + layer1)
            assert np.linalg.norm(g) < 1e-10, jax.tree_util.keystr(path)
            continue
        errs.append((np.linalg.norm(g - w) / nw, jax.tree_util.keystr(path)))
    assert len(errs) > 100
    worst = sorted(errs, reverse=True)[:8]
    assert worst[0][0] < 2e-2, (
        "3-step weight-delta divergence, worst leaves:\n"
        + "\n".join(f"  {r:.2e}  {p}" for r, p in worst))
