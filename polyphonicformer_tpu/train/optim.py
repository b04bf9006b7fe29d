"""Optimizer + LR schedule matching the reference recipe.

reference: configs/_base_/schedules/schedule_{1x,2x}.py — AdamW
(lr 1e-4/2e-4, wd 0.05), backbone lr_mult 0.25, global grad-norm clip 1.0,
1k-iter linear warmup (ratio 1e-3), step decay x0.1 at epochs [16, 22];
frozen_stages=1 freezes the stem + layer1 (mmdet resnet.py:613).

Torch AdamW semantics: update = lr_mult * lr(t) * (adam(g) + wd * p);
frozen params are excluded from the global grad-norm clip.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..configs import ScheduleConfig


def is_frozen(path: str, frozen_stages: int = 1) -> bool:
    if not path.startswith("backbone"):
        return False
    parts = path.split("/")
    if len(parts) < 2:
        return False
    mod = parts[1]
    if mod in ("conv1", "bn1"):
        return True
    for s in range(1, frozen_stages + 1):
        if mod.startswith(f"layer{s}_"):
            return True
    return False


def lr_mult(path: str, backbone_lr_mult: float, frozen_stages: int = 1) -> float:
    if is_frozen(path, frozen_stages):
        return 0.0
    if path.startswith("backbone"):
        return backbone_lr_mult
    return 1.0


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def make_lr_schedule(cfg: ScheduleConfig, steps_per_epoch: int) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            step < cfg.warmup_iters,
            1.0 - (1.0 - cfg.warmup_ratio) * (1.0 - step / cfg.warmup_iters),
            1.0)
        decay = jnp.ones(())
        for e in cfg.lr_decay_epochs:
            decay = decay * jnp.where(step >= e * steps_per_epoch,
                                      cfg.lr_decay_factor, 1.0)
        return cfg.lr * warm * decay

    return schedule


def make_optimizer(cfg: ScheduleConfig, params, steps_per_epoch: int = 1,
                   frozen_stages: int = 1) -> optax.GradientTransformation:
    mults = jax.tree_util.tree_map_with_path(
        lambda path, _: lr_mult(_path_str(path), cfg.backbone_lr_mult,
                                frozen_stages), params)
    schedule = make_lr_schedule(cfg, steps_per_epoch)

    def zero_frozen():
        def update_fn(updates, state, params=None):
            updates = jax.tree_util.tree_map(
                lambda g, m: g * (m > 0), updates, mults)
            return updates, state

        return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)

    def scale_by_mult():
        def update_fn(updates, state, params=None):
            updates = jax.tree_util.tree_map(lambda g, m: g * m, updates, mults)
            return updates, state

        return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)

    return optax.chain(
        zero_frozen(),
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(cfg.weight_decay),
        scale_by_mult(),
        optax.scale_by_learning_rate(schedule),
    )
