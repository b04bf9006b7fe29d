"""The jitted SPMD train step.

One program contains: forward, assignment (on-device Hungarian), targets,
losses, backward, grad clip, AdamW — sharded over the (data,) mesh axis with
params replicated.  XLA inserts the gradient all-reduces the reference got
from NCCL DDP (SURVEY.md §2.4).
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..configs import ExperimentConfig, ModelConfig
from ..data.structures import TrainBatch
from ..models.polyphonic import PolyphonicFormer
from .losses import compute_losses
from .optim import make_optimizer
from .video_losses import video_forward_losses


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Dict
    consts: Dict  # frozen BN statistics and other non-trainable collections
    opt_state: optax.OptState


def create_train_state(model: PolyphonicFormer, cfg: ExperimentConfig,
                       rng: jax.Array, sample_image_shape,
                       steps_per_epoch: int = 1000) -> Tuple[TrainState, optax.GradientTransformation]:
    variables = model.init(rng, jnp.zeros(sample_image_shape, jnp.float32),
                           method=PolyphonicFormer.init_all)
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(cfg.schedule, params, steps_per_epoch,
                        cfg.model.frozen_stages)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       consts=consts, opt_state=tx.init(params))
    return state, tx


def make_train_step(model: PolyphonicFormer, cfg: ModelConfig,
                    tx: optax.GradientTransformation,
                    video: bool = False, donate: bool = True,
                    nan_guard: bool = True):
    """Returns a jitted step(state, batch) -> (state, metrics).

    nan_guard: skip the parameter update when the loss or grad norm is
    non-finite and surface ``skipped_nonfinite`` in the metrics — the
    distributed-correctness guard the reference left unregistered
    (mmdet CheckInvalidLossHook, SURVEY.md §5.2).
    """

    # mixed precision: cfg.compute_dtype='bfloat16' runs the forward/backward
    # matmuls in bf16 while master weights, loss math, and AdamW state stay
    # f32 (the TPU analogue of the reference's optional fp16 hook,
    # mmdet/apis/train.py:162 — bf16's range needs no loss scaling)
    half = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def _cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(half)
            if isinstance(a, jax.Array) and a.dtype == jnp.float32 else a, tree)

    def loss_fn(params, consts, batch: TrainBatch):
        if half is not None:
            params, consts = _cast(params), _cast(consts)
            batch = batch.replace(
                image=batch.image.astype(half),
                ref_image=None if batch.ref_image is None
                else batch.ref_image.astype(half))
        variables = {"params": params, **consts}
        if video:
            return video_forward_losses(model, variables, cfg, batch)
        out = model.apply(variables, batch.image)
        return compute_losses(cfg, out, batch.gt)

    def step(state: TrainState, batch: TrainBatch):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.consts, batch)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = gnorm
        if nan_guard:
            ok = jnp.isfinite(total) & jnp.isfinite(gnorm)
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), params, state.params)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old)
                if isinstance(new, jax.Array) and new.shape == old.shape else new,
                opt_state, state.opt_state)
            metrics["skipped_nonfinite"] = (~ok).astype(jnp.float32)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_train_step(model: PolyphonicFormer, cfg: ModelConfig,
                            tx: optax.GradientTransformation, mesh: Mesh,
                            video: bool = False):
    """Train step with explicit shardings: batch split over 'data', state
    replicated."""
    from ..parallel.mesh import global_put

    step = make_train_step(model, cfg, tx, video=video, donate=False)

    def put(x):
        if x is None:
            return None
        spec = P(*(("data",) + (None,) * (np.ndim(x) - 1)))
        return global_put(mesh, x, spec)

    def sharded_step(state: TrainState, batch: TrainBatch):
        batch = jax.tree_util.tree_map(put, batch)
        state = jax.tree_util.tree_map(
            lambda x: global_put(mesh, x, P()), state)
        return step(state, batch)

    return sharded_step
