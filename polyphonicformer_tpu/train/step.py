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


# the reference's img_norm_cfg (configs/_base_/datasets/cityscapes_dvps.py),
# = DataConfig.mean/std — the single normalization every config uses
_IMG_MEAN = (123.675, 116.28, 103.53)
_IMG_STD = (58.395, 57.12, 57.375)


def normalize_uint8_image(img: jax.Array) -> jax.Array:
    """(x - mean) / std in f32 on device — exact same values the host path
    (data/pipeline.py::normalize_image) produces, computed where it fuses
    into the first conv instead of costing a full-res host pass + 4x the
    host->device bytes."""
    mean = jnp.asarray(_IMG_MEAN, jnp.float32)
    std = jnp.asarray(_IMG_STD, jnp.float32)
    return (img.astype(jnp.float32) - mean) / std


def build_train_step_fn(model: PolyphonicFormer, cfg: ModelConfig,
                        tx: optax.GradientTransformation,
                        video: bool = False, nan_guard: bool = True):
    """The raw (un-jitted) step(state, batch) -> (state, metrics).

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
        if batch.image.dtype == jnp.uint8:
            # loader shipped raw uint8 crops (data/pipeline.py): normalize
            # on device, where it fuses into the stem for free
            batch = batch.replace(
                image=normalize_uint8_image(batch.image),
                ref_image=None if batch.ref_image is None
                else normalize_uint8_image(batch.ref_image))
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

    return step


def make_train_step(model: PolyphonicFormer, cfg: ModelConfig,
                    tx: optax.GradientTransformation,
                    video: bool = False, donate: bool = True,
                    nan_guard: bool = True):
    """Jitted step(state, batch) -> (state, metrics); see build_train_step_fn."""
    step = build_train_step_fn(model, cfg, tx, video=video, nan_guard=nan_guard)
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


def make_tp_train_setup(model: PolyphonicFormer, cfg: ExperimentConfig,
                        mesh: Mesh, sample_image_shape,
                        video: bool = False, steps_per_epoch: int = 1000,
                        rng=None):
    """Tensor-parallel TRAINING over a (data, model) mesh.

    Backbone params carry flax logical-axis metadata (models/swin.py,
    ``cfg.model.shard_backbone=True``) which maps onto the 'model' mesh axis
    (Megatron layout: qkv/fc1 column-, proj/fc2 row-sharded); everything else
    replicates; the batch shards over 'data'.  AdamW moments mirror the param
    shardings, and the output state shardings are pinned to the input state's
    so a training loop preserves the layout step over step.  The reference's
    only distributed-training mode is data-parallel DDP
    (/root/reference/mmdet/apis/train.py:114-121); TP training is what makes
    the Swin-L backbone fine-tunable in the same sharded layout it serves in.

    Returns (state, jitted_step, tx); place batches with
    ``parallel.mesh.shard_batch_pytree`` before calling the step.
    """
    import flax.linen as nn

    from ..parallel.mesh import logical_param_shardings

    rng = jax.random.PRNGKey(0) if rng is None else rng

    def init_fn():
        return model.init(rng, jnp.zeros(sample_image_shape, jnp.float32),
                          method=PolyphonicFormer.init_all)

    abstract = jax.eval_shape(init_fn)
    var_sh = logical_param_shardings(mesh, abstract)
    variables = nn.meta.unbox(jax.jit(init_fn, out_shardings=var_sh)())
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}
    tx = make_optimizer(cfg.schedule, params, steps_per_epoch,
                        cfg.model.frozen_stages)
    from jax.sharding import NamedSharding

    repl = NamedSharding(mesh, P())
    # EAGER init: zeros_like on a committed sharded param follows its
    # sharding (computation-follows-data), so AdamW mu/nu mirror the param
    # layout; leaves that end up off-mesh (scalar counts) are replicated.
    # (Under jit the zeros are data-independent and GSPMD has nothing to
    # propagate from — they land on one device.)
    opt_state = tx.init(params)

    def _place(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, repl)

    opt_state = jax.tree_util.tree_map(_place, opt_state)
    state = TrainState(step=jax.device_put(jnp.zeros((), jnp.int32), repl),
                       params=params, consts=consts, opt_state=opt_state)
    raw = build_train_step_fn(model, cfg.model, tx, video=video)
    state_sh = jax.tree_util.tree_map(lambda x: x.sharding, state)
    step = jax.jit(raw, out_shardings=(state_sh, None), donate_argnums=(0,))
    return state, step, tx
