"""Device mesh + sharding rules.

The reference scales with NCCL DDP (one process per GPU,
tools/dist_train.sh); here a single SPMD program runs over a
``jax.sharding.Mesh`` with axes (data, model).  Data parallelism = shard the
batch on 'data'; the 'model' axis is reserved for tensor-sharding large
backbones (Swin-L).  XLA's SPMD partitioner inserts the gradient psums the
reference got from DDP bucket all-reduce (SURVEY.md §2.4).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import ParallelConfig


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization (replaces the reference's
    ``mmcv.runner.init_dist`` torchrun/slurm/mpi launchers,
    tools/train.py:74-78).  No-op outside a launched job.

    Arguments fall back to the env the launcher (tools/launch.py) exports:
    ``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` / ``PROCESS_ID``.  On a TPU
    pod slice these are unnecessary — ``jax.distributed.initialize()``
    autodetects from the TPU metadata; trigger that path by setting
    ``COORDINATOR_ADDRESS=auto``."""
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return
    if coordinator_address == "auto":  # TPU pod: autodetect everything
        jax.distributed.initialize()
        return
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_mesh(cfg: Optional[ParallelConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    cfg = cfg or ParallelConfig()
    devices = list(devices if devices is not None else jax.devices())
    num_model = max(cfg.num_model, 1)
    num_data = cfg.num_data if cfg.num_data > 0 else len(devices) // num_model
    arr = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def global_put(mesh: Mesh, x, spec: P):
    """Place host data onto the mesh with the given spec, multi-process
    safe.  Single process: plain ``device_put``.  Multi-process: the host
    array is this process's LOCAL shard (per-process batch; or the full
    value when replicated) and the global array is assembled across
    processes — the jax analogue of DDP's per-rank batches."""
    sh = NamedSharding(mesh, spec)
    if isinstance(x, jax.Array) and getattr(x, "sharding", None) == sh:
        return x  # already global (e.g. state threaded through jit)
    if jax.process_count() == 1:
        return jax.device_put(x, sh)
    return jax.make_array_from_process_local_data(sh, np.asarray(x))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def logical_param_shardings(mesh: Mesh, abstract_variables, rules=None):
    """Logical-axis metadata (``nn.with_logical_partitioning`` on the Swin
    Dense kernels, models/swin.py) -> concrete ``NamedSharding`` tree.

    ``abstract_variables`` is a (possibly ``jax.eval_shape``-abstract) boxed
    variable tree from ``model.init``; leaves without metadata replicate.
    """
    import flax.linen as nn

    if rules is None:
        from ..models.swin import SWIN_LOGICAL_RULES

        rules = SWIN_LOGICAL_RULES
    specs = nn.get_partition_spec(abstract_variables)
    return nn.logical_to_mesh_sharding(specs, mesh, rules)


def shard_batch_pytree(mesh: Mesh, batch):
    """Place a host pytree on the mesh, leading axis sharded over 'data'
    (multi-process safe: each process contributes its local batch)."""

    def put(x):
        if x is None:
            return None
        return global_put(mesh, x, P(*(("data",) + (None,) * (np.ndim(x) - 1))))

    return jax.tree_util.tree_map(put, batch)
