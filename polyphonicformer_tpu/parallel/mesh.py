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
    tools/train.py:74-78).  No-op on a single host."""
    import os

    if coordinator_address is None and "COORDINATOR_ADDRESS" not in os.environ:
        return
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
    """Device-put a host pytree with the leading axis sharded over 'data'."""
    sh = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)
