"""Distributed-setup smoke check: init, global mesh, cross-process
collective, and one REAL sharded train step of the tiny model.

Run under the launcher (see tools/launch.py) on a pod or in local
simulation; every process must print the same finite global loss.  Plays
the role of the sanity run one would do with the reference's
dist_train.sh before a long job.
"""
from __future__ import annotations

import sys


def main() -> None:
    from ..parallel.mesh import init_distributed

    init_distributed()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..configs import get_preset
    from ..data.loader import synthetic_batch
    from ..models import PolyphonicFormer
    from ..parallel.mesh import make_mesh
    from ..train.step import create_train_state, make_sharded_train_step

    nproc = jax.process_count()
    pid = jax.process_index()
    ndev = len(jax.devices())
    print(f"[proc {pid}/{nproc}] global devices: {ndev}", flush=True)

    # cross-process collective first: cheap, isolates wiring failures
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    ones = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")),
        np.full((ndev // max(nproc, 1),), 1.0, np.float32)) \
        if nproc > 1 else jnp.ones((ndev,))
    total = float(jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(ones))
    assert total == ndev, (total, ndev)
    print(f"[proc {pid}] psum ok: {total}", flush=True)

    cfg = get_preset("debug_tiny")
    model = PolyphonicFormer(cfg.model)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   (1, 128, 256, 3))
    step = make_sharded_train_step(model, cfg.model, tx, mesh, video=False)
    # per-process local batch (one sample per local device), distinct data
    local_bs = jax.local_device_count()
    batch = synthetic_batch(cfg.model, local_bs, hw=(128, 256), seed=pid)
    state, metrics = step(state, batch)
    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), metrics
    print(f"[proc {pid}] sharded train step ok: total_loss={loss:.4f}",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
