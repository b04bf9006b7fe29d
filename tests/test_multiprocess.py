"""REAL multi-process SPMD: two coordinated jax processes (gloo CPU
collectives), 4 virtual devices each, one global 8-device mesh — the
launcher + dist_check path end to end (reference: torchrun + NCCL DDP,
tools/dist_train.sh:5-21).

This is the closest a single machine gets to multi-host: cross-process
collectives, per-process local batches assembled into global arrays
(parallel/mesh.py::global_put), identical replicated loss on every rank.
"""
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # launcher sets cpu per process
    env["PYTHONPATH"] = repo  # strip any TPU-relay site hook
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
    out = subprocess.run(
        [sys.executable, "-m", "polyphonicformer_tpu.tools.launch",
         "--nproc", "2", "--devices-per-proc", "4", "--sim-cpu",
         "--port", "29517", "polyphonicformer_tpu.tools.dist_check"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout + out.stderr
    lines = out.stdout
    assert "psum ok: 8.0" in lines, lines
    losses = [ln.split("total_loss=")[1] for ln in lines.splitlines()
              if "total_loss=" in ln]
    assert len(losses) == 2, lines
    # both ranks must agree on the replicated global loss
    assert losses[0] == losses[1], losses
    # sharded EvalHook stats: each rank evaluated a shard, allgather must
    # produce identical full-split metrics on both
    evals = [ln.split("sharded eval stats ok: ")[1]
             for ln in lines.splitlines() if "sharded eval stats ok" in ln]
    assert len(evals) == 2, lines
    assert evals[0] == evals[1], evals
