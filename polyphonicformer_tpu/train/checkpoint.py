"""Orbax checkpointing with the reference's keep-last-2 / resume semantics.

reference: mmcv CheckpointHook (interval 1 epoch, max_keep_ckpts=2,
configs/_base_/default_runtime.py:1) and --auto-resume latest-checkpoint scan
(mmdet/apis/train.py:206-214).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def make_manager(work_dir: str, max_keep: int = 2) -> ocp.CheckpointManager:
    path = os.path.abspath(os.path.join(work_dir, "checkpoints"))
    os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_keep,
                                           create=True, enable_async_checkpointing=False)
    return ocp.CheckpointManager(path, options=options)


def save_state(mgr: ocp.CheckpointManager, step: int, state: Any) -> None:
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def latest_step(mgr: ocp.CheckpointManager) -> Optional[int]:
    return mgr.latest_step()


def restore_state(mgr: ocp.CheckpointManager, state_template: Any,
                  step: Optional[int] = None) -> Any:
    step = step if step is not None else mgr.latest_step()
    assert step is not None, "no checkpoint found"
    return mgr.restore(step, args=ocp.args.StandardRestore(state_template))
