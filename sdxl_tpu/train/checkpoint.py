"""Training checkpoint/resume (orbax).

Capability extension — the reference has MODEL checkpoints only, no job
resume (SURVEY.md §5 "Checkpoint / resume"). Fine-tune state is small
(LoRA factors + Adam moments + EMA + step), so a plain orbax
CheckpointManager over the TrainState pytree is enough: atomic writes,
`keep` rotation, and resume-from-latest. Restoring against an abstract
reference state keeps dtypes/shardings exact (the restored factors land
sharded if the reference was created under a Mesh).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .step import TrainState


def _manager(ckpt_dir: str, keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=False
        ),
    )


def save_train_state(ckpt_dir: str, state: TrainState, keep: int = 3) -> int:
    """Write ``state`` under ``ckpt_dir/<step>`` (atomic, rotated)."""
    step = int(state.step)
    with _manager(ckpt_dir, keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return step


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_train_state(
    ckpt_dir: str, like: TrainState, step: Optional[int] = None
) -> TrainState:
    """Restore the checkpoint at ``step`` (default: latest) shaped/typed
    like the freshly initialized ``like`` state — resume is then
    ``state = restore_train_state(dir, TrainState.create(...))``."""
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
    with _manager(ckpt_dir) as mgr:
        if step is None:
            step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"{ckpt_dir}: no training checkpoint found"
                )
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
