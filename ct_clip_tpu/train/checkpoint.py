"""Orbax checkpointing for TrainState (+ bare model variables).

Replaces torch.save of {model, optim} state dicts
(scripts/CTCLIPTrainer.py:205-213, 331-337) with sharded Orbax checkpoints;
save/restore round-trips the full TrainState (params, VQ codebook EMA state,
optimizer state, step).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 async_save: bool = True):
        """async_save=True (default) overlaps the disk write with training:
        Orbax copies device arrays to host synchronously inside save() (so
        donated step buffers are safe to reuse immediately) and serializes
        to disk in a background thread.  The ~seconds-long write of the
        full TrainState no longer stalls the step loop; restore()/wait()
        join any in-flight write first."""
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.async_save = async_save
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: Any) -> None:
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        if not self.async_save:
            self.mgr.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save has fully committed."""
        self.mgr.wait_until_finished()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        self.mgr.wait_until_finished()
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self.mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    @property
    def latest_step(self) -> Optional[int]:
        self.mgr.wait_until_finished()
        return self.mgr.latest_step()


def save_variables(path: str, variables: Any) -> None:
    """One-shot save of bare model variables (CTCLIP.load equivalent,
    ct_clip.py:593-597)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(Path(path).absolute(), variables)
    ckptr.wait_until_finished()


def load_variables(path: str, variables_like: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if variables_like is None:
        return ckptr.restore(Path(path).absolute())
    return ckptr.restore(Path(path).absolute(), variables_like)
