"""Checkpoint / resume for env state and policy parameters.

A capability the reference lacks entirely (SURVEY.md section 5: "Checkpoint
/ resume: none for env/physics state"). Because the env state is an explicit
pytree, checkpointing is a direct orbax serialization: training can resume
mid-episode with bit-identical continuation (the PRNG key is part of the
state).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _orbax():
    import orbax.checkpoint as ocp

    return ocp


def save_pytree(path: str | Path, tree: Any) -> None:
    """Save any pytree (EnvState, TrainState, params) to ``path``."""
    ocp = _orbax()
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)


def load_pytree(path: str | Path, target: Optional[Any] = None) -> Any:
    """Load a pytree; pass ``target`` (a template pytree) to restore exact
    structure/dtypes."""
    ocp = _orbax()
    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=jax.tree.map(np.asarray, target))
    return ckptr.restore(path)


# Convenience aliases used by the CLI.
def save_params(path: str | Path, params: Any) -> None:
    save_pytree(path, params)


def load_params(path: str | Path, target: Optional[Any] = None) -> Any:
    return load_pytree(path, target)


class CheckpointManager:
    """Rolling checkpoints with retention (orbax-backed)."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        ocp = _orbax()
        self.directory = Path(directory).absolute()
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, tree: Any) -> None:
        ocp = _orbax()
        self._mgr.save(
            step, args=ocp.args.StandardSave(jax.tree.map(np.asarray, tree))
        )
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, target: Optional[Any] = None):
        ocp = _orbax()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints in {self.directory}")
        if target is not None:
            return self._mgr.restore(
                step,
                args=ocp.args.StandardRestore(jax.tree.map(np.asarray, target)),
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()
