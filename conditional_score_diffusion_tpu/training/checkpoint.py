"""Orbax checkpointing of the full train state.

Reference: Lightning `.ckpt` files (`run_lib.py:51-63`,
`lightning_modules/utils.py:24-28`).  Improvements over the reference
(SURVEY.md §5): EMA shadow params, optimizer state, step and the VS-CMDE
schedule inputs are all part of the saved pytree, and saves are async so the
TPU never waits on the filesystem.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_interval: int = 1):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: TrainState, force: bool = False) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
