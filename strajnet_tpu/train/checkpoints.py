"""Orbax checkpointing incl. optimizer state + step.

Improves on the reference's recovery story (SURVEY.md §5): Keras
``save_weights`` per epoch without optimizer state, resume epoch parsed out
of the checkpoint *filename* (reference train.py:358,370-376). Here the full
TrainState (params + Nadam moments + step) checkpoints atomically; the
filename-metadata convention is kept as display only.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 20):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def _meta_path(self, step: int) -> str:
        return os.path.join(self.directory, f"meta_{step}.json")

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        """Saves the state; ``metrics`` (e.g. val_loss, epoch) also land in a
        JSON sidecar so resume can recover loop bookkeeping the reference
        parses out of the checkpoint *filename* (train.py:370-376)."""
        self._mngr.save(step, args=ocp.args.StandardSave(state),
                        metrics=metrics or {})
        self._mngr.wait_until_finished()
        if metrics and jax.process_index() == 0:
            with open(self._meta_path(step), "w") as f:
                json.dump(metrics, f)

    def metadata(self, step: Optional[int] = None) -> dict:
        """Metrics sidecar saved alongside ``step`` (empty if absent)."""
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return {}
        try:
            with open(self._meta_path(step)) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def restore_params(self, step: Optional[int] = None):
        """Restores only the model parameters (for inference/eval).

        Reads the raw on-disk tree without a state template, so it works
        across optimizer changes (the optimizer state structure is not
        needed to serve the model).
        """
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return None, None
        restored = self._mngr.restore(step)
        params = (restored["params"] if isinstance(restored, dict)
                  else restored.params)
        return params, step

    def restore(self, state_template: Any, step: Optional[int] = None):
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return None, None
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self):
        self._mngr.close()
