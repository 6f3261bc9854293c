"""Checkpointing: full train state via Orbax, plus the reference's artifact
contract.

The reference saves (``neural_decoder_trainer.py:62-68,352-368``):
  * ``<outputDir>/args`` — pickled config, written at start;
  * ``<outputDir>/modelWeights`` — model weights, overwritten on new-best CER;
  * ``<outputDir>/trainingStats`` — pickled {testLoss, testCER} history.

We keep that contract (same filenames for ``args`` / ``trainingStats``) and
upgrade weight storage to Orbax with *full* train state (params + optimizer
state + step + RNG counters) so runs can resume exactly — the reference has
no resume path at all (SURVEY.md §5). Best-on-CER selection is preserved;
the reference's never-saves-the-first-eval edge (``:354`` checks
``len(testCER) > 0`` before the current CER is appended) is fixed by
default and reproducible via ``compat_skip_first_eval_save``.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_args(output_dir: str, args: dict) -> None:
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "args"), "wb") as f:
        pickle.dump(dict(args), f)


def load_args(output_dir: str) -> dict:
    with open(os.path.join(output_dir, "args"), "rb") as f:
        return pickle.load(f)


def save_training_stats(output_dir: str, test_loss, test_cer) -> None:
    stats = {
        "testLoss": np.asarray(test_loss),
        "testCER": np.asarray(test_cer),
    }
    with open(os.path.join(output_dir, "trainingStats"), "wb") as f:
        pickle.dump(stats, f)


class CheckpointManager:
    """Thin Orbax wrapper: one 'best' slot + optional periodic 'last' slot."""

    def __init__(self, output_dir: str):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, state: Any) -> None:
        state = jax.device_get(state)
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, name: str, template: Any) -> Any:
        return self._ckptr.restore(self._path(name), target=template)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def save_sidecar(self, payload: dict) -> None:
        """Host-side resume metadata (sampler RNG state, metric history)."""
        with open(os.path.join(self.output_dir, "trainerState"), "wb") as f:
            pickle.dump(payload, f)

    def load_sidecar(self) -> dict:
        with open(os.path.join(self.output_dir, "trainerState"), "rb") as f:
            return pickle.load(f)
