"""Checkpoint/restart + CSV metric logging.

Reproduces the reference's resilience story (SURVEY.md §5.3/§5.4): epoch-
stamped checkpoints, restart-from-latest with step/lr restoration implied by
the restored optimizer state (the reference reconstructs these from filename +
CSV log, `classification_part/training.py:74-103`), and an append-mode CSV
metrics log (`config/resnet/config_file.py:89-104`).  Storage is orbax
(TPU-native, async-capable, pytree-structured) instead of Keras H5.
"""

from __future__ import annotations

import csv
import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper with the reference's restart-from-latest semantics."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None):
        # Must run on EVERY process: orbax StandardSave of multi-host sharded
        # arrays needs all hosts to contribute their addressable shards
        # (orbax coordinates primary-host IO internally).  Process-0 gating
        # applies only to purely local side effects like CSV logging.
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=metrics,
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def close(self):
        self._mgr.close()


class CSVLogger:
    """Append-mode CSV metrics log (role of Keras CSVLogger; doubles as the
    restart metadata source in the reference, `training.py:94-101`)."""

    def __init__(self, path: str):
        self.path = path
        self._fieldnames: list[str] | None = None
        if os.path.exists(path):
            with open(path, newline="") as f:
                reader = csv.reader(f)
                header = next(reader, None)
                self._fieldnames = list(header) if header else None

    def log(self, row: dict):
        row = {k: (float(v) if hasattr(v, "item") else v) for k, v in row.items()}
        new_file = self._fieldnames is None
        if new_file:
            self._fieldnames = list(row)
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            if new_file:
                writer.writeheader()
            writer.writerow(row)

    def rows(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path, newline="") as f:
            return list(csv.DictReader(f))
