"""Orbax checkpointing with the reference's top-F1 retention policy.

The reference saves a dict of model/optimizers/schedulers/epoch/scaler
rank-0-only when ``F1 > top_F1_tresh or epoch % 10 == 0``, encoding the
metric in the filename (``/root/reference/train_SROIE.py:374-416``), and
resumes all of it (``:277-298``). Here the train state pytree (params, BN
stats, dual-optimizer state, step) plus metadata goes through Orbax; schedule
arrays need no saving (they are pure functions of the step).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from vibertgrid_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, top_f1_thresh: float = 0.0) -> None:
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.top_f1_thresh = top_f1_thresh
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.directory, tag)

    def maybe_save(
        self, state: TrainState, epoch: int, f1: float, extra: dict | None = None
    ) -> str | None:
        """Reference policy: save on new-best F1 or every 10 epochs."""
        if not (f1 > self.top_f1_thresh or epoch % 10 == 0):
            return None
        if f1 > self.top_f1_thresh:
            self.top_f1_thresh = f1
        tag = f"epoch{epoch}_F1_{f1:.4f}"
        path = self._path(tag)
        self._ckpt.save(
            path, {"state": state, "meta": {"epoch": epoch, "f1": f1, **(extra or {})}},
            force=True,
        )
        self._ckpt.wait_until_finished()
        return path

    def save(self, state: TrainState, tag: str = "latest", **meta) -> str:
        path = self._path(tag)
        # always include the restore-template keys (restore() uses a fixed
        # meta template; a bare save() must produce a loadable checkpoint)
        full_meta = {"epoch": 0, "f1": 0.0, **meta}
        self._ckpt.save(path, {"state": state, "meta": full_meta}, force=True)
        self._ckpt.wait_until_finished()
        return path

    def restore(self, tag_or_path: str, template: Any) -> tuple[TrainState, dict]:
        path = (
            tag_or_path
            if os.path.isabs(tag_or_path)
            else self._path(tag_or_path)
        )
        restored = self._ckpt.restore(
            path, {"state": template, "meta": {"epoch": 0, "f1": 0.0}}
        )
        return restored["state"], restored["meta"]

    def latest_best(self) -> str | None:
        entries = [e for e in os.listdir(self.directory) if e.startswith("epoch")]
        if not entries:
            return None
        return max(entries, key=lambda e: float(e.rsplit("_", 1)[-1]))
