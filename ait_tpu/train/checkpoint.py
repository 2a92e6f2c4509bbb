"""Orbax checkpointing with auto-resume.

The reference saves a torch dict per epoch ({session, epoch, model, optimizer,
pooling_mode, class_agnostic}, trainval_net_voc.py:488-500) and loses up to an
epoch on a crash (manual `--r True --checkepoch N` restart, :307-319).  Here:
orbax pytree checkpoints every N steps, `latest_step` auto-resume, and the
model/run metadata saved alongside — preemption-safe on TPU VMs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import orbax.checkpoint as ocp

from ait_tpu.config import Config


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state, *, metadata: Optional[dict] = None,
             force: bool = False):
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **({"metadata": ocp.args.JsonSave(metadata)} if metadata else {}))
        self._mgr.save(step, args=args, force=force)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template)))
        return restored["state"]

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def save_config(directory: str, cfg: Config):
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=list)
