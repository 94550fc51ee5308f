"""Orbax checkpointing: full-state save/restore with retention.

The reference persists only a final torch state dict
(run-nerf.py:420-437) — no optimizer state, no step, no occupancy grid, no
periodic checkpoints, and its --render_only reload path is broken at HEAD
(run-nerf.py:414-417: init_models() missing args, out_dir used before
assignment). This module checkpoints the COMPLETE TrainState pytree (params,
Adam state, occupancy grid, step, RNG key) so training resumes bit-exactly
after preemption (SURVEY.md section 5 'failure detection / elastic
recovery').
"""

from __future__ import annotations

import os
from typing import Any, Optional



class Checkpointer:
    """Thin wrapper over orbax.checkpoint with an eval-time restore helper."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state, step: int, final: bool = False) -> None:
        # Skip when this step is already on disk (orbax raises
        # StepAlreadyExistsError): happens when ckpt_every divides n_iters
        # (the periodic save at the last iteration already wrote it) or when
        # re-running a completed run with --resume.
        if self.latest_step() != step:
            self.manager.save(step, args=self._ocp.args.StandardSave(state))
        if final:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, template) -> Any:
        """Restore the latest checkpoint into the structure of `template`
        (a TrainState built by init_state — shapes/dtypes must match)."""
        step = self.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=self._ocp.args.StandardRestore(template))

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
