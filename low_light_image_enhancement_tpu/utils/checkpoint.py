"""Orbax checkpointing (SURVEY.md §5): params + optimizer state + step for
the config-3 training loop, with rotation and resume."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax's CheckpointManager for pytree states.

    Layout: ``<root>/<step>/...`` managed by orbax; ``restore_latest``
    resumes from the newest step.
    """

    def __init__(self, root: str, max_to_keep: int = 3):
        self.root = Path(root).absolute()
        self.root.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.root,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: Any, step: int, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: int, template: Any) -> Any:
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_latest(self, template: Any) -> Optional[Any]:
        step = self.latest_step()
        if step is None:
            return None
        return self.restore(step, template)

    def wait(self) -> None:
        """Block until all in-flight async saves are committed."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
