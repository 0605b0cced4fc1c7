"""Experiment entry-point wrapper.

Equivalent of the reference's HydraEntryPoint/CopiedBenchmark
(controllable_agent/runner.py:40-186): compose a config with programmatic
overrides without going through the CLI, build the Workspace, create the
experiment folder (saving config.json), run training, and return
**−mean(last 12 eval rewards)** for minimization by a sweeper
(reference :163-166). ``CopiedBenchmark`` snapshots the package source into
the experiment folder so results stay tied to the exact code version
(reference :172-186).
"""

from __future__ import annotations

import datetime
import shutil
import traceback
import typing as tp
import uuid
from pathlib import Path

import numpy as np


class EntryPoint:
    """Callable experiment: EntryPoint(mode)(folder=..., **overrides)."""

    def __init__(self, mode: str = "online") -> None:
        assert mode in ("online", "offline")
        self.mode = mode

    def config(self, **overrides: tp.Any):
        from ..pretrain import split_overrides
        from ..config import apply_overrides
        from ..train.workspace import WorkspaceConfig
        args = [f"{k}={v}" for k, v in overrides.items()]
        agent_name, ws_overrides, _ = split_overrides(args)
        return apply_overrides(WorkspaceConfig(agent_name=agent_name),
                               ws_overrides)

    def workspace(self, **overrides: tp.Any):
        from ..pretrain import build_workspace
        args = [f"{k}={v}" for k, v in overrides.items()]
        return build_workspace(args, offline=(self.mode == "offline"))

    def main(self, **overrides: tp.Any) -> float:
        return self(**overrides)

    def __call__(self, folder: tp.Optional[str] = None,
                 **overrides: tp.Any) -> float:
        """Create the xp folder, train, return −mean(last 12 eval rewards)
        (reference runner.py:127-166). Exceptions are tolerated when some
        eval history exists (reference :157-162)."""
        if folder is None:
            name = (datetime.date.today().isoformat() + "_"
                    + uuid.uuid4().hex[:8])
            folder = str(Path("exp_local") / name)
        overrides["folder"] = folder
        ws = self.workspace(**overrides)
        try:
            ws.train()
        except Exception:  # noqa: BLE001 — run-level tolerance
            if not ws.eval_rewards_history:
                raise
            traceback.print_exc()
        history = ws.eval_rewards_history[-12:]
        if not history:
            return float("inf")
        return -float(np.mean(history))


class CopiedBenchmark(EntryPoint):
    """Snapshot the package source into the xp folder and run from there
    (reference CopiedBenchmark, runner.py:172-186)."""

    def __init__(self, folder: tp.Union[str, Path],
                 mode: str = "online") -> None:
        super().__init__(mode)
        self.folder = Path(folder)
        package_dir = Path(__file__).resolve().parents[1]
        self.code_dir = self.folder / "code" / package_dir.name
        if not self.code_dir.exists():
            self.code_dir.parent.mkdir(parents=True, exist_ok=True)
            shutil.copytree(package_dir, self.code_dir,
                            ignore=shutil.ignore_patterns("__pycache__"))

    def __call__(self, **overrides: tp.Any) -> float:
        overrides.setdefault("folder", str(self.folder / "run"))
        return super().__call__(**overrides)


def on_exception_enter_postmortem(f: tp.Callable) -> tp.Callable:
    """Decorator: drop into pdb post-mortem on any exception (reference
    on_exception_enter_postmortem, controllable_agent/runner.py:189-205).
    Handy when iterating on a workspace interactively."""
    import functools

    @functools.wraps(f)
    def wrapper(*args: tp.Any, **kwargs: tp.Any) -> tp.Any:
        try:
            return f(*args, **kwargs)
        except Exception:
            import pdb
            import sys
            import traceback
            traceback.print_exc()
            pdb.post_mortem(sys.exc_info()[2])
            raise

    return wrapper
