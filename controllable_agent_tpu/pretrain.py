"""CLI: online reward-free pretraining.

Usage (mirrors the reference CLI, README.md:43-56 / url_benchmark/pretrain.py:662):

    python -m controllable_agent_tpu.pretrain agent=fb_ddpg \
        task=point_mass_maze_reach_top_left goal_space=simplified_point_mass_maze \
        num_train_frames=100000 agent.z_dim=50

``agent=NAME`` selects the agent group; ``agent.*`` keys override the agent
config; all other keys override the workspace config.
"""

from __future__ import annotations

import sys
import typing as tp
from pathlib import Path

from .config import apply_overrides
from .train.workspace import OnlineWorkspace, OfflineWorkspace, WorkspaceConfig


def split_overrides(argv: tp.Sequence[str]
                    ) -> tp.Tuple[str, tp.List[str], tp.List[str]]:
    agent_name = "fb_ddpg"
    ws_overrides: tp.List[str] = []
    agent_overrides: tp.List[str] = []
    for arg in argv:
        if arg.startswith("agent="):
            agent_name = arg.split("=", 1)[1]
        elif arg.startswith("agent."):
            agent_overrides.append(arg[len("agent."):])
        else:
            ws_overrides.append(arg)
    return agent_name, ws_overrides, agent_overrides


def print_help(doc: tp.Optional[str]) -> None:
    """`--help`: usage + every workspace/agent config field with defaults
    (the reference's `--cfg job` introspection niche, README.md:43-49)."""
    import dataclasses
    from .agents.registry import AGENTS
    print(doc or "")
    print("workspace config (key=value):")
    for f in dataclasses.fields(WorkspaceConfig):
        print(f"  {f.name}={f.default!r}")
    print("\nagents (agent=NAME; fields via agent.KEY=value):")
    for name, (cfg_cls, _) in sorted(AGENTS.items()):
        fields = ", ".join(f.name for f in dataclasses.fields(cfg_cls)
                           if f.name != "name")
        print(f"  {name}: {fields}")


def build_workspace(argv: tp.Sequence[str], offline: bool = False,
                    workspace_cls: tp.Optional[type] = None):
    agent_name, ws_overrides, agent_overrides = split_overrides(argv)
    # Resuming a folder that already has a config.json: the SAVED config
    # is the base and CLI args are overrides. Without this, a partial
    # command line (e.g. `demo.serve folder=...`) would rebuild the
    # default workspace — and, since construction re-saves config.json,
    # silently clobber the training run's recorded configuration.
    base = WorkspaceConfig(agent_name=agent_name)
    folder = next((o.split("=", 1)[1] for o in ws_overrides
                   if o.startswith("folder=")), None)
    cfg_path = Path(folder) / "config.json" if folder else None
    agent_cfg_base: tp.Optional[tp.Dict[str, tp.Any]] = None
    if cfg_path is not None and cfg_path.exists():
        import dataclasses as _dc
        import json as _json
        saved = _json.loads(cfg_path.read_text())
        valid = {f.name for f in _dc.fields(WorkspaceConfig)}
        fixed = {k: tuple(v) if isinstance(v, list) else v
                 for k, v in saved.items() if k in valid}
        if any(a.startswith("agent=") for a in argv):
            fixed.pop("agent_name", None)  # CLI agent choice wins
        base = _dc.replace(base, **fixed)
        # the saved run's resolved agent.* keys are the agent-config base
        # (checkpoints only restore into identically-shaped networks) —
        # unless the CLI switches to a different agent class
        if base.agent_name == saved.get("agent_name", base.agent_name):
            agent_cfg_base = {k[len("agent."):]: v for k, v in saved.items()
                              if k.startswith("agent.")} or None
    cfg = apply_overrides(base, ws_overrides)
    cls = workspace_cls or (OfflineWorkspace if offline else OnlineWorkspace)
    return cls(cfg, agent_cfg_overrides=agent_overrides,
               agent_cfg_base=agent_cfg_base)


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    args = list(argv if argv is not None else sys.argv[1:])
    if "--help" in args or "-h" in args:
        print_help(__doc__)
        return
    ws = build_workspace(args)
    ws.train()


if __name__ == "__main__":
    main()
