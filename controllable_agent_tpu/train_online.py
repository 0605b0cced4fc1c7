"""CLI: episode-granular online training (rollout N episodes, then M
gradient updates per cycle; reference url_benchmark/train_online.py).

    python -m controllable_agent_tpu.train_online agent=fb_ddpg \
        task=walker_walk num_rollout_episodes=10 num_agent_updates=50
"""

from __future__ import annotations

import sys
import typing as tp

from .config import apply_overrides
from .pretrain import split_overrides
from .train.workspace import TrainOnlineWorkspace, WorkspaceConfig


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--help" in argv or "-h" in argv:
        from .pretrain import print_help
        print_help(__doc__)
        return
    agent_name, ws_overrides, agent_overrides = split_overrides(argv)
    cfg = apply_overrides(WorkspaceConfig(agent_name=agent_name), ws_overrides)
    ws = TrainOnlineWorkspace(cfg, agent_cfg_overrides=agent_overrides)
    ws.train()


if __name__ == "__main__":
    main()
