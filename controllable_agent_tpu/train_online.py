"""CLI: episode-granular online training (rollout N episodes, then M
gradient updates per cycle; reference url_benchmark/train_online.py).

    python -m controllable_agent_tpu.train_online agent=fb_ddpg \
        task=walker_walk num_rollout_episodes=10 num_agent_updates=50
"""

from __future__ import annotations

import sys
import typing as tp

from .train.workspace import TrainOnlineWorkspace


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--help" in argv or "-h" in argv:
        from .pretrain import print_help
        print_help(__doc__)
        return
    # build_workspace handles the folder-resume config restore (a saved
    # config.json is the base, CLI args are overrides) — without it a
    # folder-only resume would rebuild the DEFAULT config and clobber the
    # run's recorded configuration
    from .pretrain import build_workspace
    ws = build_workspace(argv, workspace_cls=TrainOnlineWorkspace)
    ws.train()


if __name__ == "__main__":
    main()
