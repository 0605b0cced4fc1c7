"""CLI: offline training from a stored replay buffer (ExORL workflow).

Mirrors url_benchmark/train_offline.py: load episodes — either
``replay_dir=`` (a directory of ExORL-format .npz episodes) or
``load_replay=`` (the replay shard of a pretrain checkpoint, reference
load_replay_buffer, train_offline.py:68-70) — optionally relabel rewards
for the target task from stored physics, then run pure gradient steps.

    python -m controllable_agent_tpu.train_offline agent=fb_ddpg \
        task=point_mass_maze_reach_top_left replay_dir=/path/to/episodes

    python -m controllable_agent_tpu.train_offline agent=fb_ddpg \
        task=walker_walk goal_space=walker_pos_speed_z \
        load_replay=exp_rnd/models/latest relabel=true
"""

from __future__ import annotations

import sys
import typing as tp
from pathlib import Path

from .data.exorl import load_exorl_episodes
from .goals import get_reward_function
from .pretrain import build_workspace


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--help" in argv or "-h" in argv:
        from .pretrain import print_help
        print_help(__doc__)
        return
    replay_dir: tp.Optional[str] = None
    load_replay: tp.Optional[str] = None
    relabel = True
    physics_format = "native"
    rest: tp.List[str] = []
    for arg in argv:
        if arg.startswith("replay_dir="):
            replay_dir = arg.split("=", 1)[1]
        elif arg.startswith("load_replay="):
            load_replay = arg.split("=", 1)[1]
        elif arg.startswith("relabel="):
            relabel = arg.split("=", 1)[1].lower() == "true"
        elif arg.startswith("physics_format="):
            # foreign-physics adapter for real ExORL data (data/exorl.py)
            physics_format = arg.split("=", 1)[1]
        else:
            rest.append(arg)
    ws = build_workspace(rest, offline=True)
    if load_replay is not None:
        # buffer from a pretrain checkpoint (reference train_offline.py:68-70
        # load_replay_buffer): restore the replay shard only, then relabel
        # rewards for the target task from stored physics and (re)compute
        # the goal column for the requested goal space.
        ws.load_checkpoint(Path(load_replay), only=["replay"])
        assert len(ws.buffer) > 0, f"no episodes in {load_replay}"
        if relabel:
            reward_fn = get_reward_function(ws.cfg.task, ws.cfg.seed)
            ws.buffer.relabel(reward_fn.from_physics)
        if ws.goal_fn is not None:
            ws.buffer.set_goals(ws.goal_fn)
    if (ws.cfg.task.startswith("d4rl_") and ws.cfg.d4rl_dataset is not None
            and replay_dir is None and load_replay is None):
        # d4rl dataset -> buffer (reference D4RLReplayBufferBuilder,
        # d4rl_benchmark.py:101-141, wired in pretrain.py:71-76)
        import numpy as np
        from .data.d4rl import load_d4rl_dataset
        with np.load(ws.cfg.d4rl_dataset) as data:
            dataset = {k: data[k] for k in data.files}
        n = load_d4rl_dataset(ws.buffer, dataset)
        print(f"loaded {n} d4rl episodes from {ws.cfg.d4rl_dataset}")
    if replay_dir is not None:
        episodes = load_exorl_episodes(Path(replay_dir),
                                       physics_format=physics_format)
        if physics_format != "native":
            # foreign-engine episodes: the stored observations follow the
            # source engine's sign conventions; recompute them from the
            # adapted physics so the whole buffer matches what the native
            # engine emits on the same states (envs obs_from_physics)
            import numpy as np
            obs_fn = getattr(ws.env, "obs_from_physics", None)
            assert obs_fn is not None, (
                f"physics_format={physics_format} needs "
                f"{type(ws.env).__name__}.obs_from_physics")
            episodes = (
                {**ep, "observation": np.asarray(obs_fn(ep["physics"]))}
                for ep in episodes)
        if relabel:
            reward_fn = get_reward_function(ws.cfg.task, ws.cfg.seed)
            episodes = (
                {**ep, "reward": reward_fn.from_physics(ep["physics"]).reshape(-1, 1)}
                for ep in episodes)
        if ws.goal_fn is not None:
            import numpy as np
            episodes = (
                {**ep, "goal": np.asarray(ws.goal_fn(ep["physics"]))}
                for ep in episodes)
        ws.buffer.load_episodes(episodes)
    ws.train()  # ends with the finalize() battery (final_tests=0 disables)


if __name__ == "__main__":
    main()
