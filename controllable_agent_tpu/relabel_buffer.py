"""CLI: relabel a stored replay buffer's rewards for a named task.

Equivalent of the reference's relabel_buffer one-off script
(url_benchmark/relabel_buffer.py:1-20): load a replay checkpoint, relabel
rewards from the stored physics with the named task's reward function, and
save it back. Relabeling here is one batched device pass instead of the
reference's per-row MuJoCo replay.

    python -m controllable_agent_tpu.relabel_buffer \
        checkpoint=/path/to/models/latest task=walker_run out=/path/out
"""

from __future__ import annotations

import sys
import typing as tp
from pathlib import Path


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    from .data.replay import ReplayBuffer
    from .goals import get_reward_function
    from .train import checkpoint as ckpt_lib

    argv = list(argv if argv is not None else sys.argv[1:])
    if "--help" in argv or "-h" in argv:
        print(__doc__)
        return
    opts = dict(arg.split("=", 1) for arg in argv)
    path = Path(opts["checkpoint"])
    task = opts["task"]
    out = Path(opts.get("out", str(path) + "_relabeled"))

    restored = ckpt_lib.load_checkpoint(path, only=["replay"])
    replay_state = restored["replay"]
    buf = ReplayBuffer(max_episodes=replay_state.max_episodes,
                       discount=0.99, future=0.99)
    buf.state = replay_state
    reward_fn = get_reward_function(task)
    buf.relabel(reward_fn.from_physics)
    ckpt_lib.save_checkpoint(out, {
        "replay": buf.state,
        "global_step": restored["global_step"],
        "global_episode": restored["global_episode"],
    })
    print(f"relabeled buffer for {task} -> {out}")


if __name__ == "__main__":
    main()
