"""CLI: roll out and visualize a trained checkpoint.

Equivalent of the reference's play_behaviors tool
(url_benchmark/play_behaviors.py:85-176): load a workspace checkpoint,
infer z for a requested task (or use a provided goal / random z), play
episodes, and save videos + a rewards summary.

    python -m controllable_agent_tpu.play_behaviors folder=/path/to/xp \
        task=walker_walk num_episodes=3
"""

from __future__ import annotations

import json
import sys
import typing as tp

import jax.numpy as jnp
import numpy as np


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    from .goals import get_reward_function
    from .pretrain import build_workspace
    from .train.video import Renderer, VideoRecorder

    argv = list(argv if argv is not None else sys.argv[1:])
    if "--help" in argv or "-h" in argv:
        print(__doc__)
        return
    opts = dict(arg.split("=", 1) for arg in argv)
    folder = opts.pop("folder")
    play_task = opts.pop("play_task", None)
    num_episodes = int(opts.pop("num_episodes", "3"))

    ws = build_workspace([f"folder={folder}"]
                         + [f"{k}={v}" for k, v in opts.items()],
                         offline=True)
    meta_key = getattr(ws.agent, "meta_key", "z")
    if play_task is not None and len(ws.buffer) > 0:
        reward_fn = get_reward_function(play_task, ws.cfg.seed)
        z = ws._infer_meta_from_replay(reward_fn)
    else:
        meta = ws._init_eval_meta()
        z = meta.get(meta_key, jnp.zeros((1,)))

    if ws._eval_fn is None:
        ws._eval_fn = ws._make_eval_fn()
    import jax
    keys = jax.random.split(ws.keys.next(), num_episodes)
    totals, physics, _ = ws._eval_fn(ws.agent_state, {meta_key: z}, keys)

    renderer = Renderer(ws.domain, ws.env)
    recorder = VideoRecorder(ws.work_dir, renderer)
    phys = np.asarray(physics)
    for ep in range(num_episodes):
        recorder.init(phys[ep, 0])
        recorder.record_trajectory(phys[ep, 1:])
        recorder.save(f"play_{ep}.gif")

    summary = {"rewards": [float(x) for x in np.asarray(totals)],
               "task": play_task or ws.cfg.task}
    (ws.work_dir / "play_rewards.json").write_text(json.dumps(summary))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
