"""Locomotion-content report for a NATIVE-engine replay checkpoint.

The cross-engine buffer gate (`tools/buffer_stats.py`) reads ExORL-format
MuJoCo episode dirs; this is its counterpart for the on-device replay of a
native training run — the tool that quantified the quadruped standing
floor (results/quad_one_walk: 1.5% of frames above walk's 0.5 m/s target
regardless of train task) and its directed-rollout fix.

Reads `models/latest/replay.msgpack` from a run folder and reports, from
the stored goal-feature column (goal_space features, e.g. quad_pos_speed's
body-frame velocity — envs/quadruped.py:quad_features_single):

  * quantiles of the chosen feature component (default: body-forward
    speed, index 5 of quad_pos_speed),
  * fraction of frames above given thresholds (defaults: quadruped walk /
    run target speeds, reference custom_dmc_tasks/quadruped.py:400-411),
  * optional per-task relabeled frame rewards via the env's
    reward_from_features.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python -m tools.replay_stats \
      --folder exp_local/quad_directed --tasks quadruped_walk,quadruped_run
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--folder", required=True,
                   help="run folder containing models/latest")
    p.add_argument("--feature-index", type=int, default=5,
                   help="goal-column component to quantile (5 = body-"
                        "forward speed in quad_pos_speed)")
    p.add_argument("--thresholds", default="0.5,2.5",
                   help="comma-separated |feature| thresholds to report "
                        "frame fractions for")
    p.add_argument("--tasks", default=None,
                   help="comma-separated task names for relabeled frame "
                        "rewards (needs the run's env)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from controllable_agent_tpu.train import checkpoint as ckpt_lib

    folder = Path(args.folder)
    restored = ckpt_lib.load_checkpoint(folder / "models" / "latest",
                                        only=["replay"])
    replay = restored["replay"]
    n = int(np.asarray(replay.n_episodes))
    lengths = np.asarray(replay.ep_lengths)[:n]
    goal = np.asarray(replay.storage["goal"])[:n]  # [n, T+1, gdim]
    # mask out the FIRST dummy row and any unused tail per episode
    t_idx = np.arange(goal.shape[1])[None, :]
    mask = (t_idx >= 1) & (t_idx <= lengths[:, None])
    feat = goal[..., args.feature_index]
    vals = np.abs(feat[mask])
    report: dict = {
        "episodes": n,
        "frames": int(mask.sum()),
        "feature_index": args.feature_index,
        "abs_feature_quantiles": {
            q: float(np.quantile(vals, float(q)))
            for q in ("0.5", "0.9", "0.95", "0.99")},
        "abs_feature_max": float(vals.max()),
    }
    for thr in args.thresholds.split(","):
        report[f"frac_frames_above_{thr.strip()}"] = float(
            (vals > float(thr)).mean())

    if args.tasks:
        import jax
        from controllable_agent_tpu.train.workspace import make_env
        for task in args.tasks.split(","):
            task = task.strip()
            env = make_env(task)
            if not hasattr(env, "reward_from_features"):
                raise SystemExit(f"{task}: env has no reward_from_features")
            r = np.asarray(jax.vmap(env.reward_from_features)(
                goal[mask].astype(np.float32)))
            report[task] = {
                "frame_reward_mean": float(r.mean()),
                "frame_reward_p95": float(np.quantile(r, 0.95)),
                "frac_frames_r>0.9": float((r > 0.9).mean()),
            }

    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        Path(args.out).write_text(text + "\n")


if __name__ == "__main__":
    main()
