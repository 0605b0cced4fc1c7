"""Exploration-buffer quality report for ExORL-format episode dirs.

The round-4 post-mortems showed every weak battery row was a DATA
ceiling (cheetah_run: buffer p99 speed 2.07 m/s vs target 10; hopper:
p95 torso height 0.29 m vs standing ~1.4). This makes that check a
first-class step: run it on a freshly collected buffer BEFORE spending
an offline-training run on it.

Reports, from the raw MuJoCo physics rows ([qpos, qvel]):
  * forward-speed quantiles (planar domains: qvel[vx index]),
  * torso-height quantiles,
  * per-task relabeled rewards (native reward fns over adapted physics,
    the exact values offline FB will train on): per-episode mean/max and
    the fraction of frames above reward thresholds.

Usage:
  PYTHONPATH= JAX_PLATFORMS=cpu python -m tools.buffer_stats \
      --dir exorl_data/cheetah_rnd --physics-format mujoco_cheetah \
      --tasks cheetah_walk,cheetah_run --out results/cheetah_buffer.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

# raw MuJoCo [qpos, qvel] layout per planar domain:
# (ndof, index of vx in qvel, index of root-height in qpos, height offset)
_LAYOUT = {
    "mujoco_walker": (9, 1, 0, 1.3),
    "mujoco_cheetah": (9, 0, 1, 0.7),
    "mujoco_hopper": (7, 0, 1, 1.0),
}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True)
    p.add_argument("--physics-format", required=True,
                   choices=sorted(_LAYOUT))
    p.add_argument("--tasks", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--skip", type=int, default=0,
                   help="skip the first N episode files")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from controllable_agent_tpu.data.exorl import PHYSICS_ADAPTERS
    from controllable_agent_tpu.goals import get_reward_function

    ndof, vx_i, z_i, z_off = _LAYOUT[args.physics_format]
    adapter = PHYSICS_ADAPTERS[args.physics_format]
    fns = sorted(Path(args.dir).glob("*.npz"))[args.skip:]
    if args.limit:
        fns = fns[:args.limit]
    assert fns, f"no episodes in {args.dir}"

    phys_rows = []
    for fn in fns:
        with np.load(fn) as ep:
            phys_rows.append(ep["physics"].astype(np.float32))
    lengths = [p_.shape[0] for p_ in phys_rows]
    phys = np.concatenate(phys_rows, 0)
    vx = phys[:, ndof + vx_i]
    height = phys[:, z_i] + z_off
    qs = [0.05, 0.5, 0.9, 0.95, 0.99, 1.0]

    def quant(x):
        return {f"p{int(q * 100)}": float(np.quantile(x, q)) for q in qs}

    report = {
        "dir": args.dir, "episodes": len(fns),
        "frames": int(phys.shape[0]),
        "forward_speed": quant(vx),
        "abs_speed": quant(np.abs(vx)),
        "torso_height": quant(height),
        "tasks": {},
    }
    print(f"{args.dir}: {len(fns)} eps, |vx| p99 "
          f"{report['abs_speed']['p99']:.2f} max "
          f"{report['abs_speed']['p100']:.2f}; height p95 "
          f"{report['torso_height']['p95']:.2f}", flush=True)

    native = adapter(phys)
    offsets = np.cumsum([0] + lengths)
    for task in args.tasks.split(","):
        rf = get_reward_function(task, 1)
        r = np.asarray(rf.from_physics(native)).reshape(-1)
        per_ep = [r[offsets[i]:offsets[i + 1]].sum()
                  for i in range(len(lengths))]
        per_ep = np.asarray(per_ep)
        report["tasks"][task] = {
            "episode_mean": float(per_ep.mean()),
            "episode_p95": float(np.quantile(per_ep, 0.95)),
            "episode_max": float(per_ep.max()),
            "frame_frac_gt_0.5": float((r > 0.5).mean()),
            "frame_frac_gt_0.9": float((r > 0.9).mean()),
        }
        t = report["tasks"][task]
        print(f"  {task}: ep mean {t['episode_mean']:.0f} p95 "
              f"{t['episode_p95']:.0f} max {t['episode_max']:.0f}; "
              f"frames>0.9: {100 * t['frame_frac_gt_0.9']:.2f}%", flush=True)

    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(report, indent=2))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
