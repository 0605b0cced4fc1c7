"""Zero-shot evaluation of a trained agent on the REAL dm_control stack.

Closes the loop on the canonical offline recipe (reference README.md:63-78):
after offline FB training on a real MuJoCo ExORL-format buffer, this tool
evaluates the agent zero-shot on the actual dm_control environments — the
same reward the PyTorch reference reports — not on this repo's native
engines. Per task it infers z by reward regression over relabeled replay
samples (the reference finalize battery protocol, pretrain.py:496-533 /
_init_eval_meta:166-184) and rolls out host-side episodes with a
CPU-jitted policy.

Usage (flags before `--` are eval options; the rest rebuild the training
workspace and must match the training invocation):

  python -m tools.eval_mujoco --replay-dir exorl_data/walker_rnd \
      --physics-format mujoco_walker \
      --tasks walker_stand,walker_walk,walker_run,walker_flip \
      --out results/walker_offline_mujoco -- \
      agent=fb_ddpg task=walker_walk goal_space=walker_pos_speed_z \
      folder=exp_local/walker_offline_mujoco

Writes `<out>/test_rewards.json` (10 real-MuJoCo returns per task) and,
with --snapshots, `<out>/eval.csv` — the primary task's return measured on
dm_control at every saved training snapshot (a genuine cross-engine
learning curve).
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import typing as tp
from pathlib import Path

import numpy as np

from tools import mujoco_bridge as bridge
from tools.collect_mujoco_buffer import flat_obs


def rollout_return(env: tp.Any, act: tp.Callable[[np.ndarray], np.ndarray],
                   episode_length: int,
                   obs_fn: tp.Optional[tp.Callable[[tp.Any], np.ndarray]] = None
                   ) -> float:
    ts = env.reset()
    total = 0.0
    for _ in range(episode_length):
        obs = flat_obs(ts) if obs_fn is None else obs_fn(env)
        action = act(obs)
        ts = env.step(action)
        total += 0.0 if ts.reward is None else float(ts.reward)
        if ts.last():
            break
    return total


def main() -> None:
    argv = sys.argv[1:]
    ws_args: tp.List[str] = []
    if "--" in argv:
        split = argv.index("--")
        argv, ws_args = argv[:split], argv[split + 1:]
    p = argparse.ArgumentParser()
    p.add_argument("--replay-dir", required=True)
    p.add_argument("--physics-format", default="mujoco_walker")
    p.add_argument("--tasks", default="walker_stand,walker_walk,walker_run,"
                                      "walker_flip")
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--episode-length", type=int, default=1000)
    p.add_argument("--buffer-episodes", type=int, default=1000)
    p.add_argument("--out", required=True)
    p.add_argument("--snapshots", action="store_true",
                   help="also evaluate every models/snapshot_* on the "
                        "primary task into eval.csv")
    p.add_argument("--z-draws", type=int, default=8,
                   help="average the inferred z over this many independent "
                        "5120-sample reward regressions (the single-draw "
                        "reference protocol, pretrain.py:166-184, is noisy "
                        "on foreign buffers: round-3 stand returns were "
                        "bimodal 234<->751 from the same checkpoint; the "
                        "spherical mean cuts the estimator variance by "
                        "~1/sqrt(draws))")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from controllable_agent_tpu.data.exorl import load_exorl_episodes
    from controllable_agent_tpu.goals import get_reward_function
    from controllable_agent_tpu.pretrain import build_workspace

    ws = build_workspace(ws_args, offline=True)
    assert ws.global_step > 0, "no checkpoint found in the workspace folder"
    print(f"loaded checkpoint at step {ws.global_step}")
    # z inference must see ONLY the foreign (MuJoCo) episodes — drop any
    # replay shard the checkpoint restored
    from controllable_agent_tpu.data.replay import ReplayBuffer
    ws.buffer = ReplayBuffer(
        max_episodes=args.buffer_episodes, discount=ws.cfg.discount,
        future=ws.cfg.future,
        max_episode_length=ws.env.spec.episode_length)
    episodes = load_exorl_episodes(Path(args.replay_dir),
                                   limit=args.buffer_episodes,
                                   physics_format=args.physics_format)
    # same native-convention obs recompute as train_offline's ingestion
    from controllable_agent_tpu.data.exorl import PHYSICS_ADAPTERS
    adapter = PHYSICS_ADAPTERS[args.physics_format]
    native_obs_fn = getattr(ws.env, "obs_from_physics", None)
    if args.physics_format != "native":
        assert native_obs_fn is not None
        episodes = (
            {**ep, "observation": np.asarray(native_obs_fn(ep["physics"]))}
            for ep in episodes)
    if ws.goal_fn is not None:
        episodes = ({**ep, "goal": np.asarray(ws.goal_fn(ep["physics"]))}
                    for ep in episodes)
    ws.buffer.load_episodes(episodes)
    print(f"buffer: {len(ws.buffer)} episodes for z inference")

    cpu = jax.devices("cpu")[0]
    agent = ws.agent
    act_jit = jax.jit(lambda st, obs, meta, k: agent.policy_act(
        st, obs, meta, jnp.asarray(0, jnp.int32), k, eval_mode=True))

    def make_act(state: tp.Any, meta: tp.Dict[str, tp.Any]) -> tp.Callable:
        # everything the per-step act touches must be committed to the host
        # CPU device; an uncommitted jnp.asarray lands on the TPU and each
        # touch is a relay round-trip (see tools/collect_mujoco_buffer.py)
        cpu_state = jax.device_put(
            jax.tree.map(lambda x: np.asarray(x), state), cpu)
        cpu_meta = jax.device_put(
            {k: np.asarray(v)[None] for k, v in meta.items()}, cpu)
        key = jax.device_put(jax.random.PRNGKey(args.seed), cpu)

        def act(obs: np.ndarray) -> np.ndarray:
            nonlocal key
            key, k = jax.random.split(key)  # host-local (cpu key)
            a = act_jit(cpu_state, jax.device_put(obs[None], cpu),
                        cpu_meta, k)
            return np.asarray(a[0], np.float32)
        return act

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    tasks = args.tasks.split(",")

    # the policy was trained on native-convention observations; feed it
    # the adapted dm_control state each step, not dm_control's raw obs
    obs_fn = None
    if args.physics_format != "native":
        def obs_fn(e: tp.Any) -> np.ndarray:
            phys = adapter(bridge.mj_state(e)[None].astype(np.float32))
            return np.asarray(native_obs_fn(phys[0]))

    def infer_z(reward_fn: tp.Any) -> tp.Tuple[np.ndarray, float]:
        """Spherical mean of --z-draws independent reward regressions.
        Returns (z, draw coherence = mean pairwise cosine of the draws —
        1.0 means the single-draw protocol was already stable)."""
        # draws=1 per call: --z-draws is the ONLY averaging knob here
        # (the workspace's own z_inference_draws defaults to 8 now)
        draws = np.stack([np.asarray(ws._infer_meta_from_replay(reward_fn,
                                                                draws=1))
                          for _ in range(max(args.z_draws, 1))])
        unit = draws / np.maximum(
            np.linalg.norm(draws, axis=-1, keepdims=True), 1e-12)
        cos = unit @ unit.T
        n = len(unit)
        coherence = (float((cos.sum() - n) / (n * (n - 1)))
                     if n > 1 else 1.0)
        z = unit.mean(0)
        z = z / max(np.linalg.norm(z), 1e-12) * np.linalg.norm(draws[0])
        return z.astype(np.float32), coherence

    results: tp.Dict[str, tp.List[float]] = {}
    for task in tasks:
        reward_fn = get_reward_function(task, ws.cfg.seed)
        z, coherence = infer_z(reward_fn)
        print(f"{task}: z draw coherence {coherence:.3f}", flush=True)
        meta = {agent.meta_key: jnp.asarray(z)}
        env = bridge.make_env(task, seed=args.seed)
        act = make_act(ws.agent_state, meta)
        returns = [rollout_return(env, act, args.episode_length, obs_fn)
                   for _ in range(args.episodes)]
        results[task] = returns
        print(f"{task}: mean {np.mean(returns):.1f} "
              f"(+- {np.std(returns):.1f})", flush=True)
    (out_dir / "test_rewards.json").write_text(json.dumps(results))

    if args.snapshots:
        primary = ws.cfg.task
        reward_fn = get_reward_function(primary, ws.cfg.seed)
        env = bridge.make_env(primary, seed=args.seed)
        snaps = sorted(
            (ws.work_dir / "models").glob("snapshot_*"),
            key=lambda pth: int(pth.name.split("_")[1]))
        snaps.append(ws.work_dir / "models" / "latest")
        rows = []
        final_step = ws.global_step
        for snap in snaps:
            ws.load_checkpoint(snap, only=["agent"])
            step = (int(snap.name.split("_")[1])
                    if snap.name.startswith("snapshot") else final_step)
            z, _ = infer_z(reward_fn)
            act = make_act(ws.agent_state, {agent.meta_key: jnp.asarray(z)})
            returns = [rollout_return(env, act, args.episode_length, obs_fn)
                       for _ in range(args.episodes)]
            rows.append({"step": step,
                         "episode_reward": float(np.mean(returns)),
                         "episode_reward#std": float(np.std(returns))})
            print(f"snapshot {step}: {primary} {np.mean(returns):.1f}",
                  flush=True)
        with (out_dir / "eval.csv").open("w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
