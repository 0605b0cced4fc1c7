"""Collect a REAL dm_control exploration buffer in ExORL episode format.

Reproduces the data half of the reference's canonical offline recipe
(reference README.md:63-78: ExORL RND walker buffer -> offline FB) with
locally generated data: an exploration agent (RND by default) is trained
online while stepping the real dm_control environment on the host, and
every episode is saved as an ExORL-format .npz (observation / action /
reward / discount / physics, arrays [T+1, ...]) — the exact format
`data/exorl.py` ingests with `physics_format=mujoco_<domain>`.

TPU/host split: MuJoCo steps on the host; per-step `act` runs as a
CPU-jitted program on a host-resident copy of the params (a per-step TPU
call would pay a relay round trip each step); gradient updates run in
bursts on the accelerator between episodes via the fused offline trainer
(matching the reference's 1-update-per-2-frames ratio by default).

Usage:
  python -m tools.collect_mujoco_buffer --task walker_stand \
      --episodes 300 --out exorl_data/walker_rnd
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path

import numpy as np

from tools import mujoco_bridge as bridge


def flat_obs(ts) -> np.ndarray:
    return np.concatenate(
        [np.asarray(v, np.float32).ravel() for v in ts.observation.values()])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--task", default="walker_stand")
    p.add_argument("--episodes", type=int, default=300)
    p.add_argument("--out", default="exorl_data/walker_rnd")
    p.add_argument("--agent", default="rnd")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--random-episodes", type=int, default=10,
                   help="initial uniform-random episodes (seed frames)")
    p.add_argument("--updates-per-episode", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--episode-length", type=int, default=1000)
    p.add_argument("--policy-refresh-every", type=int, default=5,
                   help="episodes between TPU->host policy snapshots (the "
                        "full train state is ~100 MB through the relay; "
                        "a slightly stale exploration policy is free)")
    p.add_argument("--load-dir", default=None,
                   help="preload existing ExORL episodes into the replay "
                        "buffer and warm up the explorer on them before "
                        "collecting (continue a previous collection run)")
    p.add_argument("--warmup-updates", type=int, default=0,
                   help="gradient updates on the preloaded buffer before "
                        "the first new episode")
    p.add_argument("--start-ep", type=int, default=0,
                   help="episode-file numbering offset (append to an "
                        "existing directory)")
    p.add_argument("--agent-override", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="agent config overrides (repeatable), e.g. "
                        "--agent-override rnd_scale=2.0 for a tuned "
                        "exploration attempt")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from controllable_agent_tpu.agents.registry import default_config, make_agent
    from controllable_agent_tpu.data.replay import ReplayBuffer
    from controllable_agent_tpu.envs.base import EnvSpec
    from controllable_agent_tpu.train.loops import make_offline_trainer

    env = bridge.make_env(args.task, seed=args.seed)
    ts = env.reset()
    obs_dim = flat_obs(ts).shape[0]
    act_spec = env.action_spec()
    action_dim = int(np.prod(act_spec.shape))
    T = args.episode_length
    print(f"{args.task}: obs_dim={obs_dim} action_dim={action_dim} T={T}")

    cfg = default_config(args.agent)
    cfg = dataclasses.replace(
        cfg, batch_size=args.batch_size,
        num_expl_steps=args.random_episodes * T)
    if args.agent_override:
        from controllable_agent_tpu.config import apply_overrides
        cfg = apply_overrides(cfg, args.agent_override)
    spec = EnvSpec(obs_dim=obs_dim, action_dim=action_dim,
                   physics_dim=bridge.mj_state(env).shape[0], goal_dim=0,
                   episode_length=T)
    agent = make_agent(args.agent, cfg, spec)

    cpu0 = jax.devices("cpu")[0]
    key = jax.device_put(jax.random.PRNGKey(args.seed), cpu0)
    key, k_init = jax.random.split(key)
    # init eagerly on the host: un-jitted flax init is dozens of small ops,
    # each a relay round-trip on the TPU (~10 min); on CPU it is seconds,
    # then one bulk upload moves the state to the accelerator.
    with jax.default_device(cpu0):
        state = agent.init(k_init)
    state = jax.device_put(state, jax.devices()[0])
    # size the ring from the ACTUAL preload count: a fixed headroom would
    # silently evict the oldest preloaded episodes once it overflowed
    n_preload = (len(list(Path(args.load_dir).glob("*.npz")))
                 if args.load_dir is not None else 0)
    buffer = ReplayBuffer(
        max_episodes=args.episodes + n_preload,
        discount=0.99, future=0.99, max_episode_length=T)
    nstep = int(getattr(cfg, "nstep", 1) or 1)
    if nstep > 1:  # ExORL exploration agents train on n-step returns
        buffer.cfg = buffer.cfg.replace(nstep=nstep)
    trainer = make_offline_trainer(agent, buffer.cfg, args.batch_size,
                                   steps_per_call=100)

    if args.load_dir is not None:
        from controllable_agent_tpu.data.exorl import load_exorl_episodes
        # bulk path: one host-side assembly + one device transfer per
        # array (per-episode adds pay a relay round-trip each)
        buffer.load_episodes(load_exorl_episodes(Path(args.load_dir)))
        print(f"preloaded {len(buffer)} episodes from {args.load_dir}",
              flush=True)
    if args.warmup_updates > 0:
        if n_preload == 0:
            raise SystemExit("--warmup-updates needs a non-empty --load-dir "
                             "(updates against an empty buffer sample garbage)")
        for _ in range(max(args.warmup_updates // 100, 1)):
            key, k_up = jax.random.split(key)
            state, _ = trainer(state, buffer.state,
                               jax.device_put(k_up, jax.devices()[0]))
        print(f"warmed up {args.warmup_updates} updates", flush=True)

    cpu = jax.devices("cpu")[0]
    act_fn = jax.jit(
        lambda st, obs, step, k: agent.policy_act(
            st, obs, {}, step, k, eval_mode=False))

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    global_step = 0
    t_start = time.time()
    # EVERY per-step array must be committed to the host CPU device —
    # an uncommitted jnp.asarray lands on the default (TPU) device and
    # each touch is a relay round-trip; with 1000 act calls per episode
    # that turns a ~5 s episode into ~5 min. The PRNG key lives on CPU so
    # jax.random.split stays host-local, and the train state snapshot is
    # refreshed only every --policy-refresh-every episodes.
    # host-side policy snapshots transfer ONLY the actor params: acting
    # reads nothing else, and the full train state (optimizer moments,
    # targets, modules) is ~10x the bytes through the relay — round-4
    # collection spent half its wall clock on full-state snapshots.
    # Everything the act program never reads is a zeros-shell built once
    # from shapes (no device transfer; XLA DCEs the unused inputs).
    shell = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype), state)

    def snapshot_policy(st):
        ddpg_st = getattr(st, "ddpg", st)
        actor_host = jax.tree.map(lambda x: np.asarray(x),
                                  ddpg_st.actor_params)
        if hasattr(shell, "ddpg"):
            return shell.replace(
                ddpg=shell.ddpg.replace(actor_params=actor_host))
        return shell.replace(actor_params=actor_host)

    cpu_state = None
    t_env = t_act = t_train = t_xfer = 0.0
    for ep in range(args.episodes):
        if (cpu_state is None
                or ep % max(args.policy_refresh_every, 1) == 0):
            t0 = time.time()
            # np.asarray forces a synchronous device->host read per leaf
            # (block_until_ready is unreliable through the relay, and a
            # lazy device_put still references TPU buffers that the next
            # donating trainer call invalidates)
            cpu_state = jax.device_put(snapshot_policy(state), cpu)
            t_xfer += time.time() - t0
        ts = env.reset()
        rows = {"observation": [flat_obs(ts)],
                "action": [np.zeros(action_dim, np.float32)],
                "reward": [np.zeros(1, np.float32)],
                "discount": [np.ones(1, np.float32)],
                "physics": [bridge.mj_state(env).astype(np.float32)]}
        ep_reward = 0.0
        for t in range(T):
            if ep < args.random_episodes:
                action = rng.uniform(act_spec.minimum, act_spec.maximum,
                                     act_spec.shape).astype(np.float32)
            else:
                t0 = time.time()
                key, k_act = jax.random.split(key)  # host-local (cpu key)
                obs = jax.device_put(
                    rows["observation"][-1][None], cpu)
                action = np.asarray(
                    act_fn(cpu_state, obs,
                           np.int32(global_step), k_act)[0], np.float32)
                t_act += time.time() - t0
            t0 = time.time()
            ts = env.step(action)
            t_env += time.time() - t0
            global_step += 1
            r = 0.0 if ts.reward is None else float(ts.reward)
            ep_reward += r
            rows["observation"].append(flat_obs(ts))
            rows["action"].append(action)
            rows["reward"].append(np.full(1, r, np.float32))
            rows["discount"].append(np.ones(1, np.float32))
            rows["physics"].append(bridge.mj_state(env).astype(np.float32))
        episode = {k: np.stack(v) for k, v in rows.items()}
        np.savez(out_dir / f"episode_{args.start_ep + ep:06d}_{T}.npz",
                 **episode)
        buffer.add_episode(episode)
        # burst updates on the accelerator (1 update per 2 frames)
        if ep >= args.random_episodes - 1:
            t0 = time.time()
            n_calls = max(args.updates_per_episode // 100, 1)
            for _ in range(n_calls):
                key, k_up = jax.random.split(key)
                state, metrics = trainer(
                    state, buffer.state,
                    jax.device_put(k_up, jax.devices()[0]))
            t_train += time.time() - t0
        if (ep + 1) % 10 == 0 or ep == 0:
            elapsed = time.time() - t_start
            print(f"ep {ep + 1}/{args.episodes} task_reward {ep_reward:.1f} "
                  f"({elapsed:.0f}s, {(ep + 1) * T / elapsed:.0f} fps; "
                  f"env {t_env:.0f}s act {t_act:.0f}s train {t_train:.0f}s "
                  f"xfer {t_xfer:.0f}s)", flush=True)
    print(f"done: {args.episodes} episodes -> {out_dir}")


if __name__ == "__main__":
    main()
