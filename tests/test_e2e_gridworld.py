"""End-to-end smoke test: discrete FB on the gridworld, offline->eval.

Mirrors the reference's grid_simple anytrain niche
(controllable_agent/test_url_benchmark.py:51-63) with tiny budgets: collect
random-policy episodes, train the discrete FB agent a few hundred steps,
and check that zero-shot goal inference produces a policy that improves on
random for reaching the goal.
"""

import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.agents import DiscreteFBAgent, DiscreteFBConfig
from controllable_agent_tpu.data import ReplayBuffer
from controllable_agent_tpu.envs import build_gridworld_task
from controllable_agent_tpu.train.loops import make_offline_trainer


def _collect_random_episodes(env, buf: ReplayBuffer, n_episodes: int,
                             key: jax.Array) -> None:
    step = jax.jit(env.step)
    for ep in range(n_episodes):
        key, k_reset = jax.random.split(key)
        state, ts = env.reset(k_reset)
        episode = {
            "observation": [np.asarray(ts.observation)],
            "action": [np.zeros(1, np.float32)],
            "reward": [np.zeros(1, np.float32)],
            "discount": [np.ones(1, np.float32)],
            "physics": [np.asarray(ts.physics)],
        }
        done = False
        while not done:
            key, k_act = jax.random.split(key)
            action = jax.random.randint(k_act, (), 0, 5)
            state, ts = step(state, action)
            episode["observation"].append(np.asarray(ts.observation))
            episode["action"].append(np.full(1, float(ts.action), np.float32))
            episode["reward"].append(np.full(1, float(ts.reward), np.float32))
            episode["discount"].append(np.full(1, float(ts.discount), np.float32))
            episode["physics"].append(np.asarray(ts.physics))
            done = bool(ts.last())
        buf.add_episode({k: np.stack(v) for k, v in episode.items()})


def test_discrete_fb_learns_gridworld() -> None:
    env = build_gridworld_task("obstacle", max_episode_length=30)
    buf = ReplayBuffer(max_episodes=40, discount=0.98, future=0.99)
    _collect_random_episodes(env, buf, 40, jax.random.key(0))

    cfg = DiscreteFBConfig(hidden_dim=64, backward_hidden_dim=64,
                           feature_dim=32, z_dim=16, batch_size=256,
                           fb_target_tau=0.05)
    agent = DiscreteFBAgent(cfg, obs_dim=env.spec.obs_dim,
                            n_actions=env.spec.n_actions)
    state = agent.init(jax.random.key(1))
    trainer = make_offline_trainer(agent, buf.cfg, cfg.batch_size,
                                   steps_per_call=100)
    key = jax.random.key(2)
    for _ in range(6):
        key, sub = jax.random.split(key)
        state, metrics = trainer(state, buf.state, sub)
    assert np.isfinite(float(metrics["fb_loss"]))

    # zero-shot: z = B(goal observation), then greedy rollout
    env_state, ts = env.reset(jax.random.key(3))
    goal_obs = env.get_goal_obs(env_state)
    z = agent.get_goal_meta(state, goal_obs)
    goal = np.asarray(env_state.goal)

    step = jax.jit(env.step)
    dists = []
    pos0 = np.asarray(env_state.pos)
    for t in range(30):
        a = agent.act(state, ts.observation[None], z[None],
                      jnp.asarray(10**6), jax.random.key(t), eval_mode=True)
        env_state, ts = step(env_state, a[0])
        dists.append(np.abs(np.asarray(env_state.pos) - goal).sum())
    # the greedy policy should get closer to the goal than the start was
    assert min(dists) <= np.abs(pos0 - goal).sum()
