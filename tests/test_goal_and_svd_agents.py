import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.agents.discrete_sf import DiscreteSFAgent, DiscreteSFConfig
from controllable_agent_tpu.agents.goal_agents import (
    GoalSMAgent,
    GoalSMConfig,
    GoalTD3Agent,
    GoalTD3Config,
    maze_goal_reward,
)
from controllable_agent_tpu.agents.sf_svd import SFSVDAgent, SFSVDConfig
from controllable_agent_tpu.agents.uvf import UVFAgent, UVFConfig
from controllable_agent_tpu.data.episode_batch import EpisodeBatch

_SMALL = dict(hidden_dim=32, feature_dim=16, batch_size=16)


def _batch(n: int = 16, obs_dim: int = 6, act_dim: int = 3, goal_dim: int = 2,
           discrete: bool = False, meta: dict = None, seed: int = 0) -> EpisodeBatch:
    rng = np.random.RandomState(seed)
    action = (rng.randint(0, 5, (n, 1)).astype(np.float32) if discrete
              else rng.uniform(-1, 1, (n, act_dim)).astype(np.float32))
    return EpisodeBatch(
        obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        action=jnp.asarray(action),
        reward=jnp.asarray(rng.rand(n, 1).astype(np.float32)),
        next_obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        discount=jnp.full((n, 1), 0.98, jnp.float32),
        goal=jnp.asarray(rng.randn(n, goal_dim).astype(np.float32)),
        next_goal=jnp.asarray(rng.randn(n, goal_dim).astype(np.float32)),
        future_obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        future_goal=jnp.asarray(rng.randn(n, goal_dim).astype(np.float32)),
        meta=meta or {},
    )


def test_uvf_agent() -> None:
    cfg = UVFConfig(**{**_SMALL, "backward_hidden_dim": 32, "z_dim": 8,
                       "goal_space": "simplified_point_mass_maze"})
    agent = UVFAgent(cfg, obs_dim=6, action_dim=3, goal_dim=2)
    state = agent.init(jax.random.key(0))
    state2, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["fb_loss"]))
    assert np.isfinite(float(metrics["actor_loss"]))
    z = agent.get_goal_meta(state2, jnp.ones((2,)))
    assert z.shape == (8,)


def test_sf_svd_agent() -> None:
    cfg = SFSVDConfig(**{**_SMALL, "backward_hidden_dim": 32, "z_dim": 8})
    agent = SFSVDAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    state2, metrics = agent.update(state, _batch(goal_dim=6), jax.random.key(1))
    for k in ("phi_loss", "sf_loss", "actor_loss"):
        assert np.isfinite(float(metrics[k])), k
    # inference uses obs AND actions
    obs = jnp.zeros((32, 6))
    act = jnp.zeros((32, 3))
    z = agent.infer_meta_from_obs_action_and_rewards(
        state2, obs, act, jnp.ones((32, 1)))
    assert z.shape == (8,)


def test_goal_td3_supervised_and_her() -> None:
    cfg = GoalTD3Config(**{**_SMALL, "future_ratio": 0.3})
    agent = GoalTD3Agent(cfg, obs_dim=6, action_dim=3, goal_dim=2)
    state = agent.init(jax.random.key(0))
    state2, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["critic_loss"]))
    assert np.isfinite(float(metrics["batch_reward"]))
    a = agent.act(state2, jnp.zeros((2, 6)), jnp.zeros((2, 2)),
                  jnp.asarray(0), jax.random.key(2), eval_mode=True)
    assert a.shape == (2, 3)


def test_goal_td3_replay_goals() -> None:
    cfg = GoalTD3Config(**{**_SMALL, "supervised": False})
    agent = GoalTD3Agent(cfg, obs_dim=6, action_dim=3, goal_dim=2)
    state = agent.init(jax.random.key(0))
    _, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["critic_loss"]))


def test_goal_sm_agent() -> None:
    cfg = GoalSMConfig(**{k: v for k, v in _SMALL.items()
                          if k != "feature_dim"})
    agent = GoalSMAgent(cfg, obs_dim=6, action_dim=3, goal_dim=2)
    state = agent.init(jax.random.key(0))
    state2, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["critic_loss"]))


def test_maze_goal_reward_peak() -> None:
    g = jnp.asarray([[0.15, 0.15]])
    assert float(maze_goal_reward(g, g)[0, 0]) == 1.0
    far = jnp.asarray([[-0.2, -0.2]])
    assert float(maze_goal_reward(far, g)[0, 0]) < 1e-4


def test_discrete_sf_agent() -> None:
    cfg = DiscreteSFConfig(**{**_SMALL, "backward_hidden_dim": 32,
                              "z_dim": 8, "feature_learner": "lap"})
    agent = DiscreteSFAgent(cfg, obs_dim=2, n_actions=5)
    state = agent.init(jax.random.key(0))
    z = agent.sample_z(jax.random.key(1), 4)
    a = agent.act(state, jnp.zeros((4, 2)), z, jnp.asarray(10**6),
                  jax.random.key(2), eval_mode=True)
    assert a.shape == (4,) and int(jnp.max(a)) < 5
    state2, metrics = agent.update(state, _batch(obs_dim=2, discrete=True,
                                                 goal_dim=2),
                                   jax.random.key(3))
    assert np.isfinite(float(metrics["sf_loss"]))
    assert np.isfinite(float(metrics["phi_loss"]))
