import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.agents import (
    DDPGAgent,
    DDPGConfig,
    DiscreteFBAgent,
    DiscreteFBConfig,
    FBDDPGAgent,
    FBDDPGConfig,
)
from controllable_agent_tpu.data.episode_batch import EpisodeBatch

_SMALL = dict(hidden_dim=32, backward_hidden_dim=32, feature_dim=16, z_dim=8,
              batch_size=16)


def _fb_agent(**kw) -> FBDDPGAgent:
    cfg = FBDDPGConfig(**{**_SMALL, **kw})
    return FBDDPGAgent(cfg, obs_dim=6, action_dim=3)


def _batch(n: int = 16, obs_dim: int = 6, act_dim: int = 3,
           discrete: bool = False, seed: int = 0) -> EpisodeBatch:
    rng = np.random.RandomState(seed)
    action = (rng.randint(0, 5, (n, 1)).astype(np.float32) if discrete
              else rng.uniform(-1, 1, (n, act_dim)).astype(np.float32))
    return EpisodeBatch(
        obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        action=jnp.asarray(action),
        reward=jnp.asarray(rng.rand(n, 1).astype(np.float32)),
        next_obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        discount=jnp.full((n, 1), 0.98, jnp.float32),
        future_obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
    )


def test_fb_act_shapes() -> None:
    agent = _fb_agent()
    state = agent.init(jax.random.key(0))
    obs = jnp.zeros((4, 6))
    z = agent.sample_z(jax.random.key(1), 4)
    a_eval = agent.act(state, obs, z, jnp.asarray(0), jax.random.key(2),
                       eval_mode=True)
    a_expl = agent.act(state, obs, z, jnp.asarray(0), jax.random.key(2),
                       eval_mode=False)
    assert a_eval.shape == (4, 3) and a_expl.shape == (4, 3)
    assert float(jnp.max(jnp.abs(a_expl))) <= 1.0


def test_fb_sample_z_norm() -> None:
    agent = _fb_agent()
    z = agent.sample_z(jax.random.key(0), 128)
    norms = np.linalg.norm(np.asarray(z), axis=1)
    np.testing.assert_allclose(norms, np.sqrt(8.0), rtol=1e-5)


def test_fb_update_changes_params_and_reports_metrics() -> None:
    agent = _fb_agent(future_ratio=0.5, mix_ratio=0.5)
    state = agent.init(jax.random.key(0))
    before = jax.tree.leaves(state.forward_params)[0].copy()
    state2, metrics = agent.update(state, _batch(), jax.random.key(1))
    after = jax.tree.leaves(state2.forward_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    for name in ("fb_loss", "fb_diag", "fb_offdiag", "orth_loss", "actor_loss",
                 "q", "B_norm", "z_norm"):
        assert name in metrics and np.isfinite(float(metrics[name])), name
    assert int(state2.step) == 1


def test_fb_update_q_loss_and_rand_weight() -> None:
    agent = _fb_agent(q_loss=True, rand_weight=True)
    state = agent.init(jax.random.key(0))
    state, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert "q_loss" in metrics and np.isfinite(float(metrics["q_loss"]))


def test_fb_boltzmann_actor() -> None:
    agent = _fb_agent(boltzmann=True)
    state = agent.init(jax.random.key(0))
    state, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["actor_loss"]))


def test_fb_target_soft_update() -> None:
    agent = _fb_agent()
    state = agent.init(jax.random.key(0))
    # update() donates its input state, so snapshot target params first
    t0 = np.asarray(jax.tree.leaves(state.target_forward_params)[0])
    state2, _ = agent.update(state, _batch(), jax.random.key(1))
    t1 = jax.tree.leaves(state2.target_forward_params)[0]
    p1 = jax.tree.leaves(state2.forward_params)[0]
    # target moved, but only by tau toward the online params
    assert not np.allclose(np.asarray(t0), np.asarray(t1))
    assert np.abs(np.asarray(t1 - t0)).max() < np.abs(np.asarray(p1 - t0)).max()


def test_fb_zero_shot_inference() -> None:
    agent = _fb_agent()
    state = agent.init(jax.random.key(0))
    z_goal = agent.get_goal_meta(state, jnp.ones((6,)))
    assert z_goal.shape == (8,)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z_goal)),
                               np.sqrt(8.0), rtol=1e-5)
    obs = jnp.asarray(np.random.RandomState(0).randn(100, 6), jnp.float32)
    reward = jnp.asarray(np.random.RandomState(1).rand(100, 1), jnp.float32)
    z_r = agent.infer_meta_from_obs_and_rewards(state, obs, reward)
    assert z_r.shape == (8,)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z_r)),
                               np.sqrt(8.0), rtol=1e-5)


def test_fb_update_deterministic_given_key() -> None:
    agent = _fb_agent()
    state = agent.init(jax.random.key(0))
    s1, m1 = agent.update(state, _batch(), jax.random.key(7))
    state_b = agent.init(jax.random.key(0))
    s2, m2 = agent.update(state_b, _batch(), jax.random.key(7))
    np.testing.assert_allclose(float(m1["fb_loss"]), float(m2["fb_loss"]),
                               rtol=1e-6)


def test_discrete_fb_act_and_update() -> None:
    cfg = DiscreteFBConfig(**_SMALL)
    agent = DiscreteFBAgent(cfg, obs_dim=2, n_actions=5)
    state = agent.init(jax.random.key(0))
    obs = jnp.zeros((4, 2))
    z = agent.sample_z(jax.random.key(1), 4)
    a = agent.act(state, obs, z, jnp.asarray(10**6), jax.random.key(2),
                  eval_mode=True)
    assert a.shape == (4,) and a.dtype == jnp.int32
    assert int(jnp.max(a)) < 5
    batch = _batch(obs_dim=2, discrete=True)
    state2, metrics = agent.update(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["fb_loss"]))
    assert int(state2.step) == 1


def test_discrete_fb_greedy_target_variant() -> None:
    cfg = DiscreteFBConfig(**{**_SMALL, "boltzmann": False, "q_loss": True})
    agent = DiscreteFBAgent(cfg, obs_dim=2, n_actions=5)
    state = agent.init(jax.random.key(0))
    state, metrics = agent.update(state, _batch(obs_dim=2, discrete=True),
                                  jax.random.key(1))
    assert np.isfinite(float(metrics["fb_loss"]))
    assert np.isfinite(float(metrics["q_loss"]))


def test_ddpg_update() -> None:
    cfg = DDPGConfig(hidden_dim=32, feature_dim=16, batch_size=16)
    agent = DDPGAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    a = agent.act(state, jnp.zeros((2, 6)), {}, jnp.asarray(0),
                  jax.random.key(1), eval_mode=True)
    assert a.shape == (2, 3)
    state2, metrics = agent.update(state, _batch(), jax.random.key(2))
    assert np.isfinite(float(metrics["critic_loss"]))
    assert np.isfinite(float(metrics["actor_loss"]))


def test_ddpg_reward_free() -> None:
    cfg = DDPGConfig(hidden_dim=32, feature_dim=16, batch_size=16,
                     reward_free=True)
    agent = DDPGAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    obs = jnp.asarray(np.random.RandomState(0).randn(64, 6), jnp.float32)
    reward = obs[:, :1] * 2.0
    state = agent.train_reward(state, obs, reward, num_iters=200)
    pred = agent.reward_model.apply(state.reward_params, obs)
    assert float(jnp.mean(jnp.square(pred - reward))) < 1.0
    state2, metrics = agent.update(state, _batch(), jax.random.key(2))
    assert np.isfinite(float(metrics["critic_loss"]))
