import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.agents import FEATURE_LEARNERS, SFAgent, SFConfig
from controllable_agent_tpu.data.episode_batch import EpisodeBatch

_SMALL = dict(hidden_dim=32, backward_hidden_dim=32, feature_dim=16, z_dim=8,
              batch_size=16)


def _batch(n: int = 16, obs_dim: int = 6, act_dim: int = 3,
           seed: int = 0) -> EpisodeBatch:
    rng = np.random.RandomState(seed)
    return EpisodeBatch(
        obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        action=jnp.asarray(rng.uniform(-1, 1, (n, act_dim)).astype(np.float32)),
        reward=jnp.asarray(rng.rand(n, 1).astype(np.float32)),
        next_obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        discount=jnp.full((n, 1), 0.98, jnp.float32),
        future_obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
    )


def _agent(**kw) -> SFAgent:
    cfg = SFConfig(**{**_SMALL, **kw})
    return SFAgent(cfg, obs_dim=6, action_dim=3)


# one update per learner: losses finite, params move
@pytest.mark.parametrize("learner", sorted(FEATURE_LEARNERS))
def test_each_feature_learner_updates(learner: str) -> None:
    agent = _agent(feature_learner=learner, mix_ratio=0.5)
    state = agent.init(jax.random.key(0))
    state2, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["sf_loss"])), learner
    assert np.isfinite(float(metrics["actor_loss"])), learner
    if learner not in ("random", "identity", "fb"):  # fb = frozen phi
        assert np.isfinite(float(metrics["phi_loss"])), learner
    assert int(state2.step) == 1


def test_identity_learner_uses_goal_dim_as_z() -> None:
    cfg = SFConfig(**{**_SMALL, "feature_learner": "identity"})
    agent = SFAgent(cfg, obs_dim=6, action_dim=3, goal_dim=4)
    assert agent.cfg.z_dim == 4
    state = agent.init(jax.random.key(0))
    phi = agent.features(state.feature_params, jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(phi), 1.0)


def test_sf_inference_lstsq() -> None:
    agent = _agent(feature_learner="random")
    state = agent.init(jax.random.key(0))
    obs = jnp.asarray(np.random.RandomState(0).randn(64, 6), jnp.float32)
    # reward linear in phi -> lstsq should recover direction
    phi = agent.features(state.feature_params, obs)
    w = jnp.asarray(np.random.RandomState(1).randn(8), jnp.float32)
    reward = phi @ w
    z = agent.infer_meta_from_obs_and_rewards(state, obs, reward)
    z_norm = np.asarray(z) / np.linalg.norm(np.asarray(z))
    w_norm = np.asarray(w) / np.linalg.norm(np.asarray(w))
    assert abs(float(z_norm @ w_norm)) > 0.99
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z)),
                               np.sqrt(8.0), rtol=1e-4)


def test_goal_meta_whitening() -> None:
    agent = _agent(feature_learner="random")
    state = agent.init(jax.random.key(0))
    goals = jnp.asarray(np.random.RandomState(0).randn(128, 6), jnp.float32)
    state = agent.precompute_cov(state, goals)
    assert not np.allclose(np.asarray(state.inv_cov), np.eye(8))
    z = agent.get_goal_meta(state, jnp.ones((6,)))
    assert z.shape == (8,)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z)),
                               np.sqrt(8.0), rtol=1e-4)


def test_learner_target_nets_soft_update() -> None:
    agent = _agent(feature_learner="latent")
    state = agent.init(jax.random.key(0))
    t0 = np.asarray(jax.tree.leaves(
        state.feature_params["params"]["target_feature_net"])[0])
    state2, _ = agent.update(state, _batch(), jax.random.key(1))
    t1 = np.asarray(jax.tree.leaves(
        state2.feature_params["params"]["target_feature_net"])[0])
    assert not np.array_equal(t0, t1)  # EMA moved
    assert np.abs(t1 - t0).max() < 0.1  # but only slightly (tau=0.01)


def test_sf_mse_variant() -> None:
    agent = _agent(q_loss=False)
    state = agent.init(jax.random.key(0))
    _, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["sf_loss"]))


def test_unknown_learner_raises() -> None:
    with pytest.raises(ValueError):
        _agent(feature_learner="nope")


def test_fb_features_learner_grafts_pretrained_backward_net() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from controllable_agent_tpu.agents.fb_ddpg import FBDDPGAgent, FBDDPGConfig
    from controllable_agent_tpu.agents.sf import SFAgent, SFConfig

    obs_dim, action_dim, z_dim, hidden = 6, 3, 8, 32
    fb_cfg = FBDDPGConfig(z_dim=z_dim, hidden_dim=hidden, feature_dim=16,
                          backward_hidden_dim=hidden, batch_size=8)
    fb = FBDDPGAgent(fb_cfg, obs_dim=obs_dim, action_dim=action_dim)
    fb_state = fb.init(jax.random.key(0))

    sf_cfg = SFConfig(feature_learner="fb", z_dim=z_dim, hidden_dim=hidden,
                      feature_dim=16, backward_hidden_dim=hidden,
                      batch_size=8)
    sf = SFAgent(sf_cfg, obs_dim=obs_dim, action_dim=action_dim,
                 goal_dim=None)
    sf_state = sf.init(jax.random.key(1))
    sf_state = sf.load_fb_features(sf_state, fb_state.backward_params)

    goals = jax.random.normal(jax.random.key(2), (5, obs_dim))
    phi = sf.features(sf_state.feature_params, goals)
    b = fb.backward_net.apply(fb_state.backward_params, goals)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(b), atol=1e-5)
    # frozen: an update step leaves phi params untouched
    from controllable_agent_tpu.data.episode_batch import EpisodeBatch
    batch = EpisodeBatch(
        obs=goals, action=jnp.zeros((5, action_dim)),
        reward=jnp.ones((5, 1)), discount=jnp.full((5, 1), 0.98),
        next_obs=goals, future_obs=goals, goal=goals, next_goal=goals,
        future_goal=goals, meta={"z": jnp.zeros((5, z_dim))})
    old_phi_params = jax.tree.map(jnp.copy, sf_state.feature_params)
    new_state, _ = sf.update(sf_state, batch, jax.random.key(3))
    jax.tree.map(
        lambda a, b_: np.testing.assert_array_equal(np.asarray(a),
                                                    np.asarray(b_)),
        old_phi_params, new_state.feature_params)
