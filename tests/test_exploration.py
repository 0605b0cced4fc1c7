import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.agents.exploration import (
    DIAYNAgent,
    DIAYNConfig,
    DisagreementAgent,
    DisagreementConfig,
    ICMAgent,
    ICMAPTAgent,
    ICMAPTConfig,
    ICMConfig,
    MaxEntAgent,
    MaxEntConfig,
    RNDAgent,
    RNDConfig,
)
from controllable_agent_tpu.data.episode_batch import EpisodeBatch

_SMALL = dict(hidden_dim=32, feature_dim=16, batch_size=16)


def _batch(n: int = 16, obs_dim: int = 6, act_dim: int = 3,
           meta: dict = None, seed: int = 0) -> EpisodeBatch:
    rng = np.random.RandomState(seed)
    return EpisodeBatch(
        obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        action=jnp.asarray(rng.uniform(-1, 1, (n, act_dim)).astype(np.float32)),
        reward=jnp.asarray(rng.rand(n, 1).astype(np.float32)),
        next_obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        discount=jnp.full((n, 1), 0.98, jnp.float32),
        meta=meta or {},
    )


@pytest.mark.parametrize("agent_cls,cfg_cls,extra", [
    (RNDAgent, RNDConfig, dict(rnd_rep_dim=16)),
    (ICMAgent, ICMConfig, {}),
    (ICMAPTAgent, ICMAPTConfig, dict(icm_rep_dim=16, knn_k=4)),
    (DisagreementAgent, DisagreementConfig, dict(n_models=3)),
    (MaxEntAgent, MaxEntConfig, dict(knn_k=4)),
])
def test_intrinsic_agents_update(agent_cls, cfg_cls, extra) -> None:
    cfg = cfg_cls(**{**_SMALL, **extra})
    agent = agent_cls(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    state2, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["critic_loss"]))
    assert np.isfinite(float(metrics["intr_reward"]))
    # intrinsic reward drives the critic, not the stored extrinsic reward
    assert float(metrics["batch_reward"]) != pytest.approx(
        float(np.asarray(_batch().reward).mean()), abs=1e-6)
    # ... and not the (untrained) reward model: the reward the critic saw
    # must BE the intrinsic reward (regression: before round 4, reward_free
    # routed intrinsic agents through DDPG's reward-model substitution, so
    # the explorer optimized a frozen random function instead of novelty)
    assert float(metrics["batch_reward"]) == pytest.approx(
        float(metrics["intr_reward"]), rel=1e-5)


def test_icm_apt_identity_rep() -> None:
    cfg = ICMAPTConfig(**{**_SMALL, "rep": "identity", "knn_k": 4})
    agent = ICMAPTAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    assert state.module_params is None
    _, metrics = agent.update(state, _batch(), jax.random.key(1))
    assert np.isfinite(float(metrics["intr_reward"]))


def test_diayn_skill_meta_and_update() -> None:
    cfg = DIAYNConfig(**{**_SMALL, "skill_dim": 4})
    agent = DIAYNAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    meta = agent.init_meta(state, jax.random.key(1))
    skill = np.asarray(meta["skill"])
    assert skill.shape == (4,) and skill.sum() == 1.0
    # meta resampling cadence
    m2 = agent.update_meta(state, meta, 50, jax.random.key(2))
    m3 = agent.update_meta(state, meta, 51, jax.random.key(2))
    assert np.array_equal(np.asarray(m3["skill"]), skill)

    skills = jnp.asarray(np.eye(4, dtype=np.float32)[
        np.random.RandomState(0).randint(0, 4, 16)])
    batch = _batch(meta={"skill": skills})
    state2, metrics = agent.update(state, batch, jax.random.key(3))
    assert np.isfinite(float(metrics["diayn_loss"]))
    assert 0.0 <= float(metrics["diayn_acc"]) <= 1.0
    # act consumes the skill through meta concat
    a = agent.act(state2.ddpg, jnp.zeros((2, 6)), {"skill": skills[:2]},
                  jnp.asarray(0), jax.random.key(4), eval_mode=True)
    assert a.shape == (2, 3)


def test_rnd_reward_normalized_positive() -> None:
    cfg = RNDConfig(**{**_SMALL, "rnd_rep_dim": 16})
    agent = RNDAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    for i in range(3):
        state, metrics = agent.update(state, _batch(seed=i), jax.random.key(i))
    assert float(metrics["intr_reward"]) > 0
    assert float(state.rms.n) > 1  # running stats accumulated
