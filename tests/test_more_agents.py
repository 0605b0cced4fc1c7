import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.agents.aps import (
    APSAgent,
    APSConfig,
    NEWAPSAgent,
    NEWAPSConfig,
)
from controllable_agent_tpu.agents.proto import ProtoAgent, ProtoConfig, sinkhorn_knopp
from controllable_agent_tpu.agents.smm import SMMAgent, SMMConfig
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
        future_obs=jnp.asarray(rng.randn(n, obs_dim).astype(np.float32)),
        meta=meta or {},
    )


def test_aps_agent() -> None:
    cfg = APSConfig(**{**_SMALL, "sf_dim": 4, "knn_k": 4})
    agent = APSAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    meta = agent.init_meta(state, jax.random.key(1))
    assert meta["task"].shape == (4,)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(meta["task"])),
                               1.0, rtol=1e-5)
    task = jnp.tile(meta["task"][None], (16, 1))
    state2, metrics = agent.update(state, _batch(meta={"task": task}),
                                   jax.random.key(2))
    for k in ("aps_loss", "intr_reward", "critic_loss", "actor_loss"):
        assert np.isfinite(float(metrics[k])), k
    a = agent.act(state2, jnp.zeros((2, 6)), meta, jnp.asarray(0),
                  jax.random.key(3), eval_mode=True)
    assert a.shape == (2, 3)
    # task regression from rewards
    obs = jnp.asarray(np.random.RandomState(0).randn(64, 6), jnp.float32)
    reward = obs[:, :1]
    t = agent.regress_meta(state2, obs, reward)
    assert t.shape == (4,) and np.isfinite(np.asarray(t)).all()


def test_new_aps_agent() -> None:
    cfg = NEWAPSConfig(**{**_SMALL, "backward_hidden_dim": 32, "z_dim": 4,
                          "knn_k": 4, "future_ratio": 0.3})
    agent = NEWAPSAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    z = jnp.tile(agent.sample_z(jax.random.key(1), 1), (16, 1))
    state2, metrics = agent.update(state, _batch(meta={"z": z}),
                                   jax.random.key(2))
    for k in ("phi_loss", "intrinsic_reward", "sf_loss", "actor_loss"):
        assert np.isfinite(float(metrics[k])), k
    zi = agent.infer_meta_from_obs_and_rewards(
        state2, jnp.zeros((32, 6)), jnp.ones((32, 1)))
    assert zi.shape == (4,)


def test_smm_agent() -> None:
    cfg = SMMConfig(**{**_SMALL, "z_dim": 4, "code_dim": 16})
    agent = SMMAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    meta = agent.init_meta(state, jax.random.key(1))
    assert np.asarray(meta["z"]).sum() == 1.0
    z = jnp.asarray(np.eye(4, dtype=np.float32)[
        np.random.RandomState(0).randint(0, 4, 16)])
    state2, metrics = agent.update(state, _batch(meta={"z": z}),
                                   jax.random.key(2))
    for k in ("loss_vae", "loss_pred", "intr_reward", "critic_loss"):
        assert np.isfinite(float(metrics[k])), k


def test_proto_agent() -> None:
    cfg = ProtoConfig(**{**_SMALL, "pred_dim": 8, "proj_dim": 16,
                         "num_protos": 8, "queue_size": 32, "topk": 3})
    agent = ProtoAgent(cfg, obs_dim=6, action_dim=3)
    state = agent.init(jax.random.key(0))
    state2, metrics = agent.update(state, _batch(), jax.random.key(1))
    for k in ("repr_loss", "intr_reward", "critic_loss"):
        assert np.isfinite(float(metrics[k])), k
    # queue received candidates
    assert float(jnp.abs(state2.module_params["queue"]).sum()) > 0
    state3, _ = agent.update(state2, _batch(seed=1), jax.random.key(2))
    assert int(state3.module_params["queue_ptr"]) != 0


def test_sinkhorn_doubly_stochastic() -> None:
    q = sinkhorn_knopp(jnp.asarray(
        np.random.RandomState(0).randn(16, 8), jnp.float32))
    # each sample's assignment over prototypes sums to 1
    np.testing.assert_allclose(np.asarray(q.sum(axis=1)), np.ones(16),
                               rtol=1e-3)
    assert np.asarray(q).min() >= 0


def test_registry_has_all_agents() -> None:
    from controllable_agent_tpu.agents.registry import AGENTS
    for name in ("fb_ddpg", "discrete_fb", "ddpg", "sf", "aps", "new_aps",
                 "rnd", "diayn", "icm", "icm_apt", "disagreement", "max_ent",
                 "smm", "proto", "uvf", "sf_svd", "goal_td3", "goal_sm",
                 "discrete_sf"):
        assert name in AGENTS, name
