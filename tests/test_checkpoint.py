import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.agents import FBDDPGAgent, FBDDPGConfig
from controllable_agent_tpu.train import checkpoint as ckpt

_SMALL = dict(hidden_dim=16, backward_hidden_dim=16, feature_dim=8, z_dim=4,
              batch_size=8)


def _state():
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=3, action_dim=2)
    return agent, agent.init(jax.random.key(0))


def test_save_load_roundtrip(tmp_path) -> None:
    agent, state = _state()
    path = tmp_path / "ckpt"
    ckpt.save_checkpoint(path, {"agent": state, "global_step": 123,
                                "global_episode": 7})
    fresh = agent.init(jax.random.key(99))
    out = ckpt.load_checkpoint(path, {"agent": fresh})
    assert out["global_step"] == 123
    assert out["global_episode"] == 7
    a = jax.tree.leaves(state.forward_params)[0]
    b = jax.tree.leaves(out["agent"].forward_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_partial_load_only(tmp_path) -> None:
    agent, state = _state()
    path = tmp_path / "ckpt"
    ckpt.save_checkpoint(path, {"agent": state, "global_step": 5,
                                "global_episode": 1})
    fresh = agent.init(jax.random.key(99))
    out = ckpt.load_checkpoint(path, {"agent": fresh}, only=["nothing"])
    assert "agent" not in out
    assert out["global_step"] == 5


def test_exclude_on_save(tmp_path) -> None:
    agent, state = _state()
    path = tmp_path / "ckpt"
    ckpt.save_checkpoint(path, {"agent": state, "replay": None,
                                "global_step": 5, "global_episode": 0},
                         exclude=["agent"])
    fresh = agent.init(jax.random.key(99))
    out = ckpt.load_checkpoint(path, {"agent": fresh})
    assert "agent" not in out
