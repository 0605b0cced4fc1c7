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


def test_snapshot_at_and_load_model(tmp_path) -> None:
    """Milestone snapshots (reference snapshot_at, pretrain.py:77-78,
    610-611) and warm-start from a checkpoint (load_model, :309-310)."""
    import json
    from controllable_agent_tpu.pretrain import main as pretrain_main

    folder = tmp_path / "xp"
    args = [
        "agent=discrete_fb", "task=grid_simple", "episode_length=10",
        "num_train_frames=80", "num_seed_frames=20", "num_envs=2",
        "eval_every_steps=1000", "checkpoint_every=1000", "final_tests=0",
        "replay_buffer_episodes=8", f"folder={folder}", "use_console=false",
        "snapshot_at=40,60", "agent.hidden_dim=32",
        "agent.backward_hidden_dim=32", "agent.feature_dim=16",
        "agent.z_dim=8", "agent.batch_size=16",
    ]
    pretrain_main(args)
    assert (folder / "models" / "snapshot_40").exists()
    assert (folder / "models" / "snapshot_60").exists()

    # warm-start a fresh workspace from the milestone
    folder2 = tmp_path / "xp2"
    pretrain_main([
        "agent=discrete_fb", "task=grid_simple", "episode_length=10",
        "num_train_frames=100", "num_seed_frames=20", "num_envs=2",
        "eval_every_steps=1000", "checkpoint_every=1000", "final_tests=0",
        "replay_buffer_episodes=8", f"folder={folder2}", "use_console=false",
        f"load_model={folder / 'models' / 'snapshot_40'}",
        "agent.hidden_dim=32", "agent.backward_hidden_dim=32",
        "agent.feature_dim=16", "agent.z_dim=8", "agent.batch_size=16",
    ])
    meta = json.loads((folder2 / "models" / "latest" / "meta.json").read_text())
    assert meta["global_step"] >= 100  # counters inherited from the snapshot


def test_fresh_tmp_is_not_treated_as_orphan(tmp_path) -> None:
    """A live writer's <name>.tmp (recent mtime) must survive a concurrent
    load; only a STALE tmp from an interrupted save is cleaned up."""
    import os
    import time

    agent, state = _state()
    path = tmp_path / "ckpt"
    ckpt.save_checkpoint(path, {"agent": state, "global_step": 1,
                                "global_episode": 1})
    tmp = tmp_path / "ckpt.tmp"
    tmp.mkdir()
    (tmp / "agent.msgpack").write_bytes(b"partial")
    out = ckpt.load_checkpoint(path, {"agent": agent.init(jax.random.key(1))})
    assert out["global_step"] == 1
    assert tmp.exists()  # fresh tmp left alone
    stale = time.time() - 3600
    os.utime(tmp, (stale, stale))
    ckpt.load_checkpoint(path, {"agent": agent.init(jax.random.key(2))})
    assert not tmp.exists()  # stale orphan cleaned
