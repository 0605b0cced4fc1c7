"""Offline pipeline e2e: ExORL-format episodes -> relabel -> train -> eval.

Mirrors the reference's offline workflow (train_offline.py + ExORL .npz
loading, README.md:63-78) with tiny synthetic walker-format episodes.
"""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from controllable_agent_tpu.train_offline import main as train_offline_main


@pytest.fixture()
def exorl_dir(tmp_path) -> Path:
    """Synthetic ExORL-format episode files with walker-shaped physics."""
    rng = np.random.RandomState(0)
    d = tmp_path / "episodes"
    d.mkdir()
    T = 20
    ndof = 9
    for i in range(4):
        q = rng.randn(T + 1, ndof).astype(np.float32) * 0.3
        q[:, 1] += 1.3  # plausible torso heights
        qd = rng.randn(T + 1, ndof).astype(np.float32)
        np.savez(
            d / f"episode_{i}.npz",
            observation=rng.randn(T + 1, 24).astype(np.float32),
            action=rng.uniform(-1, 1, (T + 1, 6)).astype(np.float32),
            reward=np.zeros((T + 1, 1), np.float32),
            discount=np.ones((T + 1, 1), np.float32),
            physics=np.concatenate([q, qd], axis=1),
        )
    return d


def test_train_offline_cli_from_exorl(exorl_dir, tmp_path) -> None:
    folder = tmp_path / "xp"
    train_offline_main([
        "agent=fb_ddpg", "task=walker_walk", "goal_space=simplified_walker",
        f"replay_dir={exorl_dir}", "relabel=true",
        "num_grad_steps=20", "steps_per_call=10", "eval_every_steps=20",
        "checkpoint_every=1000", "num_eval_episodes=2", "episode_length=20",
        "final_tests=0",
        "replay_buffer_episodes=8", f"folder={folder}", "use_console=false",
        "agent.hidden_dim=32", "agent.backward_hidden_dim=32",
        "agent.feature_dim=16", "agent.z_dim=8", "agent.batch_size=16",
        "agent.num_inference_steps=32",
    ])
    # training ran, eval happened, checkpoint + logs exist
    assert (folder / "train.csv").exists()
    assert (folder / "eval.csv").exists()
    assert (folder / "models" / "latest" / "meta.json").exists()
    meta = json.loads((folder / "models" / "latest" / "meta.json").read_text())
    assert meta["global_step"] == 20
    # rewards were relabeled from physics: non-zero after walker_walk relabel
    eval_rows = (folder / "eval.csv").read_text().strip().split("\n")
    assert len(eval_rows) >= 2


def test_train_offline_cli_from_replay_checkpoint(tmp_path) -> None:
    """load_replay=: restore the replay shard of a pretrain checkpoint,
    relabel for the target task, recompute goals (reference
    train_offline.py:68-70 load_replay_buffer)."""
    import numpy as np
    from controllable_agent_tpu.data import ReplayBuffer
    from controllable_agent_tpu.train import checkpoint as ckpt_lib

    rng = np.random.RandomState(0)
    buf = ReplayBuffer(max_episodes=8, discount=0.98, future=0.99)
    T, ndof = 20, 9
    for _ in range(4):
        q = rng.randn(T + 1, ndof).astype(np.float32) * 0.3
        q[:, 1] += 1.3
        qd = rng.randn(T + 1, ndof).astype(np.float32)
        buf.add_episode({
            "observation": rng.randn(T + 1, 24).astype(np.float32),
            "action": rng.uniform(-1, 1, (T + 1, 6)).astype(np.float32),
            "reward": np.zeros((T + 1, 1), np.float32),
            "discount": np.ones((T + 1, 1), np.float32),
            "physics": np.concatenate([q, qd], axis=1),
        })
    ckpt = tmp_path / "models" / "latest"
    ckpt.parent.mkdir(parents=True)
    ckpt_lib.save_checkpoint(ckpt, {"replay": buf.state, "global_step": 123})

    folder = tmp_path / "xp"
    train_offline_main([
        "agent=fb_ddpg", "task=walker_walk", "goal_space=simplified_walker",
        f"load_replay={ckpt}", "relabel=true",
        "num_grad_steps=10", "steps_per_call=10", "eval_every_steps=100",
        "checkpoint_every=1000", "num_eval_episodes=2", "episode_length=20",
        "final_tests=0",
        "replay_buffer_episodes=8", f"folder={folder}", "use_console=false",
        "agent.hidden_dim=32", "agent.backward_hidden_dim=32",
        "agent.feature_dim=16", "agent.z_dim=8", "agent.batch_size=16",
        "agent.num_inference_steps=32",
    ])
    assert (folder / "train.csv").exists()
    import json
    meta = json.loads((folder / "models" / "latest" / "meta.json").read_text())
    assert meta["global_step"] == 10  # replay-only restore: step NOT inherited


def test_train_multihost_cli_single_process(exorl_dir, tmp_path) -> None:
    """train_multihost CLI, single-process: distributed init is a no-op,
    the shard is the full episode set, and the fused trainer runs
    data-parallel over the virtual 8-device mesh."""
    from controllable_agent_tpu.train_multihost import main as mh_main

    folder = tmp_path / "xp_mh"
    mh_main([
        "agent=fb_ddpg", "task=walker_walk", "goal_space=simplified_walker",
        f"replay_dir={exorl_dir}", "relabel=true",
        "num_grad_steps=20", "steps_per_call=10", "eval_every_steps=20",
        "checkpoint_every=1000", "num_eval_episodes=2", "episode_length=20",
        "final_tests=0",
        "replay_buffer_episodes=8", f"folder={folder}", "use_console=false",
        "agent.hidden_dim=32", "agent.backward_hidden_dim=32",
        "agent.feature_dim=16", "agent.z_dim=8", "agent.batch_size=16",
        "agent.num_inference_steps=32",
    ])
    assert (folder / "train.csv").exists()
    assert (folder / "models" / "latest" / "meta.json").exists()
    import json
    meta = json.loads((folder / "models" / "latest" / "meta.json").read_text())
    assert meta["global_step"] == 20


def test_exorl_shard_loading(exorl_dir) -> None:
    """Round-robin episode-file sharding across hosts: disjoint, covering."""
    from controllable_agent_tpu.data.exorl import load_exorl_episodes

    full = list(load_exorl_episodes(exorl_dir))
    s0 = list(load_exorl_episodes(exorl_dir, shard=0, num_shards=2))
    s1 = list(load_exorl_episodes(exorl_dir, shard=1, num_shards=2))
    assert len(s0) + len(s1) == len(full) == 4
    np.testing.assert_array_equal(s0[0]["observation"], full[0]["observation"])
    np.testing.assert_array_equal(s1[0]["observation"], full[1]["observation"])


# ------------------------------------------------ real-ExORL schema bridge

@pytest.fixture()
def real_exorl_dir(tmp_path) -> Path:
    """Fixture matching the REAL ExORL walker .npz schema exactly: float64
    MuJoCo physics [qpos(9), qvel(9)] with qpos = [rootz, rootx, rooty,
    6 joints] (torso offset 1.3 baked into the model), float32 obs (24),
    action (6), reward/discount (1) — all [T+1, ...] with dummy row 0."""
    rng = np.random.RandomState(1)
    d = tmp_path / "real_episodes"
    d.mkdir()
    T = 20
    for i in range(4):
        qpos = rng.randn(T + 1, 9).astype(np.float64) * 0.2  # rootz ~ 0
        qvel = rng.randn(T + 1, 9).astype(np.float64)
        np.savez(
            d / f"episode_{i:06d}_{T}.npz",
            observation=rng.randn(T + 1, 24).astype(np.float32),
            action=rng.uniform(-1, 1, (T + 1, 6)).astype(np.float32),
            reward=np.zeros((T + 1, 1), np.float32),
            discount=np.ones((T + 1, 1), np.float32),
            physics=np.concatenate([qpos, qvel], axis=1),
        )
    return d


def test_mujoco_walker_physics_adapter_semantics() -> None:
    """Adapter maps MuJoCo root coordinates to native columns so the
    native reward zoo scores foreign states correctly."""
    from controllable_agent_tpu.data.exorl import (
        mujoco_walker_physics_to_native)
    from controllable_agent_tpu.goals import get_reward_function

    # upright standing: qpos=0 -> torso at 1.3 m, upright, still
    standing = np.zeros((1, 18))
    # fallen: torso 1.0 m below rest, pitched 90 degrees
    fallen = np.zeros((1, 18))
    fallen[0, 0] = -1.0
    fallen[0, 2] = np.pi / 2
    native_stand = mujoco_walker_physics_to_native(standing)
    native_fall = mujoco_walker_physics_to_native(fallen)
    assert native_stand.shape == (1, 18)
    assert native_stand.dtype == np.float32
    assert native_stand[0, 1] == pytest.approx(1.3)   # absolute height
    assert native_fall[0, 1] == pytest.approx(0.3)

    stand_reward = get_reward_function("walker_stand", 0)
    r_up = float(stand_reward.from_physics(native_stand)[0])
    r_down = float(stand_reward.from_physics(native_fall)[0])
    assert r_up > 0.9
    assert r_down < 0.3
    # velocities permute with their coordinates: qvel[rootx] (column 10)
    # lands in the native qd[0] = xd slot (column 9), with no offset added
    moving = np.zeros((1, 18))
    moving[0, 10] = 1.5
    native_moving = mujoco_walker_physics_to_native(moving)
    assert native_moving[0, 9] == pytest.approx(1.5)
    assert abs(native_moving[0, 10]) < 1e-8


def test_unknown_physics_format_raises(real_exorl_dir) -> None:
    from controllable_agent_tpu.data.exorl import load_exorl_episodes
    with pytest.raises(ValueError, match="physics_format"):
        list(load_exorl_episodes(real_exorl_dir, physics_format="mjx"))


def test_train_offline_cli_real_exorl_schema(real_exorl_dir, tmp_path) -> None:
    """End-to-end: real-schema MuJoCo walker episodes -> physics adapter ->
    relabel -> goal recompute -> offline FB training."""
    folder = tmp_path / "xp_real"
    train_offline_main([
        "agent=fb_ddpg", "task=walker_stand", "goal_space=simplified_walker",
        f"replay_dir={real_exorl_dir}", "relabel=true",
        "physics_format=mujoco_walker",
        "num_grad_steps=10", "steps_per_call=10", "eval_every_steps=100",
        "checkpoint_every=1000", "num_eval_episodes=1", "episode_length=20",
        "final_tests=0",
        "replay_buffer_episodes=8", f"folder={folder}", "use_console=false",
        "agent.hidden_dim=32", "agent.backward_hidden_dim=32",
        "agent.feature_dim=16", "agent.z_dim=8", "agent.batch_size=16",
        "agent.num_inference_steps=32",
    ])
    assert (folder / "train.csv").exists()
