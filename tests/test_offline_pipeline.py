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
