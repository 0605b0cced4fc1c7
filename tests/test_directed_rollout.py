"""Directed-rollout mix: held task-z episodes in the online loop
(workspace.rollout_task_z_ratio; reference analogue is the solved_meta
rollout hook, url_benchmark/agent/fb_ddpg.py:234-237, never enabled
there for FB)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.agents import FBDDPGAgent, FBDDPGConfig
from controllable_agent_tpu.envs.pointmass import PointMassMaze
from controllable_agent_tpu.train.loops import make_episode_collector
from controllable_agent_tpu.train.workspace import (
    TrainOnlineWorkspace,
    WorkspaceConfig,
)

_SMALL = dict(hidden_dim=32, backward_hidden_dim=32, feature_dim=16, z_dim=8,
              batch_size=32)


def test_hold_meta_keeps_z_for_the_whole_episode() -> None:
    env = PointMassMaze("reach_top_left", episode_length=10)
    agent = FBDDPGAgent(FBDDPGConfig(**_SMALL), obs_dim=4, action_dim=2)
    state = agent.init(jax.random.key(0))
    z = jnp.tile(jnp.arange(8, dtype=jnp.float32)[None], (3, 1))
    meta = {"z": z}
    keys = jax.random.split(jax.random.key(2), 3)

    held = make_episode_collector(env, agent, num_envs=3, hold_meta=True)
    traj = held(state, meta, keys, jnp.asarray(0), jax.random.key(3))
    # every stored per-step z equals the provided one, no resampling
    np.testing.assert_allclose(np.asarray(traj["z"]),
                               np.broadcast_to(np.asarray(z)[None],
                                               traj["z"].shape))

    free = make_episode_collector(env, agent, num_envs=3, hold_meta=False)
    traj2 = free(state, meta, keys, jnp.asarray(0), jax.random.key(3))
    # default FB rollout resamples at t % update_z_every_step == 0 (t=0),
    # so the provided z does NOT survive
    assert not np.allclose(np.asarray(traj2["z"][1:]),
                           np.broadcast_to(np.asarray(z)[None],
                                           traj2["z"][1:].shape))


def test_train_online_directed_mix_runs(tmp_path) -> None:
    cfg = WorkspaceConfig(
        agent_name="fb_ddpg", task="walker_stand", episode_length=20,
        num_rollout_episodes=4, num_agent_updates=2,
        num_train_frames=20 * 4 * 3, num_seed_frames=20 * 4,
        eval_every_steps=10 ** 9, checkpoint_every=10 ** 9,
        replay_buffer_episodes=32, final_tests=0, save_eval_video=False,
        rollout_task_z_ratio=0.5,
        rollout_task_z_tasks="walker_stand,walker_walk",
        task_z_refresh_frames=1, z_inference_draws=1,
        folder=str(tmp_path), use_console=False)
    ws = TrainOnlineWorkspace(cfg, agent_cfg_overrides=[
        f"{k}={v}" for k, v in _SMALL.items()])
    ws.train()
    assert ws.global_episode == 12  # 3 cycles x (2 random + 2 directed)
    assert len(ws.buffer) == 12
    # the directed z's came from reward regression once past seed frames
    train_csv = (ws.work_dir / "train.csv").read_text()
    assert "task_episode_reward" in train_csv


def test_ratio_zero_is_the_plain_loop(tmp_path) -> None:
    cfg = WorkspaceConfig(
        agent_name="fb_ddpg", task="walker_stand", episode_length=20,
        num_rollout_episodes=2, num_agent_updates=1,
        num_train_frames=20 * 2 * 2, num_seed_frames=0,
        eval_every_steps=10 ** 9, checkpoint_every=10 ** 9,
        replay_buffer_episodes=8, final_tests=0, save_eval_video=False,
        folder=str(tmp_path), use_console=False)
    ws = TrainOnlineWorkspace(cfg, agent_cfg_overrides=[
        f"{k}={v}" for k, v in _SMALL.items()])
    ws.train()
    assert ws.global_episode == 4
    assert len(ws.buffer) == 4
