"""Eval observability wiring: video + physics stats + FB diagnostics in the
eval dump (reference pretrain.py:374-435), SVD eval-meta dispatch
(pretrain.py:177-180), generic infer_meta fallback (:184-186), wandb sink
(logger.py:129-140)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.train.workspace import (Workspace,
                                                    WorkspaceConfig)

_SMALL_FB = [
    "hidden_dim=32", "backward_hidden_dim=32", "feature_dim=16",
    "z_dim=8", "batch_size=16", "num_inference_steps=32",
]


def _make_ws(tmp_path, agent_name="fb_ddpg", extra=(), agent_extra=(),
             task="walker_walk", goal_space="simplified_walker"):
    cfg = WorkspaceConfig(
        agent_name=agent_name, task=task, goal_space=goal_space,
        episode_length=10, num_eval_episodes=2,
        folder=str(tmp_path / "xp"), use_console=False)
    if extra:
        import dataclasses
        overrides = {}
        for kv in extra:
            k, v = kv.split("=", 1)
            overrides[k] = (v.lower() == "true"
                            if v.lower() in ("true", "false") else v)
        cfg = dataclasses.replace(cfg, **overrides)
    return Workspace(cfg, agent_cfg_overrides=list(_SMALL_FB) + list(agent_extra))


def _fill_buffer(ws, episodes=3) -> None:
    rng = np.random.RandomState(0)
    T = ws.env.spec.episode_length
    spec = ws.env.spec
    phys_dim = ws.env.reset(jax.random.key(0))[1].physics.shape[-1]
    for _ in range(episodes):
        ep = {
            "observation": rng.randn(T + 1, spec.obs_dim).astype(np.float32),
            "action": rng.uniform(-1, 1, (T + 1, spec.action_dim)).astype(np.float32),
            "reward": rng.rand(T + 1, 1).astype(np.float32),
            "discount": np.ones((T + 1, 1), np.float32),
            "physics": rng.randn(T + 1, phys_dim).astype(np.float32) * 0.3,
        }
        if ws.goal_fn is not None:
            ep["goal"] = np.asarray(ws.goal_fn(jnp.asarray(ep["physics"])))
        ws.buffer.add_episode(ep)


def test_eval_dump_video_physics_and_fb_diagnostics(tmp_path) -> None:
    """One eval produces: a video file, phys_* stats, z_correl,
    actor_success, z_norm and reward std — the reference's full eval row
    (pretrain.py:404-435)."""
    ws = _make_ws(tmp_path, agent_extra=["additional_metric=true"])
    metrics = ws.evaluate()
    assert "z_norm" in metrics
    assert "episode_reward#std" in metrics
    assert "z_correl" in metrics and np.isfinite(metrics["z_correl"])
    assert "actor_success" in metrics and 0.0 <= metrics["actor_success"] <= 1.0
    phys_keys = [k for k in metrics if k.startswith("phys_")]
    assert any(k.startswith("phys_up_") for k in phys_keys)
    assert any(k.endswith("_mean") for k in phys_keys)
    videos = list((tmp_path / "xp" / "eval_video").iterdir())
    assert len(videos) == 1 and videos[0].stat().st_size > 0
    # diagnostics are OFF without additional_metric (reference default)
    ws2 = _make_ws(tmp_path / "b")
    m2 = ws2.evaluate()
    assert "z_correl" not in m2 and "actor_success" not in m2


def test_eval_video_disabled(tmp_path) -> None:
    ws = _make_ws(tmp_path, extra=["save_eval_video=false"])
    ws.evaluate()
    assert not (tmp_path / "xp" / "eval_video").exists() or not list(
        (tmp_path / "xp" / "eval_video").iterdir())


def test_sfsvd_eval_meta_dispatch(tmp_path) -> None:
    """SFSVD eval meta goes through the action-conditioned regression
    (reference pretrain.py:177-180) instead of silently falling through to
    a random z."""
    ws = _make_ws(tmp_path, agent_name="sf_svd", goal_space=None,
                  agent_extra=[])
    _fill_buffer(ws)
    calls = []
    orig = ws.agent.infer_meta_from_obs_action_and_rewards

    def spy(state, obs, action, reward):
        calls.append(obs.shape)
        return orig(state, obs, action, reward)

    ws.agent.infer_meta_from_obs_action_and_rewards = spy
    meta = ws._init_eval_meta()
    assert calls, "SVD regression path was not dispatched"
    assert meta[ws.agent.meta_key].shape == (ws.agent.cfg.z_dim,)


def test_generic_infer_meta_mixin(tmp_path) -> None:
    """agent.infer_meta(state, buffer, key) — the reference's generic
    fallback (pretrain.py:206, fb_ddpg.py:188-199)."""
    ws = _make_ws(tmp_path)
    _fill_buffer(ws)
    meta = ws.agent.infer_meta(ws.agent_state, ws.buffer, jax.random.key(3))
    assert set(meta) == {"z"}
    assert meta["z"].shape == (ws.agent.cfg.z_dim,)
    # empty buffer -> random init meta, not a crash
    ws2 = _make_ws(tmp_path / "b")
    meta2 = ws2.agent.infer_meta(ws2.agent_state, ws2.buffer,
                                 jax.random.key(4))
    assert meta2["z"].shape == (ws2.agent.cfg.z_dim,)


def test_update_meta_resample_no_host_loop(tmp_path) -> None:
    """update_meta resamples on schedule; the decision is a device op
    (jitted _maybe_resample_z), not a python float() sync."""
    from controllable_agent_tpu.agents import FBDDPGAgent, FBDDPGConfig
    agent = FBDDPGAgent(FBDDPGConfig(z_dim=8, hidden_dim=32,
                                     backward_hidden_dim=32, feature_dim=16,
                                     update_z_every_step=5,
                                     update_z_proba=1.0),
                        obs_dim=4, action_dim=2)
    state = agent.init(jax.random.key(0))
    meta = agent.init_meta(state, jax.random.key(1))
    same = agent.update_meta(state, meta, 3, jax.random.key(2))
    assert same is meta  # off-schedule: untouched
    new = agent.update_meta(state, meta, 5, jax.random.key(2))
    assert not np.allclose(np.asarray(new["z"]), np.asarray(meta["z"]))
    # proba=0 keeps z even on schedule
    agent0 = FBDDPGAgent(FBDDPGConfig(z_dim=8, hidden_dim=32,
                                      backward_hidden_dim=32, feature_dim=16,
                                      update_z_every_step=5,
                                      update_z_proba=0.0),
                         obs_dim=4, action_dim=2)
    kept = agent0.update_meta(state, meta, 5, jax.random.key(2))
    assert np.allclose(np.asarray(kept["z"]), np.asarray(meta["z"]))


def test_wandb_sink(tmp_path, monkeypatch) -> None:
    """use_wandb=True drives a real wandb.log call sequence (fake module —
    the package is not installed here; reference logger.py:129-140)."""
    from controllable_agent_tpu.train.logger import Logger

    logged = []
    fake = types.ModuleType("wandb")
    fake.run = None

    def init(**kwargs):
        fake.run = object()
    fake.init = init
    fake.log = lambda data, step=None: logged.append((data, step))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    logger = Logger(tmp_path, use_console=False, use_wandb=True,
                    wandb_config={"task": "walker_walk"})
    logger.log("eval/episode_reward", 7.5, step=10)
    assert logged == [({"eval/episode_reward": 7.5}, 10)]
    assert fake.run is not None
