import numpy as np
import pytest


@pytest.fixture(scope="module")
def walker_ws(tmp_path_factory):
    import jax
    from controllable_agent_tpu.train.loops import OnlineTrainer
    from controllable_agent_tpu.train.workspace import (
        Workspace, WorkspaceConfig)

    cfg = WorkspaceConfig(
        agent_name="fb_ddpg", task="walker_stand",
        goal_space="walker_pos_speed_z", episode_length=15, num_envs=2,
        replay_buffer_episodes=8, num_seed_frames=30,
        folder=str(tmp_path_factory.mktemp("demo_ws")), use_console=False)
    ws = Workspace(cfg, agent_cfg_overrides=[
        "batch_size=16", "z_dim=8", "hidden_dim=32", "feature_dim=16",
        "backward_hidden_dim=32"])
    collector = OnlineTrainer(ws.env, ws.agent, ws.buffer, num_envs=2,
                              goal_fn=ws.goal_fn, updates_per_step=0.0)
    for i in range(2):
        ws.agent_state, _ = collector.run_cycle(ws.agent_state,
                                                jax.random.key(i))
    return ws


def test_demo_engine_equation_to_rollout(walker_ws, tmp_path) -> None:
    from controllable_agent_tpu.demo.core import DemoEngine

    eng = DemoEngine(walker_ws, num_inference_steps=64)
    out = eng.run("vx", num_steps=12)
    assert out["equation"] == "vx"
    assert out["steps"] >= 1
    assert np.isfinite(out["reward"])
    # z inference is deterministic given the cached precompute
    z1 = np.asarray(eng.infer_z("up"))
    z2 = np.asarray(eng.infer_z("up"))
    np.testing.assert_allclose(z1, z2)
    assert abs(np.linalg.norm(z1) - np.sqrt(z1.size)) < 1e-3
    # different equations -> different z directions (almost surely)
    z3 = np.asarray(eng.infer_z("-vx"))
    assert not np.allclose(z1, z3)


def test_demo_engine_rejects_injection(walker_ws) -> None:
    from controllable_agent_tpu.demo.core import DemoEngine

    eng = DemoEngine(walker_ws, num_inference_steps=32)
    with pytest.raises(ValueError, match="not allowed"):
        eng.run("__import__('os').system('true')")
    with pytest.raises(ValueError, match="not allowed"):
        eng.run("open('/etc/passwd')")


def test_demo_engine_video(walker_ws, tmp_path) -> None:
    from controllable_agent_tpu.demo.core import DemoEngine

    eng = DemoEngine(walker_ws, num_inference_steps=32)
    out = eng.run("up", num_steps=8,
                  video_path=str(tmp_path / "rollout.mp4"))
    assert out.get("video") is not None
    import os
    assert os.path.getsize(out["video"]) > 0
