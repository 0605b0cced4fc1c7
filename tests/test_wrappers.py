import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.envs.pointmass import PointMassMaze
from controllable_agent_tpu.envs.wrappers import (
    ActionRepeatWrapper,
    FrameStackWrapper,
    GoalAppendWrapper,
    StatefulEnv,
)


def test_action_repeat_sums_rewards() -> None:
    env = ActionRepeatWrapper(PointMassMaze("reach_top_left",
                                            episode_length=100), 4)
    state, ts = env.reset(jax.random.key(0))
    state, ts = env.step(state, jnp.asarray([0.5, -0.5]))
    # inner env advanced 4 steps
    assert int(state.t) == 4
    assert np.isfinite(float(ts.reward))


def test_frame_stack() -> None:
    base = PointMassMaze("reach_top_left", episode_length=100)
    env = FrameStackWrapper(base, 3)
    assert env.spec.obs_dim == 12
    state, ts = env.reset(jax.random.key(0))
    assert ts.observation.shape == (12,)
    first_obs = np.asarray(ts.observation)
    # reset stacks the same frame 3x
    np.testing.assert_allclose(first_obs[:4], first_obs[4:8])
    state, ts = env.step(state, jnp.asarray([1.0, 0.0]))
    obs = np.asarray(ts.observation)
    # newest frame is at the end and differs from the oldest
    assert not np.allclose(obs[:4], obs[8:])


def test_goal_append() -> None:
    base = PointMassMaze("reach_top_left", episode_length=100)
    env = GoalAppendWrapper(base, lambda p: p[..., :2],
                            append_goal_to_observation=True)
    assert env.spec.obs_dim == 6
    assert env.spec.goal_dim == 2
    state, ts = env.reset(jax.random.key(0))
    assert ts.observation.shape == (6,)
    np.testing.assert_allclose(np.asarray(ts.goal),
                               np.asarray(ts.physics[:2]))
    # wrapped env still vmaps
    keys = jax.random.split(jax.random.key(1), 4)
    _, tsb = jax.vmap(env.reset)(keys)
    assert tsb.observation.shape == (4, 6)


def test_stateful_adapter() -> None:
    env = StatefulEnv(PointMassMaze("reach_top_left", episode_length=10))
    ts = env.reset()
    assert ts.observation.shape == (4,)
    for _ in range(3):
        ts = env.step([0.3, 0.3])
    assert np.isfinite(np.asarray(ts.observation)).all()


def test_append_goal_to_observation_workspace(tmp_path) -> None:
    """Workspace-level goal append (reference append_goal_to_observation,
    pretrain.py:71): obs grows by goal_dim and training runs."""
    from controllable_agent_tpu.pretrain import build_workspace

    ws = build_workspace([
        "agent=fb_ddpg", "task=point_mass_maze_reach_top_left",
        "goal_space=simplified_point_mass_maze",
        "append_goal_to_observation=true", "episode_length=20",
        f"folder={tmp_path}", "use_console=false", "final_tests=0",
        "agent.hidden_dim=32", "agent.backward_hidden_dim=32",
        "agent.feature_dim=16", "agent.z_dim=8", "agent.batch_size=16",
    ])
    assert ws.env.spec.obs_dim == 4 + 2  # pointmass obs + 2-d goal space
    import jax
    _, ts = ws.env.reset(jax.random.key(0))
    assert ts.observation.shape == (6,)
    assert ts.goal.shape == (2,)
