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
