import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.envs import StepType, build_gridworld_task
from controllable_agent_tpu.envs.gridworld import OBS_AGENT_ONEHOT, OBS_AGENT_POS


def test_reset_and_obs() -> None:
    env = build_gridworld_task("simple")
    state, ts = env.reset(jax.random.key(0))
    assert int(ts.step_type) == StepType.FIRST
    assert ts.observation.shape == (2,)
    np.testing.assert_allclose(np.asarray(ts.observation), [2 / 9, 2 / 10])


def test_walls_block_movement() -> None:
    env = build_gridworld_task("simple")
    state, _ = env.reset(jax.random.key(0))
    # moving up twice from (2,2) hits the wall at row 0
    state, ts = env.step(state, jnp.asarray(0))
    state, ts = env.step(state, jnp.asarray(0))
    assert tuple(np.asarray(state.pos)) == (1, 2)
    assert float(ts.reward) == 0.0


def test_goal_reward_obstacle() -> None:
    env = build_gridworld_task("obstacle")
    state, _ = env.reset(jax.random.key(0))
    # obstacle task has fixed goal at (2, 8); walk there: right 6, no wall on row 2
    # path: from (2,2) go up to (1,2) then right along row 1? row1 has wall at x=6.
    # use known-clear route: (2,2) -> (2,3) is free, (2,4) wall.
    state, ts = env.step(state, jnp.asarray(1))
    assert tuple(np.asarray(state.pos)) == (2, 3)


def test_episode_terminates_at_max_length() -> None:
    env = build_gridworld_task("simple", max_episode_length=5)
    state, ts = env.reset(jax.random.key(0))
    for _ in range(5):
        state, ts = env.step(state, jnp.asarray(4))
    assert int(ts.step_type) == StepType.LAST


def test_deterministic_trajectories() -> None:
    """Bit-exact determinism under fixed seed (BASELINE.md north star)."""
    env = build_gridworld_task("simple")

    def rollout(seed: int) -> np.ndarray:
        key = jax.random.key(seed)
        state, ts = env.reset(key)
        obs = [np.asarray(ts.observation)]
        for i in range(50):
            key, sub = jax.random.split(key)
            a = jax.random.randint(sub, (), 0, 5)
            state, ts = env.step(state, a)
            obs.append(np.asarray(ts.observation))
        return np.stack(obs)

    np.testing.assert_array_equal(rollout(3), rollout(3))
    assert not np.array_equal(rollout(3), rollout(4))


def test_randomize_goals_depends_on_key() -> None:
    env = build_gridworld_task("simple")
    s1, _ = env.reset(jax.random.key(0))
    goals = {tuple(np.asarray(env.reset(jax.random.key(i))[0].goal))
             for i in range(20)}
    assert len(goals) > 3  # goal randomization draws different cells
    # goal is never the start state or a wall
    layout = np.asarray(env.layout)
    for g in goals:
        assert layout[g] == 0 and g != (2, 2)


def test_vmapped_stepping() -> None:
    env = build_gridworld_task("simple")
    n = 16
    keys = jax.random.split(jax.random.key(0), n)
    states, ts = jax.vmap(env.reset)(keys)
    assert ts.observation.shape == (n, 2)
    actions = jnp.ones((n,), jnp.int32)
    states, ts = jax.jit(jax.vmap(env.step))(states, actions)
    assert ts.observation.shape == (n, 2)
    np.testing.assert_array_equal(np.asarray(states.pos[:, 1]), 3)


def test_onehot_obs_and_goal_obs() -> None:
    env = build_gridworld_task("obstacle", observation_type=OBS_AGENT_ONEHOT)
    state, ts = env.reset(jax.random.key(0))
    obs = np.asarray(ts.observation)
    assert obs.shape == (90,)
    assert obs.sum() == 1.0 and obs[2 * 10 + 2] == 1.0
    goal_obs = np.asarray(env.get_goal_obs(state))
    assert goal_obs.sum() == 1.0 and goal_obs[2 * 10 + 8] == 1.0


def test_grid_and_agent_goal_pos_observation_types() -> None:
    import jax
    import numpy as np
    from controllable_agent_tpu.envs.gridworld import (
        OBS_AGENT_GOAL_POS, OBS_GRID, build_gridworld_task)

    env = build_gridworld_task("simple", observation_type=OBS_GRID)
    n = env.n_states
    assert env.spec.obs_dim == 3 * n
    state, ts = env.reset(jax.random.key(0))
    obs = np.asarray(ts.observation).reshape(env.shape + (3,))
    # channel 0 = walls, 1 = agent (exactly one), 2 = goal (exactly one)
    np.testing.assert_array_equal(obs[..., 0],
                                  np.asarray(env.layout) < 0)
    assert obs[..., 1].sum() == 1.0 and obs[..., 2].sum() == 1.0
    ay, ax = np.argwhere(obs[..., 1])[0]
    assert (ay, ax) == tuple(np.asarray(state.pos))
    # goal obs: agent channel sits on the goal cell
    gobs = np.asarray(env.get_goal_obs(state)).reshape(env.shape + (3,))
    gy, gx = np.argwhere(gobs[..., 1])[0]
    assert (gy, gx) == tuple(np.asarray(state.goal))

    env2 = build_gridworld_task("simple",
                                observation_type=OBS_AGENT_GOAL_POS)
    assert env2.spec.obs_dim == 4
    state2, ts2 = env2.reset(jax.random.key(0))
    np.testing.assert_array_equal(
        np.asarray(ts2.observation),
        np.concatenate([np.asarray(state2.pos), np.asarray(state2.goal)]))


def test_render_rgb() -> None:
    """GL-free render path (reference env.py:359-381 matplotlib render)."""
    import numpy as np
    from controllable_agent_tpu.envs.gridworld import build_gridworld_task
    import jax
    env = build_gridworld_task("obstacle")
    state, _ = env.reset(jax.random.PRNGKey(0))
    img = env.render(state, cell_px=8)
    h, w = env.shape
    assert img.shape == (h * 8, w * 8, 3) and img.dtype == np.uint8
    # agent / goal / wall colors all present
    flat = img.reshape(-1, 3)
    for color in ((235, 137, 33), (60, 180, 75), (40, 40, 40)):
        assert (flat == np.asarray(color, np.uint8)).all(1).any(), color
