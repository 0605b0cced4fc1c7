import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.envs import locomotion
from controllable_agent_tpu.envs.locomotion import (
    WALKER_INIT_Z,
    WALKER_STAND_HEIGHT,
    LocomotionEnv,
)


@pytest.fixture(scope="module")
def walker() -> LocomotionEnv:
    return locomotion.make("walker_stand", episode_length=100)


def test_obs_dims(walker: LocomotionEnv) -> None:
    assert walker.spec.obs_dim == 24  # 14 orientations + height + 9 qvel
    assert walker.spec.action_dim == 6
    cheetah = locomotion.make("cheetah_run")
    assert cheetah.spec.obs_dim == 17  # 8 qpos[1:] + 9 qvel
    hopper = locomotion.make("hopper_hop")
    assert hopper.spec.obs_dim == 15  # 6 + 7 + 2 touch


def test_reset_and_step_shapes(walker: LocomotionEnv) -> None:
    state, ts = walker.reset(jax.random.key(0))
    assert ts.observation.shape == (24,)
    assert ts.physics.shape == (18,)
    state, ts = walker.step(state, jnp.zeros(6))
    assert ts.observation.shape == (24,)
    assert np.isfinite(np.asarray(ts.observation)).all()
    assert 0.0 <= float(ts.reward) <= 1.0


def test_walker_falls_without_control(walker: LocomotionEnv) -> None:
    state, ts = walker.reset(jax.random.key(3))
    step = jax.jit(walker.step)
    for _ in range(60):
        state, ts = step(state, jnp.zeros(6))
    z = float(state.q[1])
    assert z < WALKER_INIT_Z  # gravity pulled it down
    assert z > 0.0  # ground contact held it above the floor
    assert np.isfinite(np.asarray(state.q)).all()


def test_stand_reward_semantics(walker: LocomotionEnv) -> None:
    ndof = walker.model.ndof
    # upright at stand height, zero velocity -> reward 1
    q = np.zeros(ndof, np.float32)
    q[1] = WALKER_STAND_HEIGHT + 0.1
    phys = jnp.asarray(np.concatenate([q, np.zeros(ndof)]))
    r_stand = float(walker.reward_from_physics(phys))
    assert r_stand > 0.95
    # lying on the ground -> low reward
    q_low = q.copy()
    q_low[1] = 0.2
    q_low[2] = np.pi / 2
    phys_low = jnp.asarray(np.concatenate([q_low, np.zeros(ndof)]))
    assert float(walker.reward_from_physics(phys_low)) < 0.4


def test_walk_reward_needs_speed() -> None:
    env = locomotion.make("walker_walk")
    ndof = env.model.ndof
    q = np.zeros(ndof, np.float32)
    q[1] = WALKER_STAND_HEIGHT + 0.1
    qd_still = np.zeros(ndof, np.float32)
    qd_move = np.zeros(ndof, np.float32)
    qd_move[0] = 2.0  # forward at 2 m/s > walk speed 1
    r_still = float(env.reward_from_physics(
        jnp.asarray(np.concatenate([q, qd_still]))))
    r_move = float(env.reward_from_physics(
        jnp.asarray(np.concatenate([q, qd_move]))))
    assert r_move > r_still
    assert r_move > 0.95


def test_cheetah_run_direction() -> None:
    fwd = locomotion.make("cheetah_run")
    bwd = locomotion.make("cheetah_run_backward")
    ndof = fwd.model.ndof
    q = np.zeros(ndof, np.float32)
    q[1] = 0.7
    qd = np.zeros(ndof, np.float32)
    qd[0] = 10.0
    phys = jnp.asarray(np.concatenate([q, qd]))
    assert float(fwd.reward_from_physics(phys)) > 0.95
    assert float(bwd.reward_from_physics(phys)) < 0.05


def test_goal_features_layout(walker: LocomotionEnv) -> None:
    ndof = walker.model.ndof
    q = np.zeros(ndof, np.float32)
    q[0], q[1], q[2] = 1.5, 1.3, 0.0
    qd = np.zeros(ndof, np.float32)
    qd[0] = 2.0
    feats = np.asarray(walker.goal_features(
        jnp.asarray(np.concatenate([q, qd]))))
    assert feats.shape == (6,)
    assert feats[0] == pytest.approx(1.5)  # x
    assert feats[1] == pytest.approx(1.3)  # z
    assert feats[2] == pytest.approx(1.0)  # up
    assert feats[3] == pytest.approx(2.0, rel=1e-3)  # vx (COM)
    # batched
    batch = np.tile(np.concatenate([q, qd]), (5, 1))
    out = np.asarray(walker.goal_features(jnp.asarray(batch)))
    assert out.shape == (5, 6)


def test_vmapped_episode_deterministic(walker: LocomotionEnv) -> None:
    n = 4
    keys = jax.random.split(jax.random.key(0), n)
    reset = jax.jit(jax.vmap(walker.reset))
    step = jax.jit(jax.vmap(walker.step))

    def run() -> np.ndarray:
        states, ts = reset(keys)
        for i in range(5):
            states, ts = step(states, jnp.zeros((n, 6)))
        return np.asarray(ts.observation)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()


def test_task_reward_factory() -> None:
    from controllable_agent_tpu.goals import get_reward_function
    reward = get_reward_function("walker_walk")
    ndof = 9
    q = np.zeros(ndof, np.float32)
    q[1] = 1.3
    qd = np.zeros(ndof, np.float32)
    qd[0] = 2.0
    phys = np.concatenate([q, qd])
    r = reward.from_physics(np.tile(phys, (3, 1)))
    assert r.shape == (3,)
    assert (r > 0.9).all()
    g = reward.get_goal("simplified_walker")
    np.testing.assert_allclose(g, [1.2, 1.0, 2.0])


def test_walker_equation_reward() -> None:
    from controllable_agent_tpu.goals import WalkerEquation
    eq = WalkerEquation("vx > 1")
    ndof = 9
    q = np.zeros(ndof, np.float32)
    qd = np.zeros(ndof, np.float32)
    qd[0] = 2.0
    out = eq.from_physics(np.tile(np.concatenate([q, qd]), (2, 1)))
    np.testing.assert_allclose(out, [1.0, 1.0])
