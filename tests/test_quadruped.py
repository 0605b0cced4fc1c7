import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.envs import physics3d as p3d
from controllable_agent_tpu.envs import quadruped
from controllable_agent_tpu.envs.quadruped import _INIT_Z, QuadrupedEnv


def test_euler_rot_identity_and_orthonormal() -> None:
    np.testing.assert_allclose(np.asarray(p3d._euler_rot(jnp.zeros(3))),
                               np.eye(3), atol=1e-6)
    r = np.asarray(p3d._euler_rot(jnp.asarray([0.3, -0.7, 1.2])))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_axis_rot() -> None:
    r = np.asarray(p3d._axis_rot(jnp.asarray([0.0, 0.0, 1.0]),
                                 jnp.asarray(np.pi / 2)))
    np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1, 0],
                               atol=1e-6)


def test_3d_free_fall() -> None:
    model = quadruped.quadruped_model()
    q = jnp.zeros(model.ndof).at[2].set(5.0)  # high above ground
    qd = jnp.zeros(model.ndof)
    qdd, _ = p3d.forward_dynamics(model, q, qd, jnp.zeros(8))
    np.testing.assert_allclose(float(qdd[2]), -p3d.GRAVITY, rtol=1e-3)
    # no lateral acceleration in symmetric free fall
    assert abs(float(qdd[0])) < 1e-3 and abs(float(qdd[1])) < 1e-3


def test_body_omega_matches_root_rates_at_identity() -> None:
    model = quadruped.quadruped_model()
    q = jnp.zeros(model.ndof)
    qd = jnp.zeros(model.ndof).at[5].set(1.0)  # yaw rate
    w = np.asarray(p3d.body_omegas(model, q, qd))
    np.testing.assert_allclose(w[0], [0.0, 0.0, 1.0], atol=1e-5)


def test_mass_matrix_spd() -> None:
    model = quadruped.quadruped_model()
    q = jnp.zeros(model.ndof).at[2].set(0.5).at[7].set(0.4)
    m = np.asarray(p3d.mass_matrix(model, q))
    np.testing.assert_allclose(m, m.T, atol=1e-4)
    assert np.linalg.eigvalsh(m).min() > 0


def test_quadruped_settles_on_ground() -> None:
    env = QuadrupedEnv("stand", episode_length=100)
    state, ts = env.reset(jax.random.key(0))
    step = jax.jit(env.step)
    for _ in range(40):
        state, ts = step(state, jnp.zeros(8))
    z = float(state.q[2])
    assert 0.05 < z < _INIT_Z + 0.1  # dropped but held above ground
    assert np.isfinite(np.asarray(state.q)).all()
    assert float(state.touch.max()) > 0  # feet touched down


def test_stand_reward_semantics() -> None:
    env = QuadrupedEnv("stand")
    ndof = env.model.ndof
    q_up = np.zeros(ndof, np.float32)
    q_up[2] = 0.5
    phys_up = jnp.asarray(np.concatenate([q_up, np.zeros(ndof)]))
    assert float(env.reward_from_physics(phys_up)) == pytest.approx(1.0)
    q_tipped = q_up.copy()
    q_tipped[3] = np.pi  # rolled onto its back
    phys_tipped = jnp.asarray(np.concatenate([q_tipped, np.zeros(ndof)]))
    assert float(env.reward_from_physics(phys_tipped)) < 0.1


def test_run_and_jump_rewards() -> None:
    run = QuadrupedEnv("run")
    jump = QuadrupedEnv("jump")
    ndof = run.model.ndof
    q = np.zeros(ndof, np.float32)
    q[2] = 0.5
    qd = np.zeros(ndof, np.float32)
    qd[0] = 5.0
    phys = jnp.asarray(np.concatenate([q, qd]))
    assert float(run.reward_from_physics(phys)) > 0.95
    q_high = q.copy()
    q_high[2] = 1.2
    assert float(jump.reward_from_physics(
        jnp.asarray(np.concatenate([q_high, np.zeros(ndof)])))) > 0.95


def test_goal_spaces_and_rewards() -> None:
    from controllable_agent_tpu.goals import get_reward_function, goal_spaces
    env = QuadrupedEnv("stand")
    ndof = env.model.ndof
    q = np.zeros(ndof, np.float32)
    q[0], q[1], q[2] = 1.0, -2.0, 0.5
    qd = np.zeros(ndof, np.float32)
    qd[0] = 0.6
    phys = np.concatenate([q, qd])
    feats = env.goal_features(jnp.asarray(phys))
    sq = goal_spaces.funcs["quadruped"]["simplified_quadruped"](feats)
    np.testing.assert_allclose(np.asarray(sq), [1.0, 0.6], atol=1e-4)
    qps = goal_spaces.funcs["quadruped"]["quad_pos_speed"](feats)
    assert qps.shape == (7,)
    # factory rewards
    r = get_reward_function("quadruped_stand")
    assert float(r.from_physics(phys)) == pytest.approx(1.0)
    mix = get_reward_function("quadruped_mix", seed=3)
    vals = mix.from_physics(np.tile(phys, (4, 1)))
    assert vals.shape == (4,) and np.isfinite(vals).all()
    pos = get_reward_function("quadruped_position", seed=0)
    g = pos.get_goal("quad_pos_speed")
    assert g.shape == (7,)
    assert np.isfinite(float(pos.from_physics(phys)))


def test_vmapped_episode() -> None:
    env = QuadrupedEnv("walk", episode_length=5)
    keys = jax.random.split(jax.random.key(0), 3)
    states, ts = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for _ in range(3):
        states, ts = step(states, jnp.zeros((3, 8)))
    assert ts.observation.shape == (3, 29)
    assert np.isfinite(np.asarray(ts.observation)).all()
