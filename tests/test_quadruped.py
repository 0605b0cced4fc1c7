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
    # strip the position servos: zero action means "servo to stance", which
    # exerts internal torques that accelerate the root dof
    model = quadruped.quadruped_model().replace(
        servo_gain=None, servo_center=None, servo_half=None)
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
    assert ts.observation.shape == (3, 37)
    assert np.isfinite(np.asarray(ts.observation)).all()

def test_escape_env() -> None:
    env = quadruped.make("quadruped_escape", episode_length=50)
    state, ts = env.reset(jax.random.key(0))
    assert ts.observation.shape == (env.spec.obs_dim,) == (60,)
    step = jax.jit(env.step)
    rewards = []
    for i in range(30):
        a = jax.random.uniform(jax.random.fold_in(jax.random.key(1), i),
                               (8,), minval=-1, maxval=1)
        state, ts = step(state, a)
        rewards.append(float(ts.reward))
    obs = np.asarray(ts.observation)
    assert np.isfinite(obs).all()
    assert 0.0 <= min(rewards) and max(rewards) <= 1.0
    # rangefinder readings live in (0, 1]
    rf = obs[-quadruped._N_RANGEFINDERS:]
    assert (rf > 0).all() and (rf <= 1.0).all()
    # relabel from stored physics reproduces the env reward
    assert float(env.reward_from_physics(ts.physics)) == pytest.approx(
        rewards[-1], abs=1e-5)
    # far outside the terrain the escape reward saturates to upright
    phys = np.asarray(ts.physics).copy()
    phys[0] = 2 * quadruped._TERRAIN_HALF
    phys[3:6] = 0.0
    assert float(env.reward_from_physics(jnp.asarray(phys))) > 0.95


def test_escape_terrain_generation() -> None:
    terrain = quadruped.generate_terrain(jax.random.key(0))
    t = np.asarray(terrain)
    assert t.shape == (quadruped._TERRAIN_RES, quadruped._TERRAIN_RES)
    assert t.min() >= 0.0 and t.max() <= quadruped._TERRAIN_ZMAX
    # bowl: centre low, rim high on average
    c = quadruped._TERRAIN_RES // 2
    assert t[c, c] < t[5, :].mean()
    # different keys -> different terrain
    t2 = np.asarray(quadruped.generate_terrain(jax.random.key(1)))
    assert np.abs(t - t2).max() > 0.01


def test_fetch_env() -> None:
    env = quadruped.make("quadruped_fetch", episode_length=50)
    state, ts = env.reset(jax.random.key(0))
    assert ts.observation.shape == (env.spec.obs_dim,) == (49,)
    assert ts.physics.shape == (env.spec.physics_dim,)
    v0 = float(jnp.linalg.norm(state.ball_vel))
    step = jax.jit(env.step)
    for i in range(120):
        a = jax.random.uniform(jax.random.fold_in(jax.random.key(1), i),
                               (8,), minval=-1, maxval=1)
        state, ts = step(state, a)
    assert np.isfinite(np.asarray(ts.observation)).all()
    # ball fell from 2 m, bounced, and is rolling near the floor without
    # gaining energy (contact model is dissipative)
    assert 0.05 < float(state.ball_pos[2]) < 0.5
    assert float(jnp.linalg.norm(state.ball_vel)) < v0 + 1.0
    assert 0.0 <= float(ts.reward) <= 1.0
    assert float(env.reward_from_physics(ts.physics)) == pytest.approx(
        float(ts.reward), abs=1e-5)
    # ball on target under an upright torso -> high reward
    ndof = env.model.ndof
    phys = np.zeros(env.spec.physics_dim, np.float32)
    phys[2] = 0.5  # torso at stand height over the origin
    phys[2 * ndof + 2] = quadruped._BALL_RADIUS  # ball at origin
    assert float(env.reward_from_physics(jnp.asarray(phys))) > 0.9


def test_heightfield_interp_and_normal() -> None:
    data = jnp.zeros((5, 5)).at[:, 4].set(1.0)  # ramp column at x edge
    hf = p3d.Heightfield(data=data, half_size=2.0)
    assert float(p3d.hf_height(hf, jnp.zeros(2))) == pytest.approx(0.0)
    assert float(p3d.hf_height(hf, jnp.asarray([2.0, 0.0]))) == pytest.approx(1.0)
    assert float(p3d.hf_height(hf, jnp.asarray([1.5, 0.0]))) == pytest.approx(0.5)
    n = np.asarray(p3d.hf_normal(hf, jnp.asarray([1.5, 0.0])))
    assert n[2] > 0 and n[0] < 0  # slopes up along +x -> normal tips to -x
    np.testing.assert_allclose(np.linalg.norm(n), 1.0, atol=1e-5)


def test_fixed_base_root_immobile() -> None:
    model = quadruped.quadruped_model().replace(fixed_base=True)
    q = jnp.zeros(model.ndof).at[2].set(0.5)
    qd = jnp.zeros(model.ndof)
    q2, qd2, _ = p3d.step(model, q, qd, jnp.ones(8), 0.02, 4)
    np.testing.assert_allclose(np.asarray(q2[:6]), np.asarray(q[:6]),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(qd2[:6]), 0.0, atol=1e-7)
    assert np.abs(np.asarray(qd2[6:])).max() > 0  # joints still actuate


def test_quadruped_positions_goal_space() -> None:
    """quadruped_positions = (ball - target, torso - target) from the fetch
    env's extended goal features (reference goals.py:116-120,157-160)."""
    from controllable_agent_tpu.goals import spaces as gs

    env = quadruped.make("quadruped_fetch", episode_length=50)
    _, ts = env.reset(jax.random.key(0))
    feats = env.goal_features(ts.physics)
    assert feats.shape == (11,)
    g = np.asarray(gs.quadruped_positions(feats))
    assert g.shape == (6,)
    ndof = env.model.ndof
    np.testing.assert_allclose(g[:3], np.asarray(
        ts.physics[2 * ndof:2 * ndof + 3]), atol=1e-6)  # ball pos
    np.testing.assert_allclose(g[3:], np.asarray(ts.physics[:3]), atol=1e-6)
    # the registered goal: everything at the origin target
    _, goal_fn = gs.goals.lookup("quadruped_fetch")
    np.testing.assert_allclose(goal_fn(), np.zeros(6))


def test_actuator_filter() -> None:
    """Actions are low-passed exactly like the reference MJCF actuators
    (quadruped.xml:57 dyntype=filter dynprm=.1): a unit control step
    converges to the target with time constant 0.1 s, and the filter
    state is observable (last 8 obs entries)."""
    env = QuadrupedEnv("stand", episode_length=50)
    state, ts = env.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(ts.observation[-8:]), 0.0)
    step = jax.jit(env.step)
    a = jnp.ones(8)
    expected = 0.0
    decay = np.exp(-env.control_dt / quadruped._ACT_TAU)
    for _ in range(10):
        state, ts = step(state, a)
        expected = 1.0 + (expected - 1.0) * decay
        np.testing.assert_allclose(np.asarray(state.act),
                                   np.full(8, expected), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ts.observation[-8:]),
                               np.asarray(state.act), rtol=1e-6)
    assert 0.8 < expected < 0.9  # ~86% of the way after 0.2 s


def test_servo_stance_is_statically_stable() -> None:
    """action=0 commands a stance the robot can hold indefinitely (the
    reference's position-servo actuators make zero-control a stable pose;
    this is what makes the 14-dof walker explorable)."""
    env = quadruped.make("quadruped_stand")
    step = jax.jit(env.step)
    s, _ = env.reset(jax.random.PRNGKey(3))
    ts = None
    for _ in range(120):
        s, ts = step(s, jnp.zeros(8))
    up = float(env.goal_features(ts.physics)[0])
    z = float(s.q[2])
    assert up > 0.95, f"torso not level after zero-action hold: up={up}"
    assert z > 0.4, f"torso sank: z={z}"
    assert float(ts.reward) > 0.5
