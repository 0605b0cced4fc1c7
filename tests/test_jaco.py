import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.envs import jaco


def test_jaco_reset_and_spec() -> None:
    env = jaco.make("jaco_reach_top_left", episode_length=50)
    state, ts = env.reset(jax.random.key(0))
    assert ts.observation.shape == (env.spec.obs_dim,) == (24,)
    assert ts.physics.shape == (env.spec.physics_dim,) == (27,)
    tcp = np.asarray(jaco.tcp_position(env.model, state.q))
    # tcp spawns over the table inside the reference's spawn bbox
    assert -0.25 < tcp[0] < 0.25 and -0.25 < tcp[1] < 0.25
    assert 0.0 < tcp[2] < 0.45


def test_jaco_step_stable_and_relabel() -> None:
    env = jaco.make("jaco_reach_bottom_right", episode_length=50)
    state, ts = env.reset(jax.random.key(0))
    step = jax.jit(env.step)
    for i in range(40):
        a = jax.random.uniform(jax.random.fold_in(jax.random.key(1), i),
                               (6,), minval=-1, maxval=1)
        state, ts = step(state, a)
    assert np.isfinite(np.asarray(ts.observation)).all()
    assert float(jnp.abs(state.qd).max()) < 30.0
    assert 0.0 <= float(ts.reward) <= 1.0
    # fixed base never moves
    np.testing.assert_allclose(np.asarray(state.q[:6]),
                               np.asarray([*jaco._BASE_POS, 0, 0, 0]),
                               atol=1e-6)
    assert float(env.reward_from_physics(ts.physics)) == pytest.approx(
        float(ts.reward), abs=1e-5)


def test_jaco_reward_at_target_is_one() -> None:
    env = jaco.make("jaco_reach_top_right")
    model = env.model
    # find a joint config whose tcp is within the target radius
    key = jax.random.key(2)
    qj = jax.random.uniform(key, (5000, 6), minval=jnp.asarray(model.limit_lo),
                            maxval=jnp.asarray(model.limit_hi))
    root = jnp.tile(jnp.concatenate(
        [jnp.asarray(jaco._BASE_POS), jnp.zeros(3)]), (5000, 1))
    qs = jnp.concatenate([root, qj], axis=1)
    tcps = jax.vmap(lambda q: jaco.tcp_position(model, q))(qs)
    tgt = jnp.asarray(jaco.TASKS["reach_top_right"])
    d = jnp.linalg.norm(tcps - tgt, axis=1)
    best = int(jnp.argmin(d))
    assert float(d[best]) < jaco._TARGET_RADIUS  # reachable
    phys = jnp.concatenate([qs[best], jnp.zeros(model.ndof), tgt])
    assert float(env.reward_from_physics(phys)) == pytest.approx(1.0)
    # and far away -> low reward
    phys_far = jnp.concatenate(
        [root[0], jaco._READY_POSE, jnp.zeros(model.ndof),
         jnp.asarray([10.0, 10.0, 0.0])])
    assert float(env.reward_from_physics(phys_far)) < 0.01


def test_jaco_goal_space_and_reward_factory() -> None:
    from controllable_agent_tpu.goals import get_reward_function, goal_spaces
    from controllable_agent_tpu.goals.rewards import get_goal_space_dim

    assert get_goal_space_dim("simplified_jaco") == 3
    env = jaco.make("jaco_reach_top_left")
    state, ts = env.reset(jax.random.key(0))
    feats = env.goal_features(ts.physics)
    g = goal_spaces.funcs["jaco"]["simplified_jaco"](feats)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(jaco.tcp_position(env.model, state.q)),
        atol=1e-5)
    # batched goal features
    batch = jnp.tile(ts.physics, (4, 1))
    assert env.goal_features(batch).shape == (4, 3)
    r = get_reward_function("jaco_reach_top_left")
    np.testing.assert_allclose(
        r.get_goal("simplified_jaco"), [-0.09, 0.09, 0.001], atol=1e-6)
    vals = r.from_physics(np.tile(np.asarray(ts.physics), (3, 1)))
    assert vals.shape == (3,) and np.isfinite(vals).all()


def test_jaco_vmapped_and_workspace_dispatch() -> None:
    from controllable_agent_tpu.train.workspace import make_env
    env = make_env("jaco_reach_bottom_left")
    assert isinstance(env, jaco.JacoEnv)
    keys = jax.random.split(jax.random.key(0), 3)
    states, ts = jax.jit(jax.vmap(env.reset))(keys)
    step = jax.jit(jax.vmap(env.step))
    for _ in range(3):
        states, ts = step(states, jnp.zeros((3, 6)))
    assert ts.observation.shape == (3, 24)
    assert np.isfinite(np.asarray(ts.observation)).all()
