import jax
import jax.numpy as jnp
import numpy as np

from controllable_agent_tpu.envs.pointmass import PointMassMaze, TASKS


def test_reset_in_top_left_room() -> None:
    env = PointMassMaze("reach_top_left")
    for seed in range(5):
        state, ts = env.reset(jax.random.key(seed))
        pos = np.asarray(state.pos)
        assert -0.29 <= pos[0] <= -0.15
        assert 0.15 <= pos[1] <= 0.29
        assert ts.observation.shape == (4,)


def test_force_moves_mass() -> None:
    env = PointMassMaze("reach_top_left")
    state, _ = env.reset(jax.random.key(0))
    x0 = float(state.pos[0])
    for _ in range(20):
        state, ts = env.step(state, jnp.asarray([1.0, 0.0]))
    assert float(state.pos[0]) > x0  # pushed right
    assert float(state.vel[0]) > 0


def test_joint_limits() -> None:
    env = PointMassMaze("reach_top_left")
    state, _ = env.reset(jax.random.key(0))
    for _ in range(300):
        state, _ = env.step(state, jnp.asarray([-1.0, 1.0]))
    pos = np.asarray(state.pos)
    assert pos[0] >= -0.2901 and pos[1] <= 0.2901


def test_wall_blocks_room_crossing() -> None:
    """From the top-left room, pushing straight down is blocked by the
    horizontal wall arm (which spans |x| <= 0.18 around y=0)."""
    env = PointMassMaze("reach_bottom_left")
    state, _ = env.reset(jax.random.key(1))
    state = state.replace(pos=jnp.asarray([-0.15, 0.1]), vel=jnp.zeros(2))
    for _ in range(200):
        state, _ = env.step(state, jnp.asarray([0.0, -1.0]))
    assert float(state.pos[1]) > 0.02  # never crossed y=0


def test_gap_allows_room_crossing() -> None:
    """Near the arena edge (|x| > 0.19) there is a gap in the wall."""
    env = PointMassMaze("reach_bottom_left")
    state, _ = env.reset(jax.random.key(1))
    state = state.replace(pos=jnp.asarray([-0.27, 0.1]), vel=jnp.zeros(2))
    for _ in range(300):
        state, _ = env.step(state, jnp.asarray([0.0, -1.0]))
    assert float(state.pos[1]) < -0.1  # crossed through the gap


def test_reward_peaks_at_target() -> None:
    env = PointMassMaze("reach_top_left")
    target = np.asarray(TASKS["reach_top_left"])
    phys_on = jnp.asarray([target[0], target[1], 0.0, 0.0])
    phys_off = jnp.asarray([0.25, -0.25, 0.0, 0.0])
    r_on = float(env.reward_from_physics(phys_on, jnp.zeros(2)))
    r_off = float(env.reward_from_physics(phys_off, jnp.zeros(2)))
    assert r_on == 1.0
    assert r_off < 1e-3


def test_vmap_rollout_deterministic() -> None:
    env = PointMassMaze("reach_top_left", episode_length=50)
    n = 8
    keys = jax.random.split(jax.random.key(0), n)
    states, ts = jax.vmap(env.reset)(keys)

    step = jax.jit(jax.vmap(env.step))

    def run() -> np.ndarray:
        s = states
        out = []
        for t in range(10):
            s, ts2 = step(s, jnp.tile(jnp.asarray([[0.5, -0.5]]), (n, 1)))
            out.append(np.asarray(ts2.observation))
        return np.stack(out)

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)
