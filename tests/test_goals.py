import jax.numpy as jnp
import numpy as np
import pytest

from controllable_agent_tpu.goals import (
    MazeMultiGoal,
    PointMassReachReward,
    get_goal_space_dim,
    get_reward_function,
    goal_spaces,
    goals,
)
from controllable_agent_tpu.goals.rewards import EquationReward, extract_names
from controllable_agent_tpu.ops.tolerance import tolerance


def test_registry_contents() -> None:
    assert "walker" in goal_spaces.funcs
    assert "point_mass_maze" in goal_spaces.funcs
    assert "simplified_walker" in goal_spaces.funcs["walker"]
    assert "walker_walk" in goals.funcs["simplified_walker"]


def test_goal_space_dims_agree_with_goals() -> None:
    """Every registered goal's vector matches its space's dimension
    (reference test_goals.py:19-29)."""
    for space_name, tasks in goals.funcs.items():
        dim = get_goal_space_dim(space_name)
        for task_name, fn in tasks.items():
            g = fn()
            assert g.shape == (dim,), (space_name, task_name)
            assert g.dtype == np.float32


def test_space_names_unique_across_domains() -> None:
    names = [s for spaces in goal_spaces.funcs.values() for s in spaces]
    assert len(names) == len(set(names))


def test_goal_space_values() -> None:
    fn = goal_spaces.funcs["point_mass_maze"]["simplified_point_mass_maze"]
    phys = jnp.asarray([0.1, -0.2, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(fn(phys)), [0.1, -0.2])
    wfn = goal_spaces.funcs["walker"]["walker_pos_speed_z"]
    feats = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])  # x z up vx vz am
    np.testing.assert_allclose(np.asarray(wfn(feats)), [2, 3, 4, 1, 5, 6])


def test_equation_whitelist_raises() -> None:
    with pytest.raises(ValueError):
        EquationReward("__import__('os')", ("x",), lambda p: p)
    with pytest.raises(ValueError):
        EquationReward("x + evil", ("x",), lambda p: p)


def test_extract_names_injection() -> None:
    names = extract_names("exp(-(x-3.0)**2) * up")
    assert names == {"exp", "x", "up"}


def test_equation_reward_eval() -> None:
    reward = EquationReward("2*x + (y > 0)", ("x", "y"),
                            lambda p: p)
    out = reward.from_physics(np.array([[1.0, 1.0], [2.0, -1.0]], np.float32))
    np.testing.assert_allclose(out, [3.0, 4.0])


def test_equation_scalar_broadcast() -> None:
    reward = EquationReward("1.5", ("x",), lambda p: p)
    out = reward.from_physics(np.zeros((5, 1), np.float32))
    np.testing.assert_allclose(out, 1.5 * np.ones(5))


def test_maze_multi_goal() -> None:
    mg = MazeMultiGoal(seed=0)
    assert mg.goals.shape == (20, 2)
    r, d = mg.from_goal(mg.goals[0], mg.goals[0])
    assert float(r) == 1.0 and float(d) == 0.0
    r2, d2 = mg.from_goal(np.array([0.0, 0.0], np.float32), mg.goals[0])
    assert float(r2) < 0.1 and float(d2) > 0.2
    # batched
    rb, db = mg.from_goal(mg.goals, np.tile(mg.goals[:1], (20, 1)))
    assert rb.shape == (20,) and float(rb[0]) == 1.0


def test_pointmass_reach_reward_and_factory() -> None:
    reward = get_reward_function("point_mass_maze_reach_top_left", seed=1)
    assert isinstance(reward, PointMassReachReward)
    goal = reward.get_goal("simplified_point_mass_maze")
    phys = np.concatenate([goal, np.zeros(2, np.float32)])
    assert float(reward.from_physics(phys)) == 1.0
    batch = np.tile(phys, (7, 1))
    np.testing.assert_allclose(reward.from_physics(batch), np.ones(7))


def test_tolerance_matches_dm_control_semantics() -> None:
    # inside bounds -> 1
    assert float(tolerance(jnp.asarray(0.5), bounds=(0, 1), margin=1)) == 1.0
    # at margin -> value_at_margin
    out = float(tolerance(jnp.asarray(2.0), bounds=(0, 1), margin=1,
                          value_at_margin=0.1))
    assert out == pytest.approx(0.1, rel=1e-5)
    # zero margin -> indicator
    assert float(tolerance(jnp.asarray(1.1), bounds=(0, 1), margin=0)) == 0.0
    # quadratic sigmoid hits exactly 0 beyond margin with value_at_margin=0
    out = float(tolerance(jnp.asarray(1.5), bounds=(0, 0), margin=1,
                          value_at_margin=0, sigmoid="quadratic"))
    assert out == 0.0
    for sig in ("gaussian", "hyperbolic", "long_tail", "reciprocal",
                "cosine", "linear", "quadratic", "tanh_squared"):
        v = float(tolerance(jnp.asarray(1.5), bounds=(0, 1), margin=1,
                            value_at_margin=0.1, sigmoid=sig))
        assert 0.0 <= v < 1.0, sig


def test_unknown_reward_raises() -> None:
    with pytest.raises(ValueError):
        get_reward_function("no_such_task")


def test_walker_yoga_reward() -> None:
    from controllable_agent_tpu.goals.yoga import (
        WalkerYogaReward,
        get_walkeryoga_goals,
        oracle_distance,
    )
    goals = get_walkeryoga_goals()
    assert len(goals) == 12
    reward = get_reward_function("walker_yoga_kneel")
    assert isinstance(reward, WalkerYogaReward)
    # reward is 0 at the exact pose, negative away from it
    pose = np.concatenate([goals["kneel"], np.zeros(9, np.float32)])
    assert float(reward.from_physics(pose)) == 0.0
    far = pose.copy()
    far[1] += 1.0
    assert float(reward.from_physics(far)) < -0.99
    # legs are interchangeable
    q = goals["legs_up"]
    q_swapped = np.concatenate([q[:3], q[6:9], q[3:6]]).astype(np.float32)
    assert float(oracle_distance(jnp.asarray(q_swapped),
                                 jnp.asarray(q))) < 1e-5
    # batched
    batch = np.tile(pose, (4, 1))
    assert reward.from_physics(batch).shape == (4,)


def test_walker_pos_reward() -> None:
    import numpy as np
    from controllable_agent_tpu.goals import get_reward_function

    r = get_reward_function("walker_position", seed=3)
    assert -20 <= r.x < 20
    g = r.get_goal("walker_pos_speed_z")
    assert g.shape == (6,) and g[3] == r.x
    # physics with torso exactly at the target -> reward 1
    phys = np.zeros(18, np.float32)
    phys[0] = r.x
    phys[1] = 1.3
    assert float(r.from_physics(phys)) > 0.99
    phys[0] = r.x + 30.0
    assert float(r.from_physics(phys)) < 0.01
    # deterministic under the seed
    r2 = get_reward_function("walker_position", seed=3)
    assert r2.x == r.x
    batch = r.from_physics(np.tile(phys, (5, 1)))
    assert batch.shape == (5,)


def test_benchmark_task_lists_resolve() -> None:
    from controllable_agent_tpu.envs import benchmark
    from controllable_agent_tpu.train.workspace import make_env

    assert len(benchmark.TASKS) == 16
    for task in benchmark.TASKS + list(benchmark.PRIMAL_TASKS.values()):
        env = make_env(task)
        assert env.spec.obs_dim > 0
