"""Custom reward functions for zero-shot evaluation.

Mirrors the reference's reward-class zoo (url_benchmark/goals.py:224-613):
seeded BaseReward with ``from_physics``, the named-task factory
``get_reward_function``, MazeMultiGoal's 20-goal battery, the
WalkerEquation sandboxed user-equation reward (tokenizer whitelist kept
verbatim in spirit — it guards the public demo against code injection) and
WalkerRandomReward.

TPU redesign: ``from_physics`` is BATCHED — it maps a [N, physics_dim]
array to [N] rewards as a pure function, so whole-buffer relabeling is one
device pass instead of the reference's per-row MuJoCo state-replay loop
(url_benchmark/in_memory_replay_buffer.py:40-55).
"""

from __future__ import annotations

import io
import token
import tokenize
import typing as tp

import jax.numpy as jnp
import numpy as np

from ..ops.tolerance import tolerance
from .registry import goal_spaces
from . import spaces as _spaces  # noqa: F401  (populates the registries)

Array = jnp.ndarray

# feature layouts per domain (see goals/spaces.py docstring)
WALKER_FEATURES = ("x", "z", "up", "vx", "vz", "am")


def _inv(distance: Array) -> Array:
    return 1.0 / (1.0 + jnp.abs(distance))


def get_goal_space_dim(name: str) -> int:
    """Dim lookup (reference goals.py:218-221) without instantiating envs:
    probe the registered space fn with a dummy feature vector."""
    domain, fn = goal_spaces.lookup(name)
    # quadruped probe is 11: base features (8) + ball columns the fetch
    # env appends for the quadruped_positions space
    probe_dim = {"point_mass_maze": 4, "walker": 6, "quadruped": 11,
                 "grid": 4, "jaco": 3}[domain]
    return int(np.asarray(fn(jnp.zeros(probe_dim))).size)


class BaseReward:
    """Seeded custom reward (reference goals.py:224-240)."""

    def __init__(self, seed: tp.Optional[int] = None) -> None:
        self._rng = np.random.RandomState(seed)

    def get_goal(self, goal_space: str) -> np.ndarray:
        raise NotImplementedError

    def from_physics(self, physics: np.ndarray) -> np.ndarray:
        """Batched: [N, physics_dim] (or [physics_dim]) -> [N] (or scalar)."""
        raise NotImplementedError

    def __call__(self, physics: np.ndarray) -> np.ndarray:
        return self.from_physics(physics)


class PointMassReachReward(BaseReward):
    """Native point-mass-maze reach reward (the DmcReward analogue for this
    domain; reference goals.py:262-277 + point_mass_maze.py:193-203).

    At relabel time the stored control is unknown, matching the reference's
    from_physics (which resets state with zero control) — so the
    small-control factor is 1.
    """

    def __init__(self, task: str, seed: tp.Optional[int] = None) -> None:
        super().__init__(seed)
        from ..envs.pointmass import TASKS
        self.task = task
        self.target = np.asarray(TASKS[task])

    def get_goal(self, goal_space: str) -> np.ndarray:
        if goal_space != "simplified_point_mass_maze":
            raise ValueError(f"Goal space {goal_space} not supported")
        return self.target.astype(np.float32)

    def from_physics(self, physics: np.ndarray) -> np.ndarray:
        pos = jnp.asarray(physics)[..., :2]
        target_size = 0.015
        dist = jnp.linalg.norm(pos - jnp.asarray(self.target), axis=-1)
        return np.asarray(tolerance(dist, bounds=(0.0, target_size),
                                    margin=target_size))


class MazeMultiGoal(BaseReward):
    """20 goals in the 4 maze rooms + tolerance reward + distance
    (reference goals.py:371-412)."""

    def __init__(self, seed: tp.Optional[int] = None) -> None:
        super().__init__(seed)
        self.goals = np.array([
            [-0.15, 0.15], [-0.22, 0.22], [-0.08, 0.08], [-0.22, 0.08], [-0.08, 0.22],
            [0.15, 0.15], [0.22, 0.22], [0.08, 0.08], [0.22, 0.08], [0.08, 0.22],
            [-0.15, -0.15], [-0.22, -0.22], [-0.08, -0.08], [-0.22, -0.08], [-0.08, -0.22],
            [0.15, -0.15], [0.22, -0.22], [0.08, -0.08], [0.22, -0.08], [0.08, -0.22],
        ], dtype=np.float32)

    def from_goal(self, achieved_goal: np.ndarray, desired_goal: np.ndarray
                  ) -> tp.Tuple[np.ndarray, np.ndarray]:
        """returns (reward, distance); batched over leading dims."""
        target_size = 0.03
        d = jnp.asarray(achieved_goal) - jnp.asarray(desired_goal)
        distance = jnp.linalg.norm(d, axis=-1) if d.ndim > 0 else jnp.linalg.norm(d)
        reward = tolerance(distance, bounds=(0.0, target_size), margin=target_size)
        return np.asarray(reward), np.asarray(distance)


def _quad_features(physics: np.ndarray) -> np.ndarray:
    from ..envs import quadruped
    env = quadruped.make("quadruped_stand")
    return np.asarray(env.goal_features(jnp.asarray(physics)))


class QuadrupedReward(BaseReward):
    """7 random mixed reward cases over quadruped (position, speed,
    quadrant) — reference QuadrupedReward, goals.py:289-323. Operates on
    the quadruped feature layout [up, 0, x, y, z, vx, vy, vz]."""

    NUM_CASES = 7

    def __init__(self, seed: tp.Optional[int] = None) -> None:
        super().__init__(seed)
        self.x = self._rng.uniform(-5, 5, size=2)
        self.vx = self._rng.uniform(-3, 3, size=2)
        self.quadrant = self._rng.choice([1, -1], size=2, replace=True)
        self.speed = float(np.linalg.norm(self.vx))
        self._case = self._rng.randint(self.NUM_CASES)

    def from_physics(self, physics: np.ndarray) -> np.ndarray:
        feats = _quad_features(np.atleast_2d(np.asarray(physics)))
        up = np.maximum(feats[..., 0], 0.0)
        x = feats[..., 2:4]
        vx = feats[..., 5:7]
        speed = np.linalg.norm(vx, axis=-1)
        inv = lambda d: 1.0 / (1.0 + np.abs(d))  # noqa: E731
        in_quadrant = np.all(x * self.quadrant > self.x, axis=-1)
        case = self._case
        if case == 0:
            out = up * inv(speed - self.speed)
        elif case == 1:
            out = up * inv(np.linalg.norm(x - self.x, axis=-1))
        elif case == 2:
            out = up * in_quadrant.astype(np.float32)
        elif case == 3:
            out = up * in_quadrant * inv(self.speed - speed)
        elif case == 4:
            out = up * inv(np.linalg.norm(self.vx - vx, axis=-1) / np.sqrt(2))
        elif case == 5:
            out = up * in_quadrant * (speed > self.speed)
        else:
            out = up * (speed > self.speed)
        out = np.asarray(out, np.float32)
        return out[0] if np.asarray(physics).ndim == 1 else out


class QuadrupedPosReward(BaseReward):
    """Deterministic positional reward (reference goals.py:326-345)."""

    def __init__(self, seed: tp.Optional[int] = None) -> None:
        super().__init__(seed)
        self.x = np.array([2.0, 2.0, 0.8], np.float32)

    def get_goal(self, goal_space: str) -> np.ndarray:
        if goal_space != "quad_pos_speed":
            raise ValueError(
                f"Goal space {goal_space} not supported with this reward")
        return np.concatenate([[1.0], self.x, [0.0] * 3]).astype(np.float32)

    def from_physics(self, physics: np.ndarray) -> np.ndarray:
        feats = _quad_features(np.atleast_2d(np.asarray(physics)))
        up = (feats[..., 0] + 1.0) / 2.0
        pos = feats[..., 2:5]
        dist = np.linalg.norm(pos - self.x, axis=-1)
        out = (0.5 * up + 0.5 / (1.0 + np.abs(dist))).astype(np.float32)
        return out[0] if np.asarray(physics).ndim == 1 else out


class WalkerPosReward(BaseReward):
    """Random positional reward: tolerance(|x - X|, r=1) with a random
    integer target X in [-20, 20) (reference goals.py:348-368; unlike the
    reference — which leaks to the global np.random — the target draws
    from the seeded rng)."""

    def __init__(self, seed: tp.Optional[int] = None) -> None:
        super().__init__(seed)
        self.x = int(self._rng.randint(-20, 20))

    def get_goal(self, goal_space: str) -> np.ndarray:
        if goal_space != "walker_pos_speed_z":
            raise ValueError(
                f"Goal space {goal_space} not supported with this reward")
        # [z, up, vx, x, vz, am] (reference :360-362)
        return np.array([1, 1, 0, self.x, 0, 0], dtype=np.float32)

    def from_physics(self, physics: np.ndarray) -> np.ndarray:
        feats = _walker_features_fn(np.atleast_2d(np.asarray(physics)))
        d = np.abs(feats[..., 0] - self.x)  # feature 0 = torso x
        out = np.asarray(tolerance(jnp.asarray(d), (0.0, 1.0), margin=1.0),
                         np.float32)
        return out[0] if np.asarray(physics).ndim == 1 else out


class EquationReward(BaseReward):
    """User-supplied Python expression over named physics features,
    tokenizer-whitelisted then eval'd (reference WalkerEquation,
    url_benchmark/goals.py:509-545). Generic over the feature layout."""

    _NP_FUNCS = ("sin", "cos", "tan", "abs", "exp", "sqrt")

    def __init__(self, string: str, feature_names: tp.Sequence[str],
                 features_fn: tp.Callable[[np.ndarray], np.ndarray],
                 seed: tp.Optional[int] = None) -> None:
        super().__init__(seed)
        self.feature_names = tuple(feature_names)
        self._features_fn = features_fn
        allowed = set(self.feature_names) | set(self._NP_FUNCS)
        not_allowed = extract_names(string) - allowed
        if not_allowed:
            # safety measure: guards the public demo against injection
            raise ValueError(
                f"The following variables are not allowed: {not_allowed}\n"
                f"Please only use {sorted(allowed)}")
        self.string = string

    def _eval(self, feats: np.ndarray) -> np.ndarray:
        variables: tp.Dict[str, tp.Any] = {
            name: feats[..., i] for i, name in enumerate(self.feature_names)}
        for name in self._NP_FUNCS:
            variables[name] = getattr(np, name)
        out = eval(self.string, {"__builtins__": {}}, variables)  # pylint: disable=eval-used
        return np.asarray(out, np.float32) * np.ones(feats.shape[:-1], np.float32)

    def from_physics(self, physics: np.ndarray) -> np.ndarray:
        feats = np.asarray(self._features_fn(np.asarray(physics)))
        return self._eval(feats)

    def from_features(self, feats: np.ndarray) -> np.ndarray:
        return self._eval(feats)


def _walker_features_fn(physics: np.ndarray) -> np.ndarray:
    """Feature extraction for the walker domain; resolved lazily so the
    equation machinery is importable without the walker env."""
    from ..envs import locomotion  # deferred: heavy module
    env = locomotion.make("walker_stand")
    return np.asarray(env.goal_features(jnp.asarray(physics)))


class WalkerEquation(EquationReward):
    """Reference WalkerEquation (goals.py:509-589): variables x, z, vx, vz,
    up, am over the walker physics."""

    def __init__(self, string: str, seed: tp.Optional[int] = None) -> None:
        super().__init__(string, WALKER_FEATURES, _walker_features_fn, seed)


class WalkerRandomReward(WalkerEquation):
    """Weighted random eval equations (reference goals.py:592-613)."""

    def __init__(self, seed: tp.Optional[int] = None) -> None:
        rng = np.random.RandomState(seed)
        x = rng.uniform(3, 15)
        nx = rng.uniform(3, 8)
        cases = [
            (f"exp(-(x-{x:.1f})**2)", 5),
            (f"exp(-(x-{x:.1f})**2) * up", 5),
            (f"exp(-(x+{nx:.1f})**2)", 2),
            ("vx > 1", 1),
            ("vx > 3", 1),
            ("vx < -1", 1),
        ]
        p = np.array([float(c[1]) for c in cases])
        p /= p.sum()
        selected = cases[rng.choice(range(p.size), p=p)][0]
        super().__init__(selected)
        self._rng = rng


def extract_names(string: str) -> tp.Set[str]:
    """All NAME tokens in an expression (reference goals.py:509-513)."""
    rl = io.BytesIO(string.encode("utf-8")).readline
    tokens = list(tokenize.tokenize(rl))
    return {t.string for t in tokens if t.type == token.NAME}


def get_reward_function(name: str, seed: tp.Optional[int] = None) -> BaseReward:
    """String -> reward factory (reference goals.py:243-254)."""
    if name == "maze_multi_goal":
        return MazeMultiGoal(seed)
    if name == "quadruped_mix":
        return QuadrupedReward(seed)
    if name == "quadruped_position":
        return QuadrupedPosReward(seed)
    if name.startswith("walker_yoga_"):
        from .yoga import WalkerYogaReward
        return WalkerYogaReward(name[len("walker_yoga_"):], seed)
    if name == "walker_random_equation":
        return WalkerRandomReward(seed)
    if name == "walker_position":
        return WalkerPosReward(seed)
    if name.startswith("point_mass_maze_"):
        return PointMassReachReward(name[len("point_mass_maze_"):], seed)
    if (name.startswith("walker_") or name.startswith("quadruped_")
            or name.startswith("jaco_") or name.startswith("cheetah_")
            or name.startswith("hopper_")):
        # native env task rewards (DmcReward analogue); resolved lazily
        from ..envs import dmc_tasks
        return dmc_tasks.make_task_reward(name, seed)
    raise ValueError(f"Unknown reward function {name!r}")
