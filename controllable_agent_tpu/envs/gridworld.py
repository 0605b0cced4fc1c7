"""Pure-JAX gridworld (discrete FB testbed).

Re-implements the reference's numpy gridworld
(url_benchmark/gridworld/env.py:24-381) as pure jittable functions: layouts
``simple`` / ``obstacle`` / ``random_goal``, 5 actions
(up/right/down/left/stay), wall penalty, goal reward, max-episode-length
termination, and AGENT_POS / AGENT_ONEHOT / STATE_INDEX observation types.
Bit-exact trajectory determinism under a fixed PRNG key is a test target
(BASELINE.md determinism north star).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .base import Environment, EnvSpec, StepType, TimeStep

Array = jnp.ndarray

# layouts: -1 = wall, 0 = empty (reference env.py:49-103)
_SIMPLE = [
    [-1, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [-1, 0, 0, 0, 0, 0, 0, 0, 0, -1],
    [-1, 0, 0, 0, -1, -1, 0, 0, 0, -1],
    [-1, 0, 0, 0, -1, -1, 0, 0, 0, -1],
    [-1, 0, 0, 0, -1, -1, 0, 0, 0, -1],
    [-1, 0, 0, 0, 0, 0, 0, 0, 0, -1],
    [-1, 0, 0, 0, 0, 0, 0, 0, 0, -1],
    [-1, 0, 0, 0, 0, 0, 0, 0, 0, -1],
    [-1, -1, -1, -1, -1, -1, -1, -1, -1, -1],
]
_OBSTACLE = [
    [-1, -1, -1, -1, -1, -1, -1, -1, -1, -1],
    [-1, 0, 0, 0, 0, 0, -1, 0, 0, -1],
    [-1, 0, 0, 0, -1, 0, 0, 0, 0, -1],
    [-1, 0, 0, 0, -1, -1, 0, 0, 0, -1],
    [-1, 0, 0, 0, -1, -1, 0, 0, 0, -1],
    [-1, 0, 0, 0, 0, 0, 0, 0, 0, -1],
    [-1, 0, 0, 0, 0, 0, 0, 0, 0, -1],
    [-1, 0, 0, 0, 0, 0, 0, 0, 0, -1],
    [-1, -1, -1, -1, -1, -1, -1, -1, -1, -1],
]

_TASKS: tp.Dict[str, tp.Dict[str, tp.Any]] = {
    "simple": {"layout": _SIMPLE, "start": (2, 2), "randomize_goals": True,
               "goal": None},
    "obstacle": {"layout": _OBSTACLE, "start": (2, 2), "randomize_goals": False,
                 "goal": (2, 8)},
    "random_goal": {"layout": _SIMPLE, "start": (2, 2), "randomize_goals": False,
                    "goal": None},
}

# action deltas: up, right, down, left, stay (reference env.py:273-289)
_DELTAS = np.array([[-1, 0], [0, 1], [1, 0], [0, -1], [0, 0]], np.int32)

OBS_AGENT_POS = "agent_pos"
OBS_AGENT_ONEHOT = "agent_onehot"
OBS_STATE_INDEX = "state_index"
OBS_GRID = "grid"  # flat HxWx3 walls/agent/goal channels (env.py:40-43)
OBS_AGENT_GOAL_POS = "agent_goal_pos"  # (ay, ax, gy, gx) (env.py:44-45)


class GridState(struct.PyTreeNode):
    pos: Array  # int32 [2] (y, x)
    goal: Array  # int32 [2]
    t: Array  # int32 scalar steps taken this episode


class GridWorld(Environment):
    """Stateless pure-function gridworld. All instance attrs are static."""

    def __init__(self, layout: tp.Sequence[tp.Sequence[int]],
                 start: tp.Tuple[int, int],
                 goal: tp.Optional[tp.Tuple[int, int]] = None,
                 observation_type: str = OBS_AGENT_POS,
                 discount: float = 1.0,
                 penalty_for_walls: float = 0.0,
                 reward_goal: float = 1.0,
                 max_episode_length: int = 200,
                 randomize_goals: bool = False) -> None:
        self.layout = jnp.asarray(np.array(layout, np.int32))
        self.shape = tuple(np.array(layout).shape)
        self.start = jnp.asarray(np.array(start, np.int32))
        self.observation_type = observation_type
        self.discount = discount
        self.penalty_for_walls = penalty_for_walls
        self.reward_goal = reward_goal
        self.max_episode_length = max_episode_length
        self.randomize_goals = randomize_goals
        self.n_states = int(np.prod(self.shape))
        free = np.argwhere(np.array(layout) == 0)
        # candidate goal cells exclude the start cell (reference env.py:175-186)
        free = free[~np.all(free == np.array(start), axis=1)]
        self._free_cells = jnp.asarray(free.astype(np.int32))
        if goal is None:
            goal = tuple(free[0])
        self._default_goal = jnp.asarray(np.array(goal, np.int32))

        obs_dim = {OBS_AGENT_POS: 2, OBS_AGENT_ONEHOT: self.n_states,
                   OBS_STATE_INDEX: 1, OBS_GRID: 3 * self.n_states,
                   OBS_AGENT_GOAL_POS: 4}[observation_type]
        self.spec = EnvSpec(obs_dim=obs_dim, action_dim=1,
                            discrete_actions=True, n_actions=5,
                            physics_dim=4, goal_dim=obs_dim,
                            episode_length=max_episode_length)

    # -- observations ----------------------------------------------------
    def _obs_from_pos(self, pos: Array, goal: Array) -> Array:
        if self.observation_type == OBS_AGENT_POS:
            return pos.astype(jnp.float32) / jnp.asarray(self.shape, jnp.float32)
        if self.observation_type == OBS_AGENT_ONEHOT:
            idx = pos[0] * self.shape[1] + pos[1]
            return jax.nn.one_hot(idx, self.n_states, dtype=jnp.float32)
        if self.observation_type == OBS_GRID:
            # walls / agent / goal channels (reference env.py:40-43,196-204),
            # flattened to fit the flat-obs pipeline
            walls = (self.layout < 0).astype(jnp.float32)
            idx = pos[0] * self.shape[1] + pos[1]
            gidx = goal[0] * self.shape[1] + goal[1]
            agent = jax.nn.one_hot(idx, self.n_states,
                                   dtype=jnp.float32).reshape(self.shape)
            goal_ch = jax.nn.one_hot(gidx, self.n_states,
                                     dtype=jnp.float32).reshape(self.shape)
            return jnp.stack([walls, agent, goal_ch], axis=-1).reshape(-1)
        if self.observation_type == OBS_AGENT_GOAL_POS:
            return jnp.concatenate([pos, goal]).astype(jnp.float32)
        idx = pos[0] * self.shape[1] + pos[1]
        return idx.astype(jnp.float32)[None]

    def get_obs(self, state: GridState) -> Array:
        return self._obs_from_pos(state.pos, state.goal)

    def get_goal_obs(self, state: GridState) -> Array:
        """Observation the agent would see standing on the goal cell
        (reference env.py:229-239)."""
        return self._obs_from_pos(state.goal, state.goal)

    def _physics(self, state: GridState) -> Array:
        return jnp.concatenate([state.pos, state.goal]).astype(jnp.float32)

    def render(self, state: GridState, cell_px: int = 24) -> np.ndarray:
        """RGB frame of the grid: walls dark, start outlined, goal green,
        agent orange (reference env.py:321-381 renders via matplotlib; this
        is a GL/matplotlib-free rasterizer consistent with train/video.py).
        Host-side (numpy), for visualization only."""
        h, w = self.shape
        layout = np.asarray(self.layout)
        img = np.full((h, w, 3), 255, np.uint8)
        img[layout < 0] = (40, 40, 40)          # walls
        sy, sx = (int(v) for v in np.asarray(self.start))
        img[sy, sx] = (180, 200, 255)           # start cell
        gy, gx = (int(v) for v in np.asarray(state.goal))
        img[gy, gx] = (60, 180, 75)             # goal
        ay, ax = (int(v) for v in np.asarray(state.pos))
        img[ay, ax] = (235, 137, 33)            # agent
        img = np.repeat(np.repeat(img, cell_px, axis=0), cell_px, axis=1)
        # thin grid lines
        img[::cell_px, :] = 200
        img[:, ::cell_px] = 200
        return img

    # -- dynamics --------------------------------------------------------
    def _sample_goal(self, key: jax.Array) -> Array:
        i = jax.random.randint(key, (), 0, self._free_cells.shape[0])
        return self._free_cells[i]

    def reset(self, key: jax.Array) -> tp.Tuple[GridState, TimeStep]:
        goal = (self._sample_goal(key) if self.randomize_goals
                else self._default_goal)
        state = GridState(pos=self.start, goal=goal, t=jnp.zeros((), jnp.int32))
        ts = TimeStep(
            step_type=jnp.asarray(StepType.FIRST, jnp.int32),
            reward=jnp.zeros(()),
            discount=jnp.ones(()),
            observation=self.get_obs(state),
            action=jnp.zeros((), jnp.int32),
            physics=self._physics(state),
        )
        return state, ts

    def step(self, state: GridState, action: Array) -> tp.Tuple[GridState, TimeStep]:
        action = jnp.asarray(action, jnp.int32).reshape(())
        new_pos = state.pos + jnp.asarray(_DELTAS)[action]
        cell = self.layout[new_pos[0], new_pos[1]]
        hit_wall = cell == -1
        on_goal = jnp.all(new_pos == state.goal) & ~hit_wall
        pos = jnp.where(hit_wall, state.pos, new_pos)
        reward = jnp.where(hit_wall, self.penalty_for_walls,
                           jnp.where(on_goal, self.reward_goal, 0.0))
        t = state.t + 1
        new_state = GridState(pos=pos, goal=state.goal, t=t)
        step_type = jnp.where(t >= self.max_episode_length,
                              StepType.LAST, StepType.MID).astype(jnp.int32)
        ts = TimeStep(
            step_type=step_type,
            reward=reward.astype(jnp.float32),
            discount=jnp.asarray(self.discount, jnp.float32),
            observation=self.get_obs(new_state),
            action=action,
            physics=self._physics(new_state),
        )
        return new_state, ts


def build_gridworld_task(task: str = "simple",
                         discount: float = 1.0,
                         penalty_for_walls: float = 0.0,
                         observation_type: str = OBS_AGENT_POS,
                         max_episode_length: int = 200) -> GridWorld:
    """Factory matching the reference's build_gridworld_task
    (url_benchmark/gridworld/env.py:24-103)."""
    spec = _TASKS[task]
    return GridWorld(layout=spec["layout"], start=spec["start"], goal=spec["goal"],
                     observation_type=observation_type, discount=discount,
                     penalty_for_walls=penalty_for_walls,
                     max_episode_length=max_episode_length,
                     randomize_goals=spec["randomize_goals"])
