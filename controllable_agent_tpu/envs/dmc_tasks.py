"""Native task rewards by name — the DmcReward analogue.

The reference's DmcReward (url_benchmark/goals.py:262-277) instantiates a
dm_control task and replays MuJoCo state to compute that task's reward for
arbitrary stored physics. Here every locomotion task reward is already a
pure function of the physics vector, so the batched version is one vmap —
no state replay loop.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..goals.rewards import BaseReward
from . import locomotion


class TaskReward(BaseReward):
    """reward_from_physics of a named locomotion/quadruped task, batched."""

    def __init__(self, name: str, seed: tp.Optional[int] = None) -> None:
        super().__init__(seed)
        self.name = name
        if name.startswith("quadruped_"):
            from . import quadruped
            self._env = quadruped.make(name)
        elif name.startswith("jaco_"):
            from . import jaco
            self._env = jaco.make(name)
        else:
            self._env = locomotion.make(name)
        self._batched = jax.jit(jax.vmap(self._env.reward_from_physics))

    def get_goal(self, goal_space: str) -> np.ndarray:
        from ..goals.registry import goals
        fns = goals.funcs.get(goal_space, {})
        if self.name in fns:
            return fns[self.name]()
        raise ValueError(f"No registered goal for {self.name} in {goal_space}")

    def from_physics(self, physics: np.ndarray) -> np.ndarray:
        arr = jnp.asarray(physics)
        if arr.ndim == 1:
            return np.asarray(self._env.reward_from_physics(arr))
        return np.asarray(self._batched(arr))


def make_task_reward(name: str, seed: tp.Optional[int] = None) -> TaskReward:
    return TaskReward(name, seed)
