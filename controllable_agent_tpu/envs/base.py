"""Functional environment API.

TPU-native re-design of the reference's dm_env wrapper stack
(url_benchmark/dmc.py:35-120): instead of mutable environments with
``reset()``/``step()`` methods, an Environment is a pair of pure functions

    reset(key)          -> (state, timestep)
    step(state, action) -> (state, timestep)

over an env-specific state pytree. Pure functions vmap to thousands of
parallel instances and jit into the training loop — the reference's per-step
host round-trip disappears.

``TimeStep`` carries the same fields as the reference's ExtendedGoalTimeStep
(url_benchmark/dmc.py:35-73): step_type / reward / discount / observation /
action, plus ``physics`` (the flat state vector used for reward relabeling)
and optional ``goal``.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


class StepType:
    FIRST = 0
    MID = 1
    LAST = 2


class TimeStep(struct.PyTreeNode):
    step_type: Array  # int32 scalar
    reward: Array  # float32 scalar
    discount: Array  # float32 scalar
    observation: Array
    action: Array
    physics: Array
    goal: tp.Optional[Array] = None

    def first(self) -> Array:
        return self.step_type == StepType.FIRST

    def mid(self) -> Array:
        return self.step_type == StepType.MID

    def last(self) -> Array:
        return self.step_type == StepType.LAST

    def to_buffer_dict(self) -> tp.Dict[str, Array]:
        """Flatten to the replay buffer's storage-name convention."""
        out = {
            "observation": self.observation,
            "action": self.action,
            "reward": jnp.reshape(self.reward, (-1,))[:1] if self.reward.ndim else jnp.reshape(self.reward, (1,)),
            "discount": jnp.reshape(self.discount, (1,)),
            "physics": self.physics,
        }
        if self.goal is not None:
            out["goal"] = self.goal
        return out


class EnvSpec(struct.PyTreeNode):
    """Static description of an environment's interface."""

    obs_dim: int = struct.field(pytree_node=False)
    action_dim: int = struct.field(pytree_node=False)
    # non-empty for image observations: the (H, W, C) the flat obs vector
    # reshapes to (pixel envs keep obs flat so replay/collectors are
    # layout-agnostic; agents with encoders reshape at the boundary)
    obs_shape: tp.Tuple[int, ...] = struct.field(pytree_node=False,
                                                 default=())
    discrete_actions: bool = struct.field(pytree_node=False, default=False)
    n_actions: int = struct.field(pytree_node=False, default=0)
    physics_dim: int = struct.field(pytree_node=False, default=0)
    goal_dim: int = struct.field(pytree_node=False, default=0)
    episode_length: int = struct.field(pytree_node=False, default=1000)


class Environment:
    """Protocol base: subclasses implement pure reset/step.

    Subclasses must be stateless (all dynamic data in the state pytree) so
    that reset/step can be jitted and vmapped freely.
    """

    spec: EnvSpec

    def reset(self, key: jax.Array) -> tp.Tuple[tp.Any, TimeStep]:
        raise NotImplementedError

    def step(self, state: tp.Any, action: Array) -> tp.Tuple[tp.Any, TimeStep]:
        raise NotImplementedError
