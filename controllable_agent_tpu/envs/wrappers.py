"""Functional environment wrappers.

The reference composes mutable dm_env wrappers, each overriding
``_augment_time_step`` (url_benchmark/dmc.py:76-332: ActionRepeatWrapper,
FrameStackWrapper, GoalWrapper with optional obs-append, dtype wrappers).
Here each wrapper is an Environment wrapping another Environment's pure
reset/step — still pure, still vmappable, so wrapped envs drop into the
same vectorized collector.

``StatefulEnv`` adapts a functional env to the reference's mutable
reset()/step() API for host-side consumers (demos, notebooks).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

from .base import Environment, TimeStep

Array = jnp.ndarray


class ActionRepeatWrapper(Environment):
    """Repeat each action k times, summing rewards (reference dmc.py:170-185)."""

    def __init__(self, env: Environment, num_repeats: int) -> None:
        self.env = env
        self.num_repeats = num_repeats
        self.spec = env.spec

    def reset(self, key: jax.Array):
        return self.env.reset(key)

    def step(self, state, action):
        def body(carry, _):
            state, reward, discount = carry
            state, ts = self.env.step(state, action)
            return (state, reward + ts.reward * discount,
                    discount * ts.discount), ts

        (state, reward, discount), traj = jax.lax.scan(
            body, (state, jnp.zeros(()), jnp.ones(())), None,
            length=self.num_repeats)
        last = jax.tree.map(lambda x: x[-1], traj)
        return state, last.replace(reward=reward, discount=discount)


class FrameStackState(struct.PyTreeNode):
    inner: tp.Any
    frames: Array  # [k, obs_dim]


class FrameStackWrapper(Environment):
    """Stack the last k observations (reference dmc.py:188-233, flattened)."""

    def __init__(self, env: Environment, num_frames: int) -> None:
        self.env = env
        self.num_frames = num_frames
        self.spec = env.spec.replace(obs_dim=env.spec.obs_dim * num_frames)

    def _obs(self, frames: Array) -> Array:
        return frames.reshape(-1)

    def reset(self, key: jax.Array):
        state, ts = self.env.reset(key)
        frames = jnp.tile(ts.observation[None], (self.num_frames, 1))
        return (FrameStackState(inner=state, frames=frames),
                ts.replace(observation=self._obs(frames)))

    def step(self, state: FrameStackState, action):
        inner, ts = self.env.step(state.inner, action)
        frames = jnp.concatenate([state.frames[1:], ts.observation[None]])
        return (FrameStackState(inner=inner, frames=frames),
                ts.replace(observation=self._obs(frames)))


class GoalAppendWrapper(Environment):
    """Compute the goal-space vector each step and optionally append it to
    the observation (reference GoalWrapper, dmc.py:236-268 with
    append_goal_to_observation)."""

    def __init__(self, env: Environment,
                 goal_fn: tp.Callable[[Array], Array],
                 append_goal_to_observation: bool = False) -> None:
        self.env = env
        self.goal_fn = goal_fn
        self.append = append_goal_to_observation
        probe = goal_fn(jnp.zeros((env.spec.physics_dim,)))
        goal_dim = int(probe.shape[-1])
        obs_dim = env.spec.obs_dim + (goal_dim if append_goal_to_observation
                                      else 0)
        self.spec = env.spec.replace(obs_dim=obs_dim, goal_dim=goal_dim)

    def _augment(self, ts: TimeStep) -> TimeStep:
        goal = self.goal_fn(ts.physics)
        obs = (jnp.concatenate([ts.observation, goal]) if self.append
               else ts.observation)
        return ts.replace(goal=goal, observation=obs)

    def reset(self, key: jax.Array):
        state, ts = self.env.reset(key)
        return state, self._augment(ts)

    def step(self, state, action):
        state, ts = self.env.step(state, action)
        return state, self._augment(ts)


class StatefulEnv:
    """Mutable reset()/step() adapter over a functional env (the
    reference-style host API; useful for demos and notebooks)."""

    def __init__(self, env: Environment, seed: int = 0) -> None:
        self.env = env
        self.spec = env.spec
        self._key = jax.random.key(seed)
        self._state: tp.Any = None
        self._reset = jax.jit(env.reset)
        self._step = jax.jit(env.step)

    def reset(self) -> TimeStep:
        self._key, sub = jax.random.split(self._key)
        self._state, ts = self._reset(sub)
        return ts

    def step(self, action) -> TimeStep:
        assert self._state is not None, "call reset() first"
        self._state, ts = self._step(self._state, jnp.asarray(action))
        return ts
