"""Pure-JAX point-mass maze — the continuous-control testbed.

From-scratch JAX re-implementation of the reference's custom point-mass
maze tasks (url_benchmark/custom_dmc_tasks/point_mass_maze.py and the
accompanying MJCF models): a 2D point mass in a ±0.3 arena divided into
four rooms by a plus-shaped wall of half-length 0.18 centered at the
origin, slide joints limited to ±0.29 with damping 1 and motor gear 0.1,
reach targets at (±0.15, ±0.15) with a tolerance reward shaped by a
small-control bonus, and the multi-goal variant (episode starts in the
top-left room).

The dynamics here are an analytic damped point mass integrated
semi-implicitly (MuJoCo's integrator family) — not a MuJoCo port. Wall
interaction is modeled as axis-aligned motion blocking, which preserves the
task's topology (rooms + gaps near the arena edge) and keeps step() a few
fused vector ops: thousands of instances vmap onto one TPU core.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.tolerance import tolerance
from .base import Environment, EnvSpec, StepType, TimeStep

Array = jnp.ndarray

TASKS: tp.Dict[str, np.ndarray] = {
    "reach_top_left": np.array([-0.15, 0.15], np.float32),
    "reach_top_right": np.array([0.15, 0.15], np.float32),
    "reach_bottom_left": np.array([-0.15, -0.15], np.float32),
    "reach_bottom_right": np.array([0.15, -0.15], np.float32),
}

# geometry (from the reference MJCF): arena |x|,|y| <= 0.29 (joint limit),
# cross walls along the axes with half-length 0.18 and half-thickness 0.02
_JOINT_LIMIT = 0.29
_WALL_HALF_LEN = 0.18
_WALL_HALF_THICK = 0.02
_MASS = 0.3
_DAMPING = 1.0
_GEAR = 0.1
_CONTROL_DT = 0.02  # 1000 steps over the 20s time limit
_N_SUBSTEPS = 4


class PointMassState(struct.PyTreeNode):
    pos: Array  # [2]
    vel: Array  # [2]
    t: Array  # int32


def _blocked(pos: Array, new_pos: Array) -> Array:
    """Block per-axis motion that would enter the cross-shaped wall.

    The wall region is {|x| <= 0.18+eps and |y| <= 0.02} ∪ {|y| <= 0.18+eps
    and |x| <= 0.02} (two crossing boxes). Movement is resolved per axis:
    if moving only along one axis would put the point inside a wall box,
    that axis keeps its old coordinate (mirrors how MuJoCo contact stops
    the mass sliding through; exact restitution is irrelevant to the task).
    """
    t = _WALL_HALF_THICK + 0.01  # wall half-thickness + point radius
    half_len = _WALL_HALF_LEN

    def inside_wall(p: Array) -> Array:
        in_x_arm = (jnp.abs(p[0]) <= half_len + t) & (jnp.abs(p[1]) <= t)
        in_y_arm = (jnp.abs(p[1]) <= half_len + t) & (jnp.abs(p[0]) <= t)
        return in_x_arm | in_y_arm

    move_x = jnp.stack([new_pos[0], pos[1]])
    move_y = jnp.stack([pos[0], new_pos[1]])
    x = jnp.where(inside_wall(move_x), pos[0], new_pos[0])
    y = jnp.where(inside_wall(move_y), pos[1], new_pos[1])
    return jnp.stack([x, y])


class PointMassMaze(Environment):
    """Four-room point-mass maze. Observation = [pos, vel] (4D)."""

    def __init__(self, task: str = "reach_top_left",
                 episode_length: int = 1000) -> None:
        self.task = task
        self.target = jnp.asarray(TASKS.get(task, TASKS["reach_top_left"]))
        self.episode_length = episode_length
        self.spec = EnvSpec(obs_dim=4, action_dim=2, physics_dim=4,
                            goal_dim=2, episode_length=episode_length)

    # -- helpers ---------------------------------------------------------
    def _obs(self, state: PointMassState) -> Array:
        return jnp.concatenate([state.pos, state.vel])

    def _physics(self, state: PointMassState) -> Array:
        return jnp.concatenate([state.pos, state.vel])

    def reward_from_physics(self, physics: Array, action: Array) -> Array:
        """Task reward (reference point_mass_maze.py:193-203): tolerance on
        target distance x small-control bonus."""
        pos = physics[..., :2]
        target_size = 0.015
        control = tolerance(action, bounds=(0.0, 0.0), margin=1.0,
                            value_at_margin=0.0, sigmoid="quadratic")
        small_control = (jnp.mean(control, axis=-1) + 4.0) / 5.0
        dist = jnp.linalg.norm(pos - self.target, axis=-1)
        near = tolerance(dist, bounds=(0.0, target_size), margin=target_size)
        return near * small_control

    # -- API -------------------------------------------------------------
    def reset(self, key: jax.Array) -> tp.Tuple[PointMassState, TimeStep]:
        kx, ky = jax.random.split(key)
        # start in the top-left room (reference initialize_episode :175-177)
        x = jax.random.uniform(kx, (), minval=-0.29, maxval=-0.15)
        y = jax.random.uniform(ky, (), minval=0.15, maxval=0.29)
        state = PointMassState(pos=jnp.stack([x, y]), vel=jnp.zeros(2),
                               t=jnp.zeros((), jnp.int32))
        ts = TimeStep(
            step_type=jnp.asarray(StepType.FIRST, jnp.int32),
            reward=jnp.zeros(()),
            discount=jnp.ones(()),
            observation=self._obs(state),
            action=jnp.zeros(2),
            physics=self._physics(state),
        )
        return state, ts

    def step(self, state: PointMassState, action: Array
             ) -> tp.Tuple[PointMassState, TimeStep]:
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)
        dt = _CONTROL_DT / _N_SUBSTEPS
        force = _GEAR * action

        def substep(carry: tp.Tuple[Array, Array], _: None
                    ) -> tp.Tuple[tp.Tuple[Array, Array], None]:
            pos, vel = carry
            acc = (force - _DAMPING * vel) / _MASS
            vel = vel + dt * acc  # semi-implicit Euler
            new_pos = pos + dt * vel
            new_pos = jnp.clip(new_pos, -_JOINT_LIMIT, _JOINT_LIMIT)
            resolved = _blocked(pos, new_pos)
            # kill velocity along blocked axes
            vel = jnp.where(resolved == new_pos, vel, 0.0)
            return (resolved, vel), None

        (pos, vel), _ = jax.lax.scan(substep, (state.pos, state.vel), None,
                                     length=_N_SUBSTEPS)
        t = state.t + 1
        new_state = PointMassState(pos=pos, vel=vel, t=t)
        physics = self._physics(new_state)
        reward = self.reward_from_physics(physics, action)
        ts = TimeStep(
            step_type=jnp.where(t >= self.episode_length, StepType.LAST,
                                StepType.MID).astype(jnp.int32),
            reward=reward.astype(jnp.float32),
            discount=jnp.ones(()),
            observation=self._obs(new_state),
            action=action,
            physics=physics,
        )
        return new_state, ts


def make_pointmass(task: str, episode_length: int = 1000) -> PointMassMaze:
    return PointMassMaze(task=task, episode_length=episode_length)
