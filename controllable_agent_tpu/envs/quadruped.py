"""Quadruped — 3-D locomotion on the pure-JAX physics3d engine.

Re-creates the reference's quadruped domain and custom task set
(url_benchmark/custom_dmc_tasks/quadruped.py: stand/walk/run [speeds
0.5/5], jump [height 1.0], roll/roll_fast [speed-norm rewards]; reward
shapes :352-536). The model is this framework's own design — a box torso
with four 2-joint legs (hip pitch + knee) — not the MuJoCo ant; task
semantics, reward shapes and goal spaces match the reference.

``escape`` (heightfield terrain) and ``fetch`` (ball manipulation) need
terrain/object support and are out of scope for the analytic engine
(SURVEY §7 flags them as the hard cases).

Observation layout: [joint angles (8), joint velocities (8), torso
rotation rows x/z (6), torso height (1), torso linear velocity (3),
torso angular velocity (3)] -> 29.

Goal features (goals/spaces.py quadruped layout):
[up, 0, x, y, z, vx, vy, vz].
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.tolerance import tolerance
from . import physics3d as p3d
from .base import Environment, EnvSpec, StepType, TimeStep

Array = jnp.ndarray

_WALK_SPEED = 0.5
_RUN_SPEED = 5.0
_JUMP_HEIGHT = 1.0

TASKS = ["stand", "walk", "run", "jump", "roll", "roll_fast"]

# geometry
_TORSO_HALF = (0.23, 0.23, 0.07)
_UPPER_LEN = 0.20
_LOWER_LEN = 0.25
_LEG_R = 0.04
_INIT_Z = 0.55


def quadruped_model() -> p3d.Model3D:
    """9 bodies: torso + 4x(upper, lower) legs. 14 dof (6 root + 8 hinges)."""
    tm = 1000.0 * (2 * _TORSO_HALF[0]) * (2 * _TORSO_HALF[1]) * (2 * _TORSO_HALF[2])
    um = p3d.rod_inertia3  # alias for brevity below
    upper_mass = 1000.0 * np.pi * _LEG_R ** 2 * _UPPER_LEN
    lower_mass = 1000.0 * np.pi * _LEG_R ** 2 * _LOWER_LEN

    parent = [-1]
    anchor = [(0.0, 0.0, 0.0)]
    axis = [(0.0, 0.0, 1.0)]
    com = [(0.0, 0.0, 0.0)]
    mass = [tm]
    inertia = [p3d.box_inertia(tm, *_TORSO_HALF)]
    contacts = [(0, (hx, hy, 0.0), 0.08)
                for hx in (-_TORSO_HALF[0], _TORSO_HALF[0])
                for hy in (-_TORSO_HALF[1], _TORSO_HALF[1])]

    body = 1
    for (sx, sy) in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
        hip = (sx * _TORSO_HALF[0], sy * _TORSO_HALF[1], -_TORSO_HALF[2])
        # hip pitch rotates about the lateral (y) axis; legs swing fore-aft
        parent += [0, body]
        anchor += [hip, (0.0, 0.0, -_UPPER_LEN)]
        axis += [(0.0, 1.0, 0.0), (0.0, 1.0, 0.0)]
        com += [(0.0, 0.0, -_UPPER_LEN / 2), (0.0, 0.0, -_LOWER_LEN / 2)]
        mass += [upper_mass, lower_mass]
        inertia += [um(upper_mass, _UPPER_LEN, _LEG_R, 2),
                    um(lower_mass, _LOWER_LEN, _LEG_R, 2)]
        contacts.append((body + 1, (0.0, 0.0, -_LOWER_LEN), _LEG_R))
        body += 2

    deg = np.deg2rad
    return p3d.Model3D(
        parent=tuple(parent),
        anchor=jnp.asarray(anchor, jnp.float32),
        axis=jnp.asarray(axis, jnp.float32),
        com=jnp.asarray(com, jnp.float32),
        mass=jnp.asarray(mass, jnp.float32),
        inertia=jnp.asarray(inertia, jnp.float32),
        contact_body=tuple(c[0] for c in contacts),
        contact_point=jnp.asarray([c[1] for c in contacts], jnp.float32),
        contact_radius=jnp.asarray([c[2] for c in contacts], jnp.float32),
        gear=jnp.asarray([60.0, 40.0] * 4, jnp.float32),
        damping=jnp.asarray([2.0] * 8, jnp.float32),
        limit_lo=jnp.asarray([float(deg(-60)), float(deg(-120))] * 4,
                             jnp.float32),
        limit_hi=jnp.asarray([float(deg(60)), float(deg(10))] * 4,
                             jnp.float32),
        armature=jnp.asarray([0.05] * 8, jnp.float32),
    )


class QuadState(struct.PyTreeNode):
    q: Array
    qd: Array
    touch: Array
    t: Array


def quad_features_single(model: p3d.Model3D, physics: Array) -> Array:
    """[up, 0, x, y, z, vx, vy, vz] (goals/spaces.py quadruped layout)."""
    ndof = model.ndof
    q, qd = physics[:ndof], physics[ndof:2 * ndof]
    rot = p3d._euler_rot(q[3:6])
    up = rot[2, 2]
    return jnp.concatenate([jnp.stack([up, jnp.zeros(())]), q[0:3], qd[0:3]])


class QuadrupedEnv(Environment):
    def __init__(self, task: str, episode_length: int = 1000) -> None:
        if task not in TASKS:
            raise ValueError(f"Unknown quadruped task {task!r}")
        self.task = task
        self.model = quadruped_model()
        self.episode_length = episode_length
        self.control_dt, self.n_substeps = 0.02, 8
        ndof = self.model.ndof
        self.spec = EnvSpec(obs_dim=29, action_dim=8, physics_dim=2 * ndof,
                            goal_dim=0, episode_length=episode_length)

    # -- observables -------------------------------------------------------
    def _obs(self, state: QuadState) -> Array:
        q, qd = state.q, state.qd
        rot = p3d._euler_rot(q[3:6])
        return jnp.concatenate([
            q[6:], qd[6:], rot[0], rot[2], q[2:3], qd[0:3], qd[3:6]])

    def _physics(self, state: QuadState) -> Array:
        return jnp.concatenate([state.q, state.qd])

    def goal_features(self, physics: Array) -> Array:
        fn = lambda p: quad_features_single(self.model, p)  # noqa: E731
        if physics.ndim == 1:
            return fn(physics)
        flat = physics.reshape(-1, physics.shape[-1])
        out = jax.vmap(fn)(flat)
        return out.reshape(physics.shape[:-1] + (out.shape[-1],))

    # -- rewards ------------------------------------------------------------
    def reward_from_physics(self, physics: Array) -> Array:
        feats = quad_features_single(self.model, physics)
        up = feats[0]
        v = feats[5:8]
        z = feats[4]
        # _upright_reward (reference quadruped.py:352-366)
        upright = tolerance(up, (1.0, float("inf")), margin=2.0,
                            value_at_margin=0.0, sigmoid="linear")
        if self.task == "stand":
            return upright
        if self.task == "jump":
            jump_up = tolerance(z, (_JUMP_HEIGHT, float("inf")),
                                margin=_JUMP_HEIGHT, value_at_margin=0.5,
                                sigmoid="linear")
            return upright * jump_up
        if self.task in ("roll", "roll_fast"):
            speed = _WALK_SPEED if self.task == "roll" else _RUN_SPEED
            move = tolerance(jnp.linalg.norm(v), (speed, float("inf")),
                             margin=speed, value_at_margin=0.5,
                             sigmoid="linear")
            return upright * move
        speed = _WALK_SPEED if self.task == "walk" else _RUN_SPEED
        move = tolerance(v[0], (speed, float("inf")), margin=speed,
                         value_at_margin=0.5, sigmoid="linear")
        return upright * move

    # -- API ------------------------------------------------------------
    def reset(self, key: jax.Array) -> tp.Tuple[QuadState, TimeStep]:
        nj = 8
        u = jax.random.uniform(key, (nj,), minval=-0.1, maxval=0.1)
        base = jnp.tile(jnp.asarray([0.3, -0.6]), 4)  # crouched stance
        q = jnp.concatenate([
            jnp.asarray([0.0, 0.0, _INIT_Z, 0.0, 0.0, 0.0]), base + u])
        state = QuadState(q=q, qd=jnp.zeros(self.model.ndof),
                          touch=jnp.zeros_like(self.model.contact_radius),
                          t=jnp.zeros((), jnp.int32))
        ts = TimeStep(
            step_type=jnp.asarray(StepType.FIRST, jnp.int32),
            reward=jnp.zeros(()),
            discount=jnp.ones(()),
            observation=self._obs(state),
            action=jnp.zeros(nj),
            physics=self._physics(state),
        )
        return state, ts

    def step(self, state: QuadState, action: Array
             ) -> tp.Tuple[QuadState, TimeStep]:
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)
        q, qd, touch = p3d.step(self.model, state.q, state.qd, action,
                                self.control_dt, self.n_substeps)
        t = state.t + 1
        new_state = QuadState(q=q, qd=qd, touch=touch, t=t)
        physics = self._physics(new_state)
        ts = TimeStep(
            step_type=jnp.where(t >= self.episode_length, StepType.LAST,
                                StepType.MID).astype(jnp.int32),
            reward=self.reward_from_physics(physics).astype(jnp.float32),
            discount=jnp.ones(()),
            observation=self._obs(new_state),
            action=action,
            physics=physics,
        )
        return new_state, ts


def make(name: str, episode_length: int = 1000) -> QuadrupedEnv:
    domain, task = name.split("_", 1)
    assert domain == "quadruped"
    return QuadrupedEnv(task, episode_length=episode_length)
