"""Jaco arm reach domain — fixed-base 6-dof manipulator on physics3d.

Re-creates the reference's jaco reach task family
(url_benchmark/custom_dmc_tasks/jaco.py): four reach targets at
(+-0.09, +-0.09, ~0) on the tabletop, reward =
tolerance(|tcp - target|, bounds=(0, 0.05), margin=0.05) (:177-187),
episode-randomised initial arm pose (the reference draws the tool centre
point uniformly in a bbox via an IK initializer, :101-105; here the joint
angles are drawn around a ready pose — same spirit, no IK needed).

The arm is this framework's own design — pedestal + shoulder-yaw /
shoulder-pitch / elbow-pitch / forearm-roll / wrist-pitch / wrist-yaw
chain (6 actuated hinges, like the real Jaco's 6 dof) — run fixed-base on
the same Lagrangian engine as the quadruped. No composer/MJCF involved.

Observation: [sin q (6), cos q (6), qd (6), tcp (3), target (3)] -> 24.
Physics vector: [q (12), qd (12), target (3)] -> 27 (target included so
rewards relabel from stored physics alone, like every other domain).
Goal features (simplified_jaco, reference goals.py:54-57): tcp xyz.
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

_TARGET_RADIUS = 0.05  # reference jaco.py:59
# reference jaco.py:62-65 (x, y, z ~ tabletop)
TASKS: tp.Dict[str, np.ndarray] = {
    "reach_top_left": np.array([-0.09, 0.09, 0.001], np.float32),
    "reach_top_right": np.array([0.09, 0.09, 0.001], np.float32),
    "reach_bottom_left": np.array([-0.09, -0.09, 0.001], np.float32),
    "reach_bottom_right": np.array([0.09, -0.09, 0.001], np.float32),
}

# geometry (own design)
_BASE_POS = (-0.4, 0.0, 0.0)  # pedestal root, behind the target board
_PEDESTAL_H = 0.15
_UPPER_LEN = 0.25
_FORE_LEN = 0.12  # elbow -> forearm-roll joint
_ROLL_LEN = 0.12  # forearm-roll joint -> wrist
_WRIST_LEN = 0.08
_HAND_LEN = 0.06  # wrist-yaw body -> tool centre point
_LINK_R = 0.03

# ready pose: arm bent forward, tcp ~(0.12, 0, 0.17) — inside the
# reference's tcp spawn bbox (+-0.2, +-0.2, 0.02..0.4), jaco.py:52-56
_READY_POSE = np.array([0.0, 0.9, 1.0, 0.0, 0.5, 0.0], np.float32)


def jaco_model() -> p3d.Model3D:
    """7 bodies: fixed pedestal + 6 hinge links. ndof = 12 (root pinned)."""
    link_specs = [
        # (parent-frame anchor, hinge axis, length along +z)
        ((0.0, 0.0, _PEDESTAL_H), (0.0, 0.0, 1.0), 0.04),   # shoulder yaw
        ((0.0, 0.0, 0.04), (0.0, 1.0, 0.0), _UPPER_LEN),    # shoulder pitch
        ((0.0, 0.0, _UPPER_LEN), (0.0, 1.0, 0.0), _FORE_LEN),  # elbow pitch
        ((0.0, 0.0, _FORE_LEN), (0.0, 0.0, 1.0), _ROLL_LEN),   # forearm roll
        ((0.0, 0.0, _ROLL_LEN), (0.0, 1.0, 0.0), _WRIST_LEN),  # wrist pitch
        ((0.0, 0.0, _WRIST_LEN), (0.0, 0.0, 1.0), _HAND_LEN),  # wrist yaw
    ]
    parent = [-1]
    anchor = [(0.0, 0.0, 0.0)]
    axis = [(0.0, 0.0, 1.0)]
    com = [(0.0, 0.0, _PEDESTAL_H / 2)]
    mass = [4.0]
    inertia = [p3d.box_inertia(4.0, 0.06, 0.06, _PEDESTAL_H / 2)]
    for i, (anc, ax, length) in enumerate(link_specs):
        parent.append(i)  # chain: body b's parent is body b-1
        anchor.append(anc)
        axis.append(ax)
        com.append((0.0, 0.0, length / 2))
        m = 0.6 if i < 3 else 0.35
        mass.append(m)
        inertia.append(p3d.rod_inertia3(m, max(length, 0.04), _LINK_R, 2))
    deg = np.deg2rad
    lo = [float(deg(v)) for v in (-180, -80, -150, -180, -100, -180)]
    hi = [float(deg(v)) for v in (180, 100, 150, 180, 100, 180)]
    return p3d.Model3D(
        parent=tuple(parent),
        anchor=jnp.asarray(anchor, jnp.float32),
        axis=jnp.asarray(axis, jnp.float32),
        com=jnp.asarray(com, jnp.float32),
        mass=jnp.asarray(mass, jnp.float32),
        inertia=jnp.asarray(inertia, jnp.float32),
        # one contact at the TCP keeps the hand above the tabletop (z=0);
        # radius 0 => force only engages once the point actually dips under
        contact_body=(6,),
        contact_point=jnp.asarray([[0.0, 0.0, _HAND_LEN]], jnp.float32),
        contact_radius=jnp.asarray([0.0], jnp.float32),
        gear=jnp.asarray([12.0, 25.0, 18.0, 6.0, 6.0, 4.0], jnp.float32),
        damping=jnp.asarray([1.5, 2.5, 2.0, 0.8, 0.8, 0.5], jnp.float32),
        limit_lo=jnp.asarray(lo, jnp.float32),
        limit_hi=jnp.asarray(hi, jnp.float32),
        armature=jnp.asarray([0.1, 0.1, 0.1, 0.05, 0.05, 0.05], jnp.float32),
        contact_stiffness=5.0e3,
        contact_damping=50.0,
        fixed_base=True,
    )


class JacoState(struct.PyTreeNode):
    q: Array
    qd: Array
    touch: Array
    t: Array
    target: Array  # [3]


def tcp_position(model: p3d.Model3D, q: Array) -> Array:
    """World position of the tool centre point (tip of the last link)."""
    origins, rots = p3d.fk(model, q)
    return origins[6] + rots[6] @ jnp.asarray([0.0, 0.0, _HAND_LEN])


def jaco_features_single(model: p3d.Model3D, physics: Array) -> Array:
    """Goal features = tcp xyz (reference simplified_jaco, goals.py:54-57)."""
    ndof = model.ndof
    return tcp_position(model, physics[:ndof])


class JacoEnv(Environment):
    def __init__(self, task: str, episode_length: int = 250) -> None:
        if task not in TASKS:
            raise ValueError(f"Unknown jaco task {task!r}")
        self.task = task
        self.model = jaco_model()
        self.episode_length = episode_length
        self.control_dt, self.n_substeps = 0.04, 8
        ndof = self.model.ndof
        self.spec = EnvSpec(obs_dim=24, action_dim=6,
                            physics_dim=2 * ndof + 3, goal_dim=0,
                            episode_length=episode_length)
        self._root_q = jnp.concatenate(
            [jnp.asarray(_BASE_POS, jnp.float32), jnp.zeros(3)])

    def _obs(self, state: JacoState) -> Array:
        qj, qdj = state.q[6:], state.qd[6:]
        tcp = tcp_position(self.model, state.q)
        return jnp.concatenate([jnp.sin(qj), jnp.cos(qj), qdj, tcp,
                                state.target])

    def _physics(self, state: JacoState) -> Array:
        return jnp.concatenate([state.q, state.qd, state.target])

    def goal_features(self, physics: Array) -> Array:
        fn = lambda p: jaco_features_single(self.model, p)  # noqa: E731
        if physics.ndim == 1:
            return fn(physics)
        flat = physics.reshape(-1, physics.shape[-1])
        out = jax.vmap(fn)(flat)
        return out.reshape(physics.shape[:-1] + (out.shape[-1],))

    def reward_from_physics(self, physics: Array) -> Array:
        """tolerance(|tcp - target|) (reference jaco.py:177-187)."""
        ndof = self.model.ndof
        tcp = tcp_position(self.model, physics[:ndof])
        target = physics[2 * ndof:2 * ndof + 3]
        dist = jnp.linalg.norm(tcp - target)
        return tolerance(dist, (0.0, _TARGET_RADIUS), margin=_TARGET_RADIUS)

    def reset(self, key: jax.Array) -> tp.Tuple[JacoState, TimeStep]:
        u = jax.random.uniform(key, (6,), minval=-0.3, maxval=0.3)
        qj = jnp.asarray(_READY_POSE) + u
        q = jnp.concatenate([self._root_q, qj])
        state = JacoState(q=q, qd=jnp.zeros(self.model.ndof),
                          touch=jnp.zeros_like(self.model.contact_radius),
                          t=jnp.zeros((), jnp.int32),
                          target=jnp.asarray(TASKS[self.task]))
        ts = TimeStep(
            step_type=jnp.asarray(StepType.FIRST, jnp.int32),
            reward=jnp.zeros(()),
            discount=jnp.ones(()),
            observation=self._obs(state),
            action=jnp.zeros(6),
            physics=self._physics(state),
        )
        return state, ts

    def step(self, state: JacoState, action: Array
             ) -> tp.Tuple[JacoState, TimeStep]:
        action = jnp.clip(action.astype(jnp.float32), -1.0, 1.0)
        q, qd, touch = p3d.step(self.model, state.q, state.qd, action,
                                self.control_dt, self.n_substeps)
        t = state.t + 1
        new_state = JacoState(q=q, qd=qd, touch=touch, t=t,
                              target=state.target)
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


def make(name: str, episode_length: int = 250) -> JacoEnv:
    domain, task = name.split("_", 1)
    assert domain == "jaco"
    return JacoEnv(task, episode_length=episode_length)
