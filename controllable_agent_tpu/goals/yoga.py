"""WalkerYogaReward — 12 posture goals with an oracle pose distance.

Re-implements the reference's walker yoga battery
(url_benchmark/goals.py:415-506): named target poses (lie_back, kneel,
bridge, head_stand, ...) and a reward equal to minus the oracle distance —
the max absolute error over (height, shortest-angle trunk rotation, hip and
knee angles), minimized over the two leg orderings (legs are
interchangeable, goals.py:441-449).

Pose constants are expressed here in THIS framework's walker layout
q = [x, z, θ, r_hip, r_knee, r_ankle, l_hip, l_knee, l_ankle] with
absolute torso height (the reference uses dm_control's [Δz, x, rot, ...]
with height relative to the 1.3 init — converted below).
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np

from .rewards import BaseReward

Array = jnp.ndarray

_INIT_Z = 1.3

# reference poses (goals.py:470-506): [dz, x, rot, hip1, knee1, ankle1,
# hip2, knee2, ankle2]
_REF_POSES: tp.Dict[str, tp.List[float]] = {
    "lie_back": [-1.2, 0., -1.57, 0., 0., 0., 0., -0., 0.],
    "lie_front": [-1.2, -0., 1.57, 0., 0., 0., 0., 0., 0.],
    "legs_up": [-1.24, 0., -1.57, 1.57, 0., 0.0, 1.57, -0., 0.0],
    "kneel": [-0.5, 0., 0., 0., -1.57, -0.8, 1.57, -1.57, 0.0],
    "side_angle": [-0.3, 0., 0.9, 0., 0., -0.7, 1.87, -1.07, 0.0],
    "stand_up": [-0.15, 0., 0.34, 0.74, -1.34, -0., 1.1, -0.66, -0.1],
    "lean_back": [-0.27, 0., -0.45, 0.22, -1.5, 0.86, 0.6, -0.8, -0.4],
    "boat": [-1.04, 0., -0.8, 1.6, 0., 0.0, 1.6, -0., 0.0],
    "bridge": [-1.1, 0., -2.2, -0.3, -1.5, 0., -0.3, -0.8, -0.4],
    "head_stand": [-1., 0., -3., 0.6, -1., -0.3, 0.9, -0.5, 0.3],
    "one_feet": [-0.2, 0., 0., 0.7, -1.34, 0.5, 1.5, -0.6, 0.1],
    "arabesque": [-0.34, 0., 1.57, 1.57, 0., 0., 0., -0., 0.],
}


def get_walkeryoga_goals() -> tp.Dict[str, np.ndarray]:
    """Poses in this framework's q layout (9-dim)."""
    out = {}
    for name, p in _REF_POSES.items():
        dz, x, rot = p[0], p[1], p[2]
        legs = p[3:9]
        out[name] = np.array([x, _INIT_Z + dz, rot] + legs, np.float32)
    return out


def _shortest_angle(angle: Array) -> Array:
    angle = jnp.mod(angle, 2 * jnp.pi)
    return jnp.where(angle > jnp.pi, 2 * jnp.pi - angle, angle)


def oracle_distance(q1: Array, q2: Array) -> Array:
    """Max absolute error over (height, trunk rotation, hips, knees),
    minimized over the two leg orderings (reference _oracle_distance,
    goals.py:441-449). Batched over leading dims of q1."""
    q1 = q1[..., :9]
    q2 = q2[..., :9]

    def dist_to(goal: Array) -> Array:
        d = jnp.abs(q1 - goal)
        # indices in our layout: z, θ(shortest angle), r_hip, r_knee,
        # l_hip, l_knee
        parts = jnp.stack([
            d[..., 1], _shortest_angle(d[..., 2]),
            d[..., 3], d[..., 4], d[..., 6], d[..., 7]], axis=-1)
        return parts.max(axis=-1)

    swapped = jnp.concatenate(
        [q2[..., :3], q2[..., 6:9], q2[..., 3:6]], axis=-1)
    return jnp.minimum(dist_to(q2), dist_to(swapped))


class WalkerYogaReward(BaseReward):
    """reward = −oracle_distance(q, goal_pose) (reference
    WalkerYogaReward.compute_reward, goals.py:427-430)."""

    def __init__(self, pose: str = "stand_up",
                 seed: tp.Optional[int] = None) -> None:
        super().__init__(seed)
        goals = get_walkeryoga_goals()
        if pose not in goals:
            raise ValueError(f"Unknown yoga pose {pose!r}; "
                             f"known: {sorted(goals)}")
        self.pose = pose
        self.goal_pose = goals[pose]
        self.goals = goals

    def compute_reward(self, physics: np.ndarray, pose: str) -> np.ndarray:
        return -np.asarray(oracle_distance(jnp.asarray(physics),
                                           jnp.asarray(self.goals[pose])))

    def from_physics(self, physics: np.ndarray) -> np.ndarray:
        return self.compute_reward(physics, self.pose)
