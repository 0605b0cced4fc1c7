"""Goal-space and goal registrations.

Mirrors the reference's registry contents (url_benchmark/goals.py:44-208).
Goal-space functions are pure JAX functions of the owning domain's *feature
vector* — each env documents the layout its ``goal_features`` produces:

  * point_mass_maze: physics = [x, y, vx, vy]
  * walker (planar): features = [x, z, up, vx, vz, am]   (am = subtree
    angular momentum around y; matches the variables of the reference's
    walker_pos_speed_z space, url_benchmark/goals.py:85-94)
  * quadruped: features = [up, |v|, wx, wy, wz, vx, vy, vz]  (workspace
    position wx..wz; matches quad_pos_speed, url_benchmark/goals.py:106-112)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .registry import goal_spaces, goals

Array = jnp.ndarray

# ---------------------------------------------------------------- spaces

# walker feature layout indices
_WX, _WZ, _WUP, _WVX, _WVZ, _WAM = range(6)


@goal_spaces("point_mass_maze")
def simplified_point_mass_maze(physics: Array) -> Array:
    """(x, y) of the point mass (reference goals.py:60-63)."""
    return physics[..., :2]


@goal_spaces("walker")
def simplified_walker(features: Array) -> Array:
    """(torso height, torso upright, horizontal velocity)
    (reference goals.py:66-74)."""
    return features[..., jnp.asarray([_WZ, _WUP, _WVX])]


@goal_spaces("walker")
def walker_pos_speed(features: Array) -> Array:
    """simplified_walker + x position (reference goals.py:76-82)."""
    return features[..., jnp.asarray([_WZ, _WUP, _WVX, _WX])]


@goal_spaces("walker")
def walker_pos_speed_z(features: Array) -> Array:
    """walker_pos_speed + vertical velocity + y-angular momentum — the
    6D demo control space (reference goals.py:85-94)."""
    return features[..., jnp.asarray([_WZ, _WUP, _WVX, _WX, _WVZ, _WAM])]


@goal_spaces("quadruped")
def simplified_quadruped(features: Array) -> Array:
    """(upright, speed norm) (reference goals.py:97-103)."""
    speed = jnp.linalg.norm(features[..., 5:8], axis=-1, keepdims=True)
    return jnp.concatenate([features[..., :1], speed], axis=-1)


@goal_spaces("quadruped")
def quad_pos_speed(features: Array) -> Array:
    """(upright, workspace xyz, torso velocity xyz) — 7D
    (reference goals.py:106-112)."""
    return features[..., jnp.asarray([0, 2, 3, 4, 5, 6, 7])]


@goal_spaces("quadruped")
def quadruped_positions(features: Array) -> Array:
    """(ball - target, torso - target), target at the origin — 6D
    (reference goals.py:116-120; commented out there because the ball only
    exists in the fetch task — here the fetch env appends ball columns
    8:11 to its goal features, envs/quadruped.py). Only meaningful with
    task=quadruped_fetch."""
    ball = features[..., 8:11]
    torso = features[..., 2:5]
    return jnp.concatenate([ball, torso], axis=-1)


@goal_spaces("grid")
def grid_simple(physics: Array) -> Array:
    """Normalized (y, x) agent position from gridworld physics [y,x,gy,gx]."""
    return physics[..., :2]


@goal_spaces("jaco")
def simplified_jaco(features: Array) -> Array:
    """Tool-centre-point xyz (reference goals.py:54-57); jaco's
    goal_features IS the tcp position, so this is the identity."""
    return features[..., :3]


# ---------------------------------------------------------------- goals

@goals("simplified_walker")
def walker_stand() -> np.ndarray:
    return np.array([1.2, 1.0, 0], dtype=np.float32)


@goals("simplified_walker")
def walker_walk() -> np.ndarray:
    return np.array([1.2, 1.0, 2], dtype=np.float32)


@goals("simplified_walker")
def walker_run() -> np.ndarray:
    return np.array([1.2, 1.0, 4], dtype=np.float32)


@goals("simplified_quadruped")
def quadruped_stand() -> np.ndarray:
    return np.array([1.0, 0], dtype=np.float32)


@goals("simplified_quadruped")
def quadruped_walk() -> np.ndarray:
    return np.array([1.0, 0.6], dtype=np.float32)


@goals("simplified_quadruped")
def quadruped_run() -> np.ndarray:
    return np.array([1.0, 6], dtype=np.float32)


@goals("quadruped_positions")
def quadruped_fetch() -> np.ndarray:
    """Ball at the target and torso at the target (reference goals.py:157-160)."""
    return np.zeros((6,), dtype=np.float32)


@goals("simplified_point_mass_maze")
def point_mass_maze_reach_top_left() -> np.ndarray:
    return np.array([-0.15, 0.15], dtype=np.float32)


@goals("simplified_point_mass_maze")
def point_mass_maze_reach_top_right() -> np.ndarray:
    return np.array([0.15, 0.15], dtype=np.float32)


@goals("simplified_point_mass_maze")
def point_mass_maze_reach_bottom_left() -> np.ndarray:
    return np.array([-0.15, -0.15], dtype=np.float32)


@goals("simplified_point_mass_maze")
def point_mass_maze_reach_bottom_right() -> np.ndarray:
    return np.array([0.15, -0.15], dtype=np.float32)


@goals("walker_pos_speed_z")
def walker_dummy() -> np.ndarray:
    return np.zeros((6,), dtype=np.float32)


# jaco reach targets (reference goals.py:186-208 / jaco.py:62-65)

@goals("simplified_jaco")
def jaco_reach_top_left() -> np.ndarray:
    return np.array([-0.09, 0.09, 0.001], dtype=np.float32)


@goals("simplified_jaco")
def jaco_reach_top_right() -> np.ndarray:
    return np.array([0.09, 0.09, 0.001], dtype=np.float32)


@goals("simplified_jaco")
def jaco_reach_bottom_left() -> np.ndarray:
    return np.array([-0.09, -0.09, 0.001], dtype=np.float32)


@goals("simplified_jaco")
def jaco_reach_bottom_right() -> np.ndarray:
    return np.array([0.09, -0.09, 0.001], dtype=np.float32)
