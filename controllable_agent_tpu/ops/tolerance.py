"""dm_control-style tolerance reward, as a pure JAX function.

The reference relies on ``dm_control.utils.rewards.tolerance`` for nearly
every task reward (e.g. point-mass maze reach,
url_benchmark/custom_dmc_tasks/point_mass_maze.py:193-203; MazeMultiGoal,
url_benchmark/goals.py:404-412). This is a from-scratch JAX implementation
of the same mathematical definition so rewards stay jittable/vmappable and
can run inside the env step or the batched relabel path on device.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp

Array = jnp.ndarray


def _sigmoid(x: Array, value_at_1: float, sigmoid: str) -> Array:
    if sigmoid == "gaussian":
        scale = jnp.sqrt(-2.0 * jnp.log(value_at_1))
        return jnp.exp(-0.5 * jnp.square(x * scale))
    if sigmoid == "hyperbolic":
        scale = jnp.arccosh(1.0 / value_at_1)
        return 1.0 / jnp.cosh(x * scale)
    if sigmoid == "long_tail":
        scale = jnp.sqrt(1.0 / value_at_1 - 1.0)
        return 1.0 / (jnp.square(x * scale) + 1.0)
    if sigmoid == "reciprocal":
        scale = 1.0 / value_at_1 - 1.0
        return 1.0 / (jnp.abs(x) * scale + 1.0)
    if sigmoid == "cosine":
        scale = jnp.arccos(2.0 * value_at_1 - 1.0) / jnp.pi
        scaled = x * scale
        return jnp.where(jnp.abs(scaled) < 1,
                         (1.0 + jnp.cos(jnp.pi * scaled)) / 2.0, 0.0)
    if sigmoid == "linear":
        scale = 1.0 - value_at_1
        scaled = x * scale
        return jnp.where(jnp.abs(scaled) < 1, 1.0 - scaled, 0.0)
    if sigmoid == "quadratic":
        scale = jnp.sqrt(1.0 - value_at_1)
        scaled = x * scale
        return jnp.where(jnp.abs(scaled) < 1, 1.0 - jnp.square(scaled), 0.0)
    if sigmoid == "tanh_squared":
        scale = jnp.arctanh(jnp.sqrt(1.0 - value_at_1))
        return 1.0 - jnp.square(jnp.tanh(x * scale))
    raise ValueError(f"Unknown sigmoid type {sigmoid!r}.")


def tolerance(x: Array,
              bounds: tp.Tuple[float, float] = (0.0, 0.0),
              margin: float = 0.0,
              sigmoid: str = "gaussian",
              value_at_margin: float = 0.1) -> Array:
    """Reward 1 inside ``bounds``, dropping to ``value_at_margin`` at
    ``margin`` outside, via the chosen sigmoid."""
    lower, upper = bounds
    if lower > upper:
        raise ValueError("Lower bound must be <= upper bound.")
    if margin < 0:
        raise ValueError("margin must be non-negative.")
    x = jnp.asarray(x)
    in_bounds = jnp.logical_and(lower <= x, x <= upper)
    if margin == 0:
        return jnp.where(in_bounds, 1.0, 0.0)
    d = jnp.where(x < lower, lower - x, x - upper) / margin
    return jnp.where(in_bounds, 1.0, _sigmoid(d, value_at_margin, sigmoid))
