"""Pytree parameter utilities (soft/hard target updates, norms).

Mirrors soft_update_params/hard_update_params/param_norm
(url_benchmark/utils.py:66-108) as pure pytree maps usable inside jit —
one fused XLA op per leaf instead of a per-parameter host loop.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp


def soft_update(params: tp.Any, target_params: tp.Any, tau: float) -> tp.Any:
    """target <- tau * params + (1 - tau) * target, as a pure function."""
    return jax.tree.map(lambda p, t: tau * p + (1.0 - tau) * t, params, target_params)


def hard_update(params: tp.Any) -> tp.Any:
    return jax.tree.map(lambda p: p, params)


def param_norm(params: tp.Any, order: float = 2.0) -> jnp.ndarray:
    leaves = jax.tree.leaves(params)
    norms = jnp.stack([jnp.linalg.norm(x.ravel(), ord=order) for x in leaves])
    return jnp.linalg.norm(norms, ord=order)


def tree_size(params: tp.Any) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
