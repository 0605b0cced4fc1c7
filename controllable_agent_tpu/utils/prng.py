"""PRNG key plumbing.

The reference seeds torch/numpy globally (url_benchmark/utils.py:50-55); JAX
requires explicit key threading. ``KeyChain`` is the host-side convention:
one root key per workspace, split on demand for env resets, z resampling,
batch sampling, and eval reward seeding. Inside jit, keys are ordinary
arguments split with ``jax.random.split``.
"""

from __future__ import annotations

import jax


class KeyChain:
    """Stateful host-side key dispenser (never used inside jit)."""

    def __init__(self, seed: int) -> None:
        self._key = jax.random.key(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int) -> jax.Array:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return jax.numpy.stack(subs)
