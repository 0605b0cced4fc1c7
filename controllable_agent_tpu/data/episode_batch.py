"""EpisodeBatch — the transition batch pytree.

Equivalent of the reference's EpisodeBatch (url_benchmark/replay_buffer.py:27-103)
as a flax.struct pytree: it crosses jit boundaries directly, so there is no
``.to(device)`` — batches are born on device. ``collate_fn`` and ``unpack``
survive as pytree ops.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


class EpisodeBatch(struct.PyTreeNode):
    obs: Array
    action: Array
    reward: Array
    next_obs: Array
    discount: Array
    meta: tp.Dict[str, Array] = struct.field(default_factory=dict)
    goal: tp.Optional[Array] = None
    next_goal: tp.Optional[Array] = None
    future_obs: tp.Optional[Array] = None
    future_goal: tp.Optional[Array] = None
    physics: tp.Optional[Array] = None

    def with_no_reward(self) -> "EpisodeBatch":
        return self.replace(reward=jnp.zeros_like(self.reward))

    def unpack(self) -> tp.Tuple[Array, Array, Array, Array, Array]:
        """Legacy tuple order (obs, action, reward, discount, next_obs)."""
        return (self.obs, self.action, self.reward, self.discount, self.next_obs)

    @classmethod
    def collate_fn(cls, batches: tp.Sequence["EpisodeBatch"]) -> "EpisodeBatch":
        """Stack a list of batches along a leading axis (reference:
        url_benchmark/replay_buffer.py:66-92 via torch default_collate)."""
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *batches)
