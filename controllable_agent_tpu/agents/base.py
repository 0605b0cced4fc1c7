"""Agent protocol.

The reference's duck-typed agent protocol (url_benchmark/agent/fb_ddpg.py:161-520,
url_benchmark/agent/ddpg.py:223-403) — act / update / init_meta / update_meta /
get_goal_meta / infer_meta — survives here as a typed interface over pure
functions: every method takes the agent's TrainState pytree explicitly and
PRNG keys where randomness is involved; ``update`` returns a new state.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp

from ..data.episode_batch import EpisodeBatch

MetaDict = tp.Dict[str, jnp.ndarray]


class AgentProtocol(tp.Protocol):
    """Structural type for agents; all heavy methods are jit-compiled."""

    def init(self, key: jax.Array) -> tp.Any: ...

    def act(self, state: tp.Any, obs: jnp.ndarray, meta: MetaDict,
            step: jnp.ndarray, eval_mode: bool, key: jax.Array) -> jnp.ndarray: ...

    def update(self, state: tp.Any, batch: EpisodeBatch,
               key: jax.Array) -> tp.Tuple[tp.Any, tp.Dict[str, jnp.ndarray]]: ...

    def init_meta(self, state: tp.Any, key: jax.Array) -> MetaDict: ...
