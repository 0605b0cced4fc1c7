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


class ZMetaMixin:
    """Uniform meta-dict policy interface for agents whose act() takes the
    task vector under ``meta_key`` ("z", "task", "g"). Gives every agent

        policy_act(state, obs, meta_dict, step, key, eval_mode)
        rollout_update_meta(state, meta, t, key)  # in-episode resampling

    both traceable inside the vectorized episode collector (the reference's
    update_meta host hook, url_benchmark/agent/fb_ddpg.py:246-256, done
    per-step inside the scan instead).
    """

    meta_key: str = "z"

    def policy_act(self, state: tp.Any, obs: jnp.ndarray, meta: MetaDict,
                   step: jnp.ndarray, key: jax.Array,
                   eval_mode: bool = False) -> jnp.ndarray:
        return self.act(state, obs, meta[self.meta_key], step, key,
                        eval_mode=eval_mode)

    def infer_meta(self, state: tp.Any, buffer: tp.Any,
                   key: jax.Array) -> MetaDict:
        """Generic task inference from a replay buffer's STORED rewards
        (reference agent.infer_meta, fb_ddpg.py:188-199 — the eval-meta
        fallback path, pretrain.py:184-186): sample num_inference_steps
        transitions and regress z on them; agents without a regression API
        fall back to a random task vector."""
        cfg = self.cfg
        n = getattr(cfg, "num_inference_steps", 5120)
        k_sample, k_init = jax.random.split(key)
        has_sa = hasattr(self, "infer_meta_from_obs_action_and_rewards")
        has_s = hasattr(self, "infer_meta_from_obs_and_rewards")
        if not (has_sa or has_s) or len(buffer) == 0:
            return self.init_meta(state, k_init)
        batch = buffer.sample(k_sample, n)
        obs = (batch.next_goal
               if (getattr(cfg, "goal_space", None) is not None
                   and batch.next_goal is not None) else batch.next_obs)
        if has_sa:
            z = self.infer_meta_from_obs_action_and_rewards(
                state, obs, batch.action, batch.reward)
        else:
            z = self.infer_meta_from_obs_and_rewards(state, obs, batch.reward)
        return {self.meta_key: z}

    def rollout_update_meta(self, state: tp.Any, meta: MetaDict,
                            t: jnp.ndarray, key: jax.Array) -> MetaDict:
        """Resample the task vector every update_z_every_step env steps
        (probability update_z_proba), batched over envs."""
        cfg = self.cfg
        every = getattr(cfg, "update_z_every_step", 0)
        if not every or not hasattr(self, "sample_z"):
            return meta
        k_p, k_z = jax.random.split(key)
        z = meta[self.meta_key]
        n = z.shape[0]
        proba = getattr(cfg, "update_z_proba", 1.0)
        resample = ((t % every) == 0) & (
            jax.random.uniform(k_p, (n, 1)) < proba)
        new_z = self.sample_z(k_z, n)
        return {**meta, self.meta_key: jnp.where(resample, new_z, z)}
