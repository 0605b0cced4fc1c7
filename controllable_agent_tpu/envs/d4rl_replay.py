"""D4RL replay environment — dm_env-style eval over converted datasets.

The reference wraps live gym/d4rl environments (D4RLWrapper,
url_benchmark/d4rl_benchmark.py:35-76) and logs d4rl normalized scores
during eval (pretrain.py:413-414). The d4rl/gym/mujoco-py stack is not
installable in this image, so this module provides the same environment
surface over the one thing that IS available — the converted dataset
(data/d4rl.py): `reset` picks a stored episode, `step` replays its next
transition (the agent's action is recorded but cannot influence the
replay), and `get_normalized_score` applies the published reference
scores exactly as the reference logs them.

This exercises the full d4rl wiring (task dispatch, eval loop,
normalized-score column in eval.csv) and scores the dataset's behavior
policy; swap in a live simulator adapter for on-policy scores when the
gym stack exists. Everything is jit-friendly: episodes live as a padded
device-array pytree and reset/step are pure functions of (state, key).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.d4rl import D4RLConfig, d4rl_to_episodes, normalized_score
from .base import Environment, EnvSpec, StepType, TimeStep

Array = jnp.ndarray


class D4RLReplayState(struct.PyTreeNode):
    episode: Array  # int32 scalar — which stored episode is replaying
    t: Array  # int32 scalar — current row within the episode


class D4RLReplayEnv(Environment):
    """Replay converted d4rl episodes through the Environment API."""

    def __init__(self, domain: str, observations: np.ndarray,
                 actions: np.ndarray, rewards: np.ndarray,
                 discounts: np.ndarray, lengths: np.ndarray) -> None:
        # padded [E, T+1, ...] arrays; lengths[e] = transitions in episode e
        self.domain = domain
        self._obs = jnp.asarray(observations)
        self._actions = jnp.asarray(actions)
        self._rewards = jnp.asarray(rewards)
        self._discounts = jnp.asarray(discounts)
        self._lengths = jnp.asarray(lengths, jnp.int32)
        episode_length = int(observations.shape[1] - 1)
        self.spec = EnvSpec(
            obs_dim=int(observations.shape[-1]),
            action_dim=int(actions.shape[-1]),
            physics_dim=1,  # reference EmptyPhysics (d4rl_benchmark.py:24-28)
            goal_dim=0, episode_length=episode_length)

    @classmethod
    def from_dataset(cls, domain: str, dataset: tp.Dict[str, np.ndarray],
                     cfg: tp.Optional[D4RLConfig] = None) -> "D4RLReplayEnv":
        episodes = list(d4rl_to_episodes(dataset, cfg))
        if not episodes:
            raise ValueError("dataset contains no complete episodes")
        max_t = max(ep["observation"].shape[0] for ep in episodes)

        def pad(rows: np.ndarray) -> np.ndarray:
            out = np.zeros((max_t,) + rows.shape[1:], rows.dtype)
            out[: len(rows)] = rows
            return out

        obs = np.stack([pad(ep["observation"]) for ep in episodes])
        act = np.stack([pad(ep["action"]) for ep in episodes])
        rew = np.stack([pad(ep["reward"]) for ep in episodes])
        dis = np.stack([pad(ep["discount"]) for ep in episodes])
        lengths = np.array([ep["observation"].shape[0] - 1
                            for ep in episodes])
        return cls(domain, obs, act, rew, dis, lengths)

    @classmethod
    def from_npz(cls, domain: str, path: str,
                 cfg: tp.Optional[D4RLConfig] = None) -> "D4RLReplayEnv":
        with np.load(path) as data:
            dataset = {k: data[k] for k in data.files}
        return cls.from_dataset(domain, dataset, cfg)

    def get_normalized_score(self, total_reward: float) -> float:
        """reference D4RLWrapper.get_normalized_score (d4rl_benchmark.py:56)."""
        return normalized_score(self.domain, total_reward)

    # -- Environment API -------------------------------------------------
    def _timestep(self, state: D4RLReplayState, first: bool) -> TimeStep:
        e, t = state.episode, state.t
        length = self._lengths[e]
        past_end = t >= length
        step_type = jnp.where(
            first, StepType.FIRST,
            jnp.where(past_end, StepType.LAST, StepType.MID)).astype(jnp.int32)
        reward = jnp.where(first | (t > length), 0.0,
                           self._rewards[e, jnp.minimum(t, length), 0])
        return TimeStep(
            step_type=step_type,
            reward=reward.astype(jnp.float32),
            discount=self._discounts[e, jnp.minimum(t, length), 0],
            observation=self._obs[e, jnp.minimum(t, length)],
            action=self._actions[e, jnp.minimum(t, length)],
            physics=jnp.zeros((1,), jnp.float32),
        )

    def reset(self, key: jax.Array) -> tp.Tuple[D4RLReplayState, TimeStep]:
        e = jax.random.randint(key, (), 0, self._lengths.shape[0])
        state = D4RLReplayState(episode=e.astype(jnp.int32),
                                t=jnp.zeros((), jnp.int32))
        return state, self._timestep(state, first=True)

    def step(self, state: D4RLReplayState, action: Array
             ) -> tp.Tuple[D4RLReplayState, TimeStep]:
        del action  # replay: the dataset's transition stream is fixed
        new_state = state.replace(t=state.t + 1)
        return new_state, self._timestep(new_state, first=False)
