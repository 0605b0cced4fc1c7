"""Training loops — the TPU-shaped replacements for the reference's
step-granular host loops.

The reference interleaves one host env step with one agent update
(url_benchmark/pretrain.py:559-659), paying a host<->device round trip per
step. Here the loop building blocks are fused XLA programs:

  * ``make_offline_trainer(agent, ...)`` — N gradient steps per device
    launch via lax.scan, with the replay SAMPLING fused into the scan body
    (sample + forward + backward + optimizer in one program). This is the
    train_offline.py:101-134 hot loop.
  * ``make_episode_collector(env, agent)`` — a full vectorized episode
    (lax.scan over time, vmap over env instances) in one device launch,
    replacing the reference's per-step act() round trip.
  * ``OnlineTrainer`` — anytrain-style cycles (url_benchmark/anytrain.py:133-164):
    collect one batch of episodes, commit to the buffer, run matched
    gradient steps.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from ..data import replay as replay_lib
from ..data.episode_batch import EpisodeBatch
from ..data.replay import ReplayState, SampleConfig
from ..envs.base import Environment, TimeStep

Array = jnp.ndarray


def make_offline_trainer(agent: tp.Any, sample_cfg: SampleConfig,
                         batch_size: int, steps_per_call: int,
                         with_future: bool = True) -> tp.Callable:
    """Returns jitted ``train_n(train_state, replay_state, key) ->
    (train_state, metrics)`` running ``steps_per_call`` fused updates.

    Metrics are the mean over the scanned steps (one host transfer per
    call, not per step).
    """

    def body(carry: tp.Tuple[tp.Any, jax.Array], _: None,
             replay_state: ReplayState) -> tp.Tuple[tp.Tuple[tp.Any, jax.Array], tp.Dict[str, Array]]:
        train_state, key = carry
        key, k_sample, k_update = jax.random.split(key, 3)
        batch = replay_lib.sample(replay_state, k_sample, batch_size,
                                  sample_cfg, with_future=with_future)
        train_state, metrics = agent._update(train_state, batch, k_update)
        return (train_state, key), metrics

    def train_n(train_state: tp.Any, replay_state: ReplayState,
                key: jax.Array) -> tp.Tuple[tp.Any, tp.Dict[str, Array]]:
        (train_state, _), metrics = jax.lax.scan(
            lambda c, x: body(c, x, replay_state), (train_state, key), None,
            length=steps_per_call)
        return train_state, jax.tree.map(lambda m: m.mean(), metrics)

    return jax.jit(train_n, donate_argnums=0)


def make_episode_collector(env: Environment, agent: tp.Any,
                           num_envs: int,
                           goal_fn: tp.Optional[tp.Callable[[Array], Array]] = None
                           ) -> tp.Callable:
    """Returns jitted ``collect(train_state, z, keys, step) -> trajectory``.

    Runs ``num_envs`` env instances for a full episode under one jit:
    lax.scan over time, vmap over instances. ``z`` is [num_envs, z_dim];
    ``keys`` is [num_envs] PRNG keys for resets. The trajectory pytree has
    leading dims [T+1, num_envs, ...] — including the episode's FIRST dummy
    transition, matching the replay layout
    (url_benchmark/in_memory_replay_buffer.py:104-133).
    """
    T = env.spec.episode_length

    def collect(train_state: tp.Any, z: Array, keys: jax.Array,
                step: Array, act_key: jax.Array) -> tp.Dict[str, Array]:
        env_states, first_ts = jax.vmap(env.reset)(keys)

        def scan_body(carry: tp.Tuple[tp.Any, TimeStep, jax.Array], _: None
                      ) -> tp.Tuple[tp.Tuple[tp.Any, TimeStep, jax.Array], TimeStep]:
            states, ts, key = carry
            key, k_act = jax.random.split(key)
            action = agent._act(train_state, ts.observation, z, step, k_act,
                                eval_mode=False)
            states, new_ts = jax.vmap(env.step)(states, action)
            return (states, new_ts, key), new_ts

        (_, _, _), traj = jax.lax.scan(
            scan_body, (env_states, first_ts, act_key), None, length=T)
        # prepend the FIRST dummy transition
        full = jax.tree.map(lambda f, t: jnp.concatenate([f[None], t], axis=0),
                            first_ts, traj)
        out = {
            "observation": full.observation,
            "action": (full.action[..., None] if full.action.ndim == 2
                       else full.action).astype(jnp.float32),
            "reward": full.reward[..., None],
            "discount": full.discount[..., None],
            "physics": full.physics,
        }
        if goal_fn is not None:
            out["goal"] = goal_fn(full.physics)
        return out

    return jax.jit(collect)


class OnlineTrainer:
    """anytrain-style episode-granular online loop
    (url_benchmark/anytrain.py:38-175), vectorized over envs.

    Each cycle: collect ``num_envs`` episodes in one device launch, commit
    them to the replay buffer, then run gradient steps matched to the env
    steps elapsed (num_envs * T / update_every_steps).
    """

    def __init__(self, env: Environment, agent: tp.Any,
                 buffer: tp.Any, num_envs: int = 1,
                 goal_fn: tp.Optional[tp.Callable[[Array], Array]] = None,
                 updates_per_step: float = 0.5) -> None:
        self.env = env
        self.agent = agent
        self.buffer = buffer
        self.num_envs = num_envs
        self.updates_per_step = updates_per_step
        self.collect = make_episode_collector(env, agent, num_envs, goal_fn)
        self._trainer: tp.Optional[tp.Callable] = None
        self.global_step = 0
        self.global_episode = 0

    def run_cycle(self, train_state: tp.Any, key: jax.Array
                  ) -> tp.Tuple[tp.Any, tp.Dict[str, float]]:
        k_z, k_reset, k_act, k_train = jax.random.split(key, 4)
        z = self.agent.sample_z(k_z, self.num_envs)
        reset_keys = jax.random.split(k_reset, self.num_envs)
        traj = self.collect(train_state, z, reset_keys,
                            jnp.asarray(self.global_step), k_act)
        # commit each env's episode ([T+1, num_envs, ...] -> per-env dicts)
        T = self.env.spec.episode_length
        traj_np = jax.tree.map(np.asarray, traj)
        for i in range(self.num_envs):
            episode = {k: v[:, i] for k, v in traj_np.items()}
            self.buffer.add_episode(episode)
        self.global_step += T * self.num_envs
        self.global_episode += self.num_envs

        n_updates = int(T * self.num_envs * self.updates_per_step)
        metrics: tp.Dict[str, float] = {}
        if n_updates > 0 and len(self.buffer) > 0:
            if self._trainer is None:
                self._trainer = make_offline_trainer(
                    self.agent, self.buffer.cfg, self.agent.cfg.batch_size,
                    steps_per_call=n_updates)
            train_state, m = self._trainer(train_state, self.buffer.state,
                                           k_train)
            metrics = {k: float(v) for k, v in m.items()}
        return train_state, metrics
