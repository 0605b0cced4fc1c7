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
    replacing the reference's per-step act() round trip. Works with any
    agent through the uniform meta-dict policy interface (policy_act /
    rollout_update_meta), including per-step meta resampling inside the
    scan (the reference's update_meta hook, pretrain.py:626). With
    ``hold_meta`` the per-step resampling is skipped entirely, so the
    caller's meta (e.g. a reward-inferred task z) drives the WHOLE
    episode — the jittable analogue of the reference's solved_meta
    rollouts (url_benchmark/agent/fb_ddpg.py:234-237).
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
from ..data.replay import ReplayState, SampleConfig
from ..envs.base import Environment

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


def init_meta_batched(agent: tp.Any, state: tp.Any, key: jax.Array,
                      n: int) -> tp.Dict[str, Array]:
    """Per-env meta dict [n, ...] via vmapped init_meta."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: agent.init_meta(state, k))(keys)


def make_episode_collector(env: Environment, agent: tp.Any,
                           num_envs: int,
                           goal_fn: tp.Optional[tp.Callable[[Array], Array]] = None,
                           mesh: tp.Optional[tp.Any] = None,
                           mesh_axis: str = "dp",
                           hold_meta: bool = False) -> tp.Callable:
    """Returns jitted ``collect(train_state, meta, keys, step, act_key) ->
    trajectory``.

    Runs ``num_envs`` env instances for a full episode under one jit:
    lax.scan over time, vmap over instances. ``meta`` is a dict of
    [num_envs, ...] arrays; it is resampled inside the scan via the
    agent's rollout_update_meta. The trajectory pytree has leading dims
    [T+1, num_envs, ...] — including the episode's FIRST dummy transition,
    matching the replay layout (url_benchmark/in_memory_replay_buffer.py:104-133).

    With ``mesh``, the env-instance axis is sharded over ``mesh_axis``:
    each device steps its slice of the vectorized envs (policy params
    replicated), so env-steps/s scales with the mesh — the north-star
    env-throughput axis (SURVEY §2.8). ``num_envs`` must be a multiple of
    the mesh size.
    """
    T = env.spec.episode_length
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        env_shard = NamedSharding(mesh, PartitionSpec(mesh_axis))

    def collect(train_state: tp.Any, meta: tp.Dict[str, Array],
                keys: jax.Array, step: Array,
                act_key: jax.Array) -> tp.Dict[str, Array]:
        if mesh is not None:
            keys = jax.lax.with_sharding_constraint(keys, env_shard)
            meta = jax.tree.map(
                lambda m: jax.lax.with_sharding_constraint(m, env_shard),
                meta)
        env_states, first_ts = jax.vmap(env.reset)(keys)

        def scan_body(carry, t):
            states, ts, meta, key = carry
            key, k_act, k_meta = jax.random.split(key, 3)
            if not hold_meta:
                meta = agent.rollout_update_meta(train_state, meta, t, k_meta)
            action = agent.policy_act(train_state, ts.observation, meta,
                                      step, k_act, eval_mode=False)
            states, new_ts = jax.vmap(env.step)(states, action)
            return (states, new_ts, meta, key), (new_ts, meta)

        (_, _, final_meta, _), (traj, metas) = jax.lax.scan(
            scan_body, (env_states, first_ts, meta, act_key),
            jnp.arange(T))
        # prepend the FIRST dummy transition (and the initial meta)
        full = jax.tree.map(lambda f, t: jnp.concatenate([f[None], t], axis=0),
                            first_ts, traj)
        full_meta = jax.tree.map(
            lambda m0, m: jnp.concatenate([m0[None], m], axis=0), meta, metas)
        out = {
            "observation": full.observation,
            "action": (full.action[..., None] if full.action.ndim == 2
                       else full.action).astype(jnp.float32),
            "reward": full.reward[..., None],
            "discount": full.discount[..., None],
            "physics": full.physics,
        }
        for name, value in full_meta.items():
            out[name] = value
        if goal_fn is not None:
            out["goal"] = goal_fn(full.physics)
        return out

    return jax.jit(collect)


class OnlineTrainer:
    """anytrain-style episode-granular online loop
    (url_benchmark/anytrain.py:38-175), vectorized over envs.

    Each cycle: collect ``num_envs`` episodes in one device launch, commit
    them to the replay buffer, then run gradient steps matched to the env
    steps elapsed (num_envs * T * updates_per_step).
    """

    def __init__(self, env: Environment, agent: tp.Any,
                 buffer: tp.Any, num_envs: int = 1,
                 goal_fn: tp.Optional[tp.Callable[[Array], Array]] = None,
                 updates_per_step: float = 0.5,
                 max_steps_per_call: int = 200,
                 mesh: tp.Optional[tp.Any] = None,
                 hold_meta: bool = False) -> None:
        self.env = env
        self.agent = agent
        self.buffer = buffer
        self.num_envs = num_envs
        self.updates_per_step = updates_per_step
        # cap gradient steps per device launch: one giant scanned program
        # (e.g. 1000 conv updates) can run long enough to trip the TPU
        # runtime watchdog and kill the worker; chunking costs nothing
        # (dispatch overhead is ~0 at >=50-step calls, see bench)
        self.max_steps_per_call = max_steps_per_call
        self.mesh = mesh
        self.collect = make_episode_collector(env, agent, num_envs, goal_fn,
                                              mesh=mesh, hold_meta=hold_meta)
        self._trainers: tp.Dict[int, tp.Callable] = {}
        self.global_step = 0
        self.global_episode = 0

    def run_cycle(self, train_state: tp.Any, key: jax.Array,
                  meta: tp.Optional[tp.Dict[str, Array]] = None
                  ) -> tp.Tuple[tp.Any, tp.Dict[str, float]]:
        """One collect+update cycle. ``meta`` overrides the per-env rollout
        meta (dict of [num_envs, ...] arrays, e.g. task-inferred z's for a
        directed-rollout mix); default is the agent's random init_meta."""
        k_meta, k_reset, k_act, k_train = jax.random.split(key, 4)
        if meta is None:
            meta = init_meta_batched(self.agent, train_state, k_meta,
                                     self.num_envs)
        reset_keys = jax.random.split(k_reset, self.num_envs)
        traj = self.collect(train_state, meta, reset_keys,
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
            done = 0
            while done < n_updates:
                chunk = min(self.max_steps_per_call, n_updates - done)
                if chunk not in self._trainers:
                    if self.mesh is not None:
                        from ..parallel.mesh import make_dp_offline_trainer
                        self._trainers[chunk] = make_dp_offline_trainer(
                            self.agent, self.buffer.cfg,
                            self.agent.cfg.batch_size, chunk, self.mesh)
                    else:
                        self._trainers[chunk] = make_offline_trainer(
                            self.agent, self.buffer.cfg,
                            self.agent.cfg.batch_size, steps_per_call=chunk)
                k_train, k_chunk = jax.random.split(k_train)
                train_state, m = self._trainers[chunk](
                    train_state, self.buffer.state, k_chunk)
                done += chunk
            metrics = {k: float(v) for k, v in m.items()}
        # per-episode train reward (the reference logs episode_reward per
        # collected episode, anytrain.py:105-117)
        metrics["episode_reward"] = float(traj_np["reward"][1:].sum(0).mean())
        return train_state, metrics
