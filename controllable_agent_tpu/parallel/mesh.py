"""Device-mesh data parallelism for the FB learner.

The reference has no distributed machinery (single GPU; scale-out was
SLURM-job-level — SURVEY §2.8). The TPU-native scaling axis is data
parallelism over a 1-D ``dp`` mesh: parameters replicated, batches sharded
on the leading axis, gradients all-reduced over ICI by XLA (jit +
NamedSharding constraints insert the psum automatically).

Model sizes here (MLPs, ≤ a few M params) make TP/PP unnecessary; DP plus
host-sharded envs/replay is the idiomatic mapping.
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: tp.Optional[int] = None, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicate_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: tp.Any, mesh: Mesh, axis: str = "dp") -> tp.Any:
    """Shard every leaf of a batch pytree along its leading dimension."""
    sharding = batch_spec(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_dp_offline_trainer(agent: tp.Any, sample_cfg: tp.Any,
                            batch_size: int, steps_per_call: int,
                            mesh: Mesh, axis: str = "dp") -> tp.Callable:
    """Data-parallel fused offline trainer: lax.scan over
    (sample -> update), with every sampled batch sharded on ``axis`` and
    the train state replicated. One XLA program per call; gradients
    all-reduce over ICI inside it.

    Replay storage may itself be sharded on the episode axis — the gather
    then runs device-local for same-shard episodes (XLA partitions it).
    """
    from ..data import replay as replay_lib

    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def train_n(train_state: tp.Any, replay_state: tp.Any, key: jax.Array):
        def body(carry, _):
            state, key = carry
            key, k_sample, k_update = jax.random.split(key, 3)
            batch = replay_lib.sample(replay_state, k_sample, batch_size,
                                      sample_cfg)
            batch = jax.lax.with_sharding_constraint(
                batch, jax.tree.map(lambda _: data, batch))
            state, metrics = agent._update(state, batch, k_update)
            state = jax.lax.with_sharding_constraint(
                state, jax.tree.map(lambda _: repl, state))
            return (state, key), metrics

        (train_state, _), metrics = jax.lax.scan(
            body, (train_state, key), None, length=steps_per_call)
        return train_state, jax.tree.map(lambda m: m.mean(), metrics)

    return jax.jit(train_n, donate_argnums=0)


def make_dp_trainer(agent: tp.Any, mesh: Mesh, axis: str = "dp") -> tp.Callable:
    """jitted data-parallel update: params replicated, batch sharded on
    ``axis``; XLA inserts the gradient all-reduce (psum over ICI).

    Returns ``dp_update(train_state, batch, key) -> (train_state, metrics)``.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    def dp_update(train_state: tp.Any, batch: tp.Any, key: jax.Array):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: data, batch))
        new_state, metrics = agent._update(train_state, batch, key)
        new_state = jax.lax.with_sharding_constraint(
            new_state, jax.tree.map(lambda _: repl, new_state))
        return new_state, metrics

    return jax.jit(dp_update, donate_argnums=0)
