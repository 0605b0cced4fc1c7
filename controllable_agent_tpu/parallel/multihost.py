"""Multi-host (pod-slice) scale-out scaffold.

The reference has no distributed machinery (single GPU; SLURM jobs only —
SURVEY §2.8). The TPU-native design for N hosts (BASELINE.json north star:
>=80% env-steps/s scaling from 1 to N>=2 hosts):

  * ``initialize()`` — jax.distributed.init across hosts (DCN);
  * one global mesh over all chips, ``dp`` axis = every device;
  * parameters replicated; each HOST collects episodes and holds a
    host-local replay shard (no cross-host replay traffic);
  * per train call, each host samples its next ``steps_per_call`` batches
    from the LOCAL shard in one host-local jit (runs only on that host's
    devices — no collectives), then the per-host batch stack is assembled
    into a GLOBAL jax.Array with the batch axis sharded by process
    (``multihost_utils.host_local_array_to_global_array``);
  * the learner step is one global SPMD jit scanning over those batches:
    gradients all-reduce over ICI within a host and DCN across hosts — the
    only bytes crossing DCN are gradient/parameter all-reduces, sized by
    model parameters (a few MB for FB nets);
  * eval/video run on host 0 only, on a host-local materialization of the
    replicated parameters (``host_local_state`` below) so no global-array
    dispatch happens from a single process.

Multi-process JAX requires every array entering a global-mesh jit to be a
global jax.Array — per-host arrays with differing contents are rejected
(or silently assumed replicated). That is why sampling happens OUTSIDE the
global jit: the replay shards legitimately differ per host, so only the
assembled global batch (sharded by process) crosses into the SPMD program.

This module is exercised single-process in unit tests (8-device virtual
CPU mesh) and for real via a 2-process ``jax.distributed`` CPU smoke test
(tests/test_multihost_2proc.py) that spawns subprocesses.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: tp.Optional[str] = None,
               num_processes: tp.Optional[int] = None,
               process_id: tp.Optional[int] = None) -> None:
    """jax.distributed init; no-op when single-process (local run)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "dp") -> Mesh:
    """One 1-D mesh over every device of every host."""
    return Mesh(np.array(jax.devices()), (axis,))


def host_local_batch_size(global_batch: int) -> int:
    """Per-host slice of the global batch (each host feeds its devices)."""
    return global_batch // jax.process_count()


def host_local_state(state: tp.Any) -> tp.Any:
    """Materialize a REPLICATED global pytree as plain host-local arrays.

    Replicated sharding means every host's first addressable shard is the
    full value, so this needs no collective — safe to call from one
    process (host-0-only eval) without deadlocking the others.
    """
    def pull(x: tp.Any) -> tp.Any:
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return jnp.asarray(np.asarray(x.addressable_data(0)))
        return x
    return jax.tree.map(pull, state)


class MultiHostTrainer:
    """Host-local replay shard + globally data-parallel learner.

    Every host builds this with its OWN replay buffer (episodes collected
    or loaded by that host). ``step`` runs the same global SPMD program on
    all hosts; only the sampling jit is host-local.
    """

    def __init__(self, agent: tp.Any, buffer: tp.Any, batch_size: int,
                 steps_per_call: int, mesh: tp.Optional[Mesh] = None,
                 axis: str = "dp") -> None:
        from ..data import replay as replay_lib
        self.agent = agent
        self.buffer = buffer
        self.axis = axis
        self.steps_per_call = steps_per_call
        self.mesh = mesh if mesh is not None else global_mesh(axis)
        self.n_proc = jax.process_count()
        if batch_size % max(self.n_proc, 1):
            raise ValueError(f"batch_size {batch_size} must divide evenly "
                             f"over {self.n_proc} processes")
        self.local_batch = batch_size // self.n_proc

        local_bs = self.local_batch
        sample_cfg = buffer.cfg

        def sample_stack(replay_state: tp.Any, key: jax.Array):
            keys = jax.random.split(key, steps_per_call)
            return jax.vmap(
                lambda k: replay_lib.sample(replay_state, k, local_bs,
                                            sample_cfg))(keys)

        # host-local program: runs on this host's devices only
        self._sample_stack = jax.jit(sample_stack)

        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P(None, axis))

        def update_n(train_state: tp.Any, batches: tp.Any, key: jax.Array):
            batches = jax.lax.with_sharding_constraint(
                batches, jax.tree.map(lambda _: data, batches))

            def body(carry, batch):
                state, key = carry
                key, k = jax.random.split(key)
                state, metrics = agent._update(state, batch, k)
                state = jax.lax.with_sharding_constraint(
                    state, jax.tree.map(lambda _: repl, state))
                return (state, key), metrics

            (train_state, _), metrics = jax.lax.scan(
                body, (train_state, key), batches)
            return train_state, jax.tree.map(lambda m: m.mean(), metrics)

        self._update_n = jax.jit(update_n, donate_argnums=0)

    def _globalize(self, local_batches: tp.Any) -> tp.Any:
        """Per-host [steps, local_batch, ...] stacks -> one global array
        sharded (None, dp) over the global mesh."""
        if self.n_proc == 1:
            sharding = NamedSharding(self.mesh, P(None, self.axis))
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), local_batches)
        from jax.experimental import multihost_utils
        return multihost_utils.host_local_array_to_global_array(
            jax.device_get(local_batches), self.mesh, P(None, self.axis))

    def step(self, train_state: tp.Any, key: jax.Array):
        # sampling key diverges per host (disjoint shards, independent
        # draws); the update key is the SAME on every host — the SPMD
        # program needs globally consistent randomness
        k_sample = jax.random.fold_in(key, jax.process_index())
        local = self._sample_stack(self.buffer.state, k_sample)
        batches = self._globalize(local)
        with self.mesh:
            return self._update_n(train_state, batches, key)
