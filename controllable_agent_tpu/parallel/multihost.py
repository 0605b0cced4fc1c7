"""Multi-host (pod-slice) scale-out scaffold.

The reference has no distributed machinery (single GPU; SLURM jobs only —
SURVEY §2.8). The TPU-native design for N hosts (BASELINE.json north star:
>=80% env-steps/s scaling from 1 to N>=2 hosts):

  * ``initialize()`` — jax.distributed.init across hosts (DCN);
  * one global mesh over all chips, ``dp`` axis = every device;
  * parameters replicated; each HOST collects episodes and holds a
    host-local replay shard (no cross-host replay traffic);
  * the learner step runs as one jit over globally-sharded batches: each
    host's devices sample from the LOCAL replay shard
    (host-local gather), gradients all-reduce over ICI within a host and
    DCN across hosts — the only bytes crossing DCN are gradient/parameter
    all-reduces, sized by model parameters (a few MB for FB nets);
  * eval/video run on host 0 only.

This module is exercised on a single host via
``jax.distributed.initialize`` being a no-op fallback; the N-host path
needs real pod hardware (not available in this environment — the
8-device virtual CPU mesh tests the sharding program, see
tests/test_loops_and_parallel.py).
"""

from __future__ import annotations

import typing as tp

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import make_dp_offline_trainer


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


class MultiHostTrainer:
    """Host-local replay shard + globally data-parallel learner.

    Every host builds this with its OWN replay buffer (episodes collected
    by that host's envs). The jitted step is identical on all hosts; jax
    runs it as one SPMD program.
    """

    def __init__(self, agent: tp.Any, buffer: tp.Any, batch_size: int,
                 steps_per_call: int, mesh: tp.Optional[Mesh] = None) -> None:
        self.agent = agent
        self.buffer = buffer
        self.mesh = mesh if mesh is not None else global_mesh()
        self.trainer = make_dp_offline_trainer(
            agent, buffer.cfg, batch_size, steps_per_call, self.mesh)

    def step(self, train_state: tp.Any, key: jax.Array):
        with self.mesh:
            return self.trainer(train_state, self.buffer.state, key)
