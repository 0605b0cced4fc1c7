"""CLI: multi-host (pod-slice) offline training over DCN.

The reference has no distributed training at all (single GPU; SLURM-level
scale-out only — SURVEY §2.8); this entry point is the TPU-native
scale-out axis the north star asks for. Design (parallel/multihost.py):

  * ``jax.distributed`` init across hosts (coordinator over DCN);
  * each host loads a DISJOINT replay shard (ExORL episode files
    round-robined by process index — no cross-host replay traffic);
  * one global 1-D ``dp`` mesh over every chip of every host; parameters
    replicated, sampled batches sharded; the fused sample->update scan runs
    as one SPMD program with gradient all-reduce over ICI within a host
    and DCN across hosts;
  * logging / eval / checkpointing happen on process 0 only (the train
    step itself is identical on every host).

Usage — run the SAME command on every host, varying process_id:

    python -m controllable_agent_tpu.train_multihost agent=fb_ddpg \
        task=walker_walk replay_dir=/data/rnd_walker \
        coordinator=10.0.0.2:1234 num_processes=4 process_id=$WORKER_ID

Single-process invocation (num_processes absent or 1) degrades to a
plain data-parallel run over the local devices, which is how the CLI is
exercised in tests (8-device virtual CPU mesh).
"""

from __future__ import annotations

import sys
import typing as tp
from pathlib import Path

import jax


def _build_workspace_class():
    """Deferred class creation: on real pods every jax device query must
    come after jax.distributed initialization in main()."""
    import contextlib

    from .parallel.multihost import host_local_state
    from .train.workspace import OfflineWorkspace

    class _MultiHostOfflineWorkspace(OfflineWorkspace):
        def _make_offline_trainer(self) -> tp.Callable:
            from .parallel.multihost import MultiHostTrainer
            self._mh_trainer = MultiHostTrainer(
                self.agent, self.buffer, self.agent.cfg.batch_size,
                steps_per_call=self.cfg.steps_per_call)
            return lambda state, key: self._mh_trainer.step(state, key)

        @contextlib.contextmanager
        def _local_agent_state(self) -> tp.Iterator[None]:
            """Swap the (replicated, global-mesh) agent state for a
            host-local copy so eval jits dispatch from this process alone
            — dispatching a global array from one process would either
            raise (non-fully-addressable) or deadlock a collective."""
            global_state = self.agent_state
            self.agent_state = host_local_state(global_state)
            try:
                yield
            finally:
                self.agent_state = global_state

        # host-0-only side effects; the SPMD train step runs everywhere
        def evaluate(self) -> tp.Dict[str, float]:
            if jax.process_index() != 0:
                return {}
            with self._local_agent_state():
                return super().evaluate()

        def finalize(self) -> tp.Dict[str, tp.List[float]]:
            if jax.process_index() != 0:
                return {}
            with self._local_agent_state():
                return super().finalize()

        def save_checkpoint(self, path: tp.Optional[Path] = None,
                            **kwargs: tp.Any) -> None:
            if jax.process_index() != 0:
                return
            with self._local_agent_state():
                super().save_checkpoint(path, **kwargs)

    return _MultiHostOfflineWorkspace


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--help" in argv or "-h" in argv:
        from .pretrain import print_help
        print_help(__doc__)
        return
    coordinator: tp.Optional[str] = None
    num_processes: tp.Optional[int] = None
    process_id: tp.Optional[int] = None
    replay_dir: tp.Optional[str] = None
    relabel = True
    physics_format = "native"
    rest: tp.List[str] = []
    for arg in argv:
        key, _, val = arg.partition("=")
        if key == "coordinator":
            coordinator = val
        elif key == "num_processes":
            num_processes = int(val)
        elif key == "process_id":
            process_id = int(val)
        elif key == "replay_dir":
            replay_dir = val
        elif key == "relabel":
            relabel = val.lower() == "true"
        elif key == "physics_format":
            physics_format = val  # foreign-physics adapter (data/exorl.py)
        else:
            rest.append(arg)

    # distributed init MUST precede any other jax call on real pods
    from .parallel import multihost
    multihost.initialize(coordinator_address=coordinator,
                         num_processes=num_processes, process_id=process_id)

    from .data.exorl import load_exorl_episodes
    from .goals import get_reward_function
    from .pretrain import split_overrides
    from .config import apply_overrides
    from .train.workspace import WorkspaceConfig

    agent_name, ws_overrides, agent_overrides = split_overrides(rest)
    cfg = apply_overrides(WorkspaceConfig(agent_name=agent_name), ws_overrides)
    if jax.process_index() != 0:
        # WorkspaceConfig is frozen; non-coordinator hosts log quietly into
        # a per-process subfolder so train.csv/config.json on a shared
        # filesystem never clobber host 0's
        import dataclasses
        cfg = dataclasses.replace(
            cfg, use_console=False,
            folder=str(Path(cfg.folder) / f"host_{jax.process_index()}"))
    ws = _build_workspace_class()(cfg, agent_cfg_overrides=agent_overrides)

    if replay_dir is not None:
        episodes = load_exorl_episodes(
            Path(replay_dir), shard=jax.process_index(),
            num_shards=jax.process_count(), physics_format=physics_format)
        if relabel:
            reward_fn = get_reward_function(ws.cfg.task, ws.cfg.seed)
            episodes = (
                {**ep, "reward": reward_fn.from_physics(ep["physics"]).reshape(-1, 1)}
                for ep in episodes)
        if ws.goal_fn is not None:
            import numpy as np
            episodes = (
                {**ep, "goal": np.asarray(ws.goal_fn(ep["physics"]))}
                for ep in episodes)
        ws.buffer.load_episodes(episodes)
    ws.train()


if __name__ == "__main__":
    main()
