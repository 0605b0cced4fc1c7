"""ExORL-format episode ingestion.

The reference loads ExORL .npz episode files (keys: observation, action,
reward, discount, physics; shape [T+1, ...]) into its buffer with optional
physics-replay relabeling (url_benchmark/in_memory_replay_buffer.py:33-55,
192-208). This importer reads the same format; relabeling happens in the
caller as a batched pure function over the stored physics.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import numpy as np


def load_episode(fn: Path) -> tp.Dict[str, np.ndarray]:
    with fn.open("rb") as f:
        episode = np.load(f)
        return {k: episode[k].astype(np.float32) for k in episode.keys()}


def load_exorl_episodes(replay_dir: Path,
                        limit: tp.Optional[int] = None,
                        shard: int = 0, num_shards: int = 1
                        ) -> tp.Iterator[tp.Dict[str, np.ndarray]]:
    """Yield episodes; ``shard``/``num_shards`` round-robin the episode
    files across hosts so each host loads a disjoint replay shard
    (multi-host ingestion — no cross-host replay traffic). ``limit`` is a
    GLOBAL cap applied before sharding, so total load across hosts is
    ``limit`` regardless of num_shards."""
    eps_fns = sorted(replay_dir.glob("*.npz"))
    if limit is not None:
        eps_fns = eps_fns[:limit]
    if num_shards > 1:
        eps_fns = eps_fns[shard::num_shards]
    for fn in eps_fns:
        yield load_episode(fn)


def save_exorl_episodes(replay_state: tp.Any, out_dir: Path) -> int:
    """Export a ReplayState's committed episodes as ExORL-format .npz files
    (one file per episode, arrays [T+1, ...], the format the reference's
    buffer loads — in_memory_replay_buffer.py:192-208). Returns the number
    of episodes written. Padding beyond each episode's real length is
    trimmed."""
    out_dir.mkdir(parents=True, exist_ok=True)
    storage = {k: np.asarray(v) for k, v in replay_state.storage.items()}
    lengths = np.asarray(replay_state.ep_lengths)
    n = int(replay_state.n_episodes)
    for i in range(n):
        t = int(lengths[i]) + 1
        episode = {k: v[i, :t] for k, v in storage.items()}
        np.savez(out_dir / f"episode_{i:06d}_{t - 1}.npz", **episode)
    return n
