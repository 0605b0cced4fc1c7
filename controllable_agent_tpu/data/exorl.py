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
                        limit: tp.Optional[int] = None
                        ) -> tp.Iterator[tp.Dict[str, np.ndarray]]:
    eps_fns = sorted(replay_dir.glob("*.npz"))
    if limit is not None:
        eps_fns = eps_fns[:limit]
    for fn in eps_fns:
        yield load_episode(fn)
