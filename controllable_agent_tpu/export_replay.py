"""CLI: export a checkpoint's replay shard as ExORL-format .npz episodes.

Interop bridge: the reference ecosystem exchanges exploration datasets as
directories of per-episode .npz files (keys observation/action/reward/
discount/physics, arrays [T+1, ...] — url_benchmark/
in_memory_replay_buffer.py:192-208). This tool turns any checkpoint written
by this framework (pretrain/anytrain/train_online) into that format, so a
buffer collected here can feed the reference's train_offline (and vice
versa via our ``replay_dir=``).

    python -m controllable_agent_tpu.export_replay \
        checkpoint=exp_local/models/latest out_dir=/tmp/episodes
"""

from __future__ import annotations

import sys
import typing as tp
from pathlib import Path

from .data.exorl import save_exorl_episodes
from .train.checkpoint import load_checkpoint


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    if "--help" in argv or "-h" in argv or not argv:
        print(__doc__)
        return
    opts = dict(arg.split("=", 1) for arg in argv)
    unknown = set(opts) - {"checkpoint", "out_dir"}
    if unknown:
        raise ValueError(f"Unknown override keys: {sorted(unknown)}")
    ckpt = Path(opts["checkpoint"])
    out_dir = Path(opts["out_dir"])
    restored = load_checkpoint(ckpt, only=["replay"])
    if "replay" not in restored:
        raise ValueError(f"{ckpt} holds no replay shard")
    n = save_exorl_episodes(restored["replay"], out_dir)
    print(f"wrote {n} episodes to {out_dir}")


if __name__ == "__main__":
    main()
