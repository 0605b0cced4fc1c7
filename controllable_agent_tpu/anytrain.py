"""CLI: anytrain — episode-granular online training with updates matched
to env steps elapsed (reference url_benchmark/anytrain.py; this is the
recipe that trained the public demo agent, README.md:97-100).

    python -m controllable_agent_tpu.anytrain agent=fb_ddpg \
        task=walker_walk goal_space=walker_pos_speed_z
"""

from __future__ import annotations

import sys
import typing as tp

from .pretrain import main as _main


def main(argv: tp.Optional[tp.Sequence[str]] = None) -> None:
    args = list(argv if argv is not None else sys.argv[1:])
    if "--help" in args or "-h" in args:
        from .pretrain import print_help
        print_help(__doc__)
        return
    _main(args)


if __name__ == "__main__":
    main()
