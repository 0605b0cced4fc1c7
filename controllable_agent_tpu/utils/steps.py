"""Step predicates and a wall-clock timer.

Mirrors the reference's Until/Every/Timer helpers (url_benchmark/utils.py:117-161).
These are host-side loop controls — they never appear inside jit.
"""

from __future__ import annotations

import time
import typing as tp


def _repr(obj: tp.Any) -> str:
    items = {x: y for x, y in obj.__dict__.items() if not x.startswith("_")}
    params = ", ".join(f"{x}={y!r}" for x, y in sorted(items.items()))
    return f"{obj.__class__.__name__}({params})"


class Until:
    def __init__(self, until: tp.Optional[int], action_repeat: int = 1) -> None:
        self.until = until
        self.action_repeat = action_repeat

    def __call__(self, step: int) -> bool:
        if self.until is None:
            return True
        return step < self.until // self.action_repeat

    def __repr__(self) -> str:
        return _repr(self)


class Every:
    def __init__(self, every: tp.Optional[int], action_repeat: int = 1) -> None:
        self.every = every
        self.action_repeat = action_repeat

    def __call__(self, step: int) -> bool:
        if self.every is None:
            return False
        return step % (self.every // self.action_repeat) == 0

    def __repr__(self) -> str:
        return _repr(self)


class Timer:
    def __init__(self) -> None:
        self._start_time = time.time()
        self._last_time = time.time()

    def reset(self) -> tp.Tuple[float, float]:
        elapsed = time.time() - self._last_time
        self._last_time = time.time()
        return elapsed, time.time() - self._start_time

    def total_time(self) -> float:
        return time.time() - self._start_time
