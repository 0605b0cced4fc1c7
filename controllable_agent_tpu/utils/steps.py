"""Host-side loop cadence helpers.

The reference drives its training loop one env-step at a time and gates
work with step-predicate objects (url_benchmark/utils.py:117-144). The
loops here advance in *strides* (a fused device call covers
``steps_per_call`` updates, a vectorized cycle covers
``num_envs * steps_per_env`` frames), so the natural cadence primitive
asks whether the last stride crossed a multiple of the cadence, and the
frame budget is a plain count of frames still owed.

These run on the host between device calls — never inside jit.
"""

from __future__ import annotations

import time
import typing as tp


def crossed(step: int, every: tp.Optional[int], stride: int = 1) -> bool:
    """Did the window ``(step - stride, step]`` cross a multiple of ``every``?

    With ``stride == 1`` this is the reference's ``Every`` predicate
    (``step % every == 0``); with a coarser stride it fires exactly once
    per cadence mark no matter how many frames one loop iteration covers.
    ``every=None`` (or 0) disables the cadence.
    """
    if not every:
        return False
    return step % every < stride


def frames_remaining(step: int, budget: tp.Optional[int],
                     action_repeat: int = 1) -> int:
    """Agent-steps still owed under a raw-frame budget.

    ``budget=None`` means unbounded (a large sentinel is returned so
    ``while frames_remaining(...) > 0`` keeps looping — the reference's
    ``Until(None)``). ``action_repeat`` converts the raw-frame budget into
    agent steps, matching the reference's bookkeeping.
    """
    if budget is None:
        return 1 << 62
    return budget // action_repeat - step


class Stopwatch:
    """Lap + total wall-clock timer for fps accounting.

    ``lap()`` returns (seconds since the previous lap, seconds since
    construction). Uses a monotonic clock — log timestamps must not jump
    with NTP adjustments mid-run.
    """

    def __init__(self) -> None:
        now = time.perf_counter()
        self._t0 = now
        self._lap = now

    def lap(self) -> tp.Tuple[float, float]:
        now = time.perf_counter()
        out = (now - self._lap, now - self._t0)
        self._lap = now
        return out

    @property
    def total(self) -> float:
        return time.perf_counter() - self._t0

    def __repr__(self) -> str:
        return f"Stopwatch(total={self.total:.3f}s)"
