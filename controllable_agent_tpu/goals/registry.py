"""Two-level goal-space / goal registries.

Same shape as the reference's Register (url_benchmark/goals.py:27-45):
``goal_spaces`` maps domain -> {space_name: fn}, ``goals`` maps
space_name -> {task_name: fn}. Goal-space functions here are pure JAX
functions of a *physics feature vector* (each env documents its physics
layout) instead of host callbacks into a live MuJoCo env, so goal
extraction vmaps over batched rollouts on device.
"""

from __future__ import annotations

import functools
import typing as tp

F = tp.TypeVar("F", bound=tp.Callable)


class Register(tp.Generic[F]):
    def __init__(self) -> None:
        self.funcs: tp.Dict[str, tp.Dict[str, F]] = {}

    def __call__(self, name: str) -> tp.Callable[[F], F]:
        return functools.partial(self._register, name=name)

    def _register(self, func: F, name: str) -> F:
        fname = func.__name__
        subdict = self.funcs.setdefault(name, {})
        if fname in subdict:
            raise ValueError(f"Already registered a function {fname} for {name}")
        subdict[fname] = func
        return func

    def lookup(self, fname: str) -> tp.Tuple[str, F]:
        """Find (domain, fn) by function name across all domains."""
        for domain, subdict in self.funcs.items():
            if fname in subdict:
                return domain, subdict[fname]
        raise KeyError(fname)


# goal_spaces: domain -> {space_name: physics_vector -> goal_vector}
goal_spaces: Register = Register()
# goals: space_name -> {task_name: () -> goal_vector}
goals: Register = Register()
