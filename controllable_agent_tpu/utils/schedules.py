"""Schedule string parser, jit-compatible.

Mirrors the reference's schedule mini-language (url_benchmark/utils.py:235-255):
a constant (``"0.2"``), ``linear(init,final,duration)`` and
``step_linear(init,final1,duration1,final2,duration2)``.

Unlike the reference — which re-parses the string every step on the host —
``schedule(spec)`` parses once and returns a pure function of a (possibly
traced) integer step, so it can live inside a jitted train step.
"""

from __future__ import annotations

import re
import typing as tp

import jax.numpy as jnp

Step = tp.Union[int, jnp.ndarray]


def schedule(spec: str) -> tp.Callable[[Step], jnp.ndarray]:
    try:
        const = float(spec)

        def _const(step: Step) -> jnp.ndarray:
            return jnp.asarray(const, dtype=jnp.float32)

        return _const
    except ValueError:
        pass

    match = re.match(r"linear\((.+),(.+),(.+)\)", spec)
    if match:
        init, final, duration = (float(g) for g in match.groups())

        def _linear(step: Step) -> jnp.ndarray:
            mix = jnp.clip(jnp.asarray(step, jnp.float32) / duration, 0.0, 1.0)
            return (1.0 - mix) * init + mix * final

        return _linear

    match = re.match(r"step_linear\((.+),(.+),(.+),(.+),(.+)\)", spec)
    if match:
        init, final1, duration1, final2, duration2 = (float(g) for g in match.groups())

        def _step_linear(step: Step) -> jnp.ndarray:
            s = jnp.asarray(step, jnp.float32)
            mix1 = jnp.clip(s / duration1, 0.0, 1.0)
            first = (1.0 - mix1) * init + mix1 * final1
            mix2 = jnp.clip((s - duration1) / duration2, 0.0, 1.0)
            second = (1.0 - mix2) * final1 + mix2 * final2
            return jnp.where(s <= duration1, first, second)

        return _step_linear

    raise NotImplementedError(spec)
