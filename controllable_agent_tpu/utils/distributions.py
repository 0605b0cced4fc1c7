"""Policy distributions as lightweight pytree-friendly classes.

Re-implements the reference's TruncatedNormal and SquashedNormal
(url_benchmark/utils.py:164-232) as explicit-key JAX objects usable inside
jit/vmap. Sampling takes a PRNG key; the truncated-normal clamp keeps the
straight-through gradient of the reference (gradients flow to ``loc``
through the unclamped sample).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp


class TruncatedNormal:
    """Normal with straight-through clamped samples in [low, high]."""

    def __init__(self, loc: jnp.ndarray, scale: jnp.ndarray,
                 low: float = -1.0, high: float = 1.0, eps: float = 1e-6) -> None:
        self.loc = loc
        self.scale = scale
        self.low = low
        self.high = high
        self.eps = eps

    @property
    def mean(self) -> jnp.ndarray:
        return self.loc

    def _clamp(self, x: jnp.ndarray) -> jnp.ndarray:
        clamped = jnp.clip(x, self.low + self.eps, self.high - self.eps)
        # straight-through: forward value is clamped, gradient is identity
        return x + jax.lax.stop_gradient(clamped - x)

    def sample(self, key: jax.Array, clip: tp.Optional[float] = None) -> jnp.ndarray:
        eps = jax.random.normal(key, self.loc.shape, self.loc.dtype) * self.scale
        if clip is not None:
            eps = jnp.clip(eps, -clip, clip)
        return self._clamp(self.loc + eps)

    def log_prob(self, value: jnp.ndarray) -> jnp.ndarray:
        var = jnp.square(self.scale)
        return (-jnp.square(value - self.loc) / (2 * var)
                - jnp.log(self.scale) - 0.5 * math.log(2 * math.pi))


class SquashedNormal:
    """tanh(Normal(loc, scale)) with stable log-det-Jacobian."""

    def __init__(self, loc: jnp.ndarray, scale: jnp.ndarray) -> None:
        self.loc = loc
        self.scale = scale

    @property
    def mean(self) -> jnp.ndarray:
        return jnp.tanh(self.loc)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """Reparameterized sample (rsample in torch terms)."""
        x = self.loc + jax.random.normal(key, self.loc.shape, self.loc.dtype) * self.scale
        return jnp.tanh(x)

    def sample_with_pre_tanh(self, key: jax.Array) -> tp.Tuple[jnp.ndarray, jnp.ndarray]:
        x = self.loc + jax.random.normal(key, self.loc.shape, self.loc.dtype) * self.scale
        return jnp.tanh(x), x

    def _normal_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        var = jnp.square(self.scale)
        return (-jnp.square(x - self.loc) / (2 * var)
                - jnp.log(self.scale) - 0.5 * math.log(2 * math.pi))

    def log_prob_from_pre_tanh(self, pre_tanh: jnp.ndarray) -> jnp.ndarray:
        # log|d tanh(x)/dx| = 2*(log2 - x - softplus(-2x)); numerically stable
        log_det = 2.0 * (math.log(2.0) - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
        return self._normal_log_prob(pre_tanh) - log_det

    def log_prob(self, value: jnp.ndarray) -> jnp.ndarray:
        pre_tanh = jnp.arctanh(jnp.clip(value, -1 + 1e-6, 1 - 1e-6))
        return self.log_prob_from_pre_tanh(pre_tanh)
