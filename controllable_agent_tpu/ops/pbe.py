"""Particle-based entropy (PBE) and running mean-std.

Re-implements the reference's PBE kNN entropy estimator and RMS
(url_benchmark/utils.py:293-357) as pure JAX functions. PBE is the
intrinsic reward of APT/APS/Proto/MaxEnt: r ∝ log(1 + mean_k ||s − s_k||)
over the k nearest neighbors in representation space.

The [batch, batch] distance matrix is one MXU matmul; top-k runs on
device — the reference's per-batch torch.cdist/topk host round trips
disappear into the jitted update.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


class RMSState(struct.PyTreeNode):
    """Running mean/std (reference utils.RMS, utils.py:293-313)."""

    mean: Array
    var: Array  # actually S = std accumulator in reference; we keep M2-style
    n: Array

    @classmethod
    def create(cls, shape: tp.Tuple[int, ...] = (1,)) -> "RMSState":
        return cls(mean=jnp.zeros(shape), var=jnp.ones(shape),
                   n=jnp.ones(()))


def rms_update(state: RMSState, x: Array) -> tp.Tuple[RMSState, Array, Array]:
    bs = x.shape[0]
    delta = jnp.mean(x, axis=0) - state.mean
    new_n = state.n + bs
    new_mean = state.mean + delta * bs / new_n
    new_var = (state.var * state.n + jnp.var(x, axis=0) * bs
               + jnp.square(delta) * state.n * bs / new_n) / new_n
    new_state = RMSState(mean=new_mean, var=new_var, n=new_n)
    return new_state, new_mean, jnp.sqrt(new_var)


def pbe(rep: Array, rms: RMSState, knn_k: int = 16, knn_avg: bool = True,
        knn_clip: float = 0.0005, knn_rms: bool = True,
        ) -> tp.Tuple[Array, RMSState]:
    """kNN particle-based entropy reward (reference utils.PBE,
    utils.py:316-357). rep: [batch, dim]; returns ([batch, 1], new rms)."""
    sq = jnp.sum(jnp.square(rep), axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.matmul(
        rep, rep.T, precision=jax.lax.Precision.HIGHEST)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    # k smallest distances (excluding nothing — reference includes self-0s)
    neg_topk = -jax.lax.top_k(-dist, knn_k)[0]  # [batch, k]
    if not knn_avg:  # only the k-th nearest
        reward = neg_topk[:, -1:]
        new_rms, mean, std = rms_update(rms, reward.reshape(-1, 1))
        if knn_rms:
            reward = reward / std
        reward = jnp.maximum(reward - knn_clip, 0.0)
    else:
        reward = neg_topk.reshape(-1, 1)  # [batch*k, 1]
        new_rms, mean, std = rms_update(rms, reward)
        if knn_rms:
            reward = reward / std
        reward = jnp.maximum(reward - knn_clip, 0.0)
        reward = reward.reshape(rep.shape[0], knn_k).mean(axis=1, keepdims=True)
    reward = jnp.log(reward + 1.0)
    return reward, new_rms
