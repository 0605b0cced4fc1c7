"""Core Forward-Backward representation math as pure functions.

The measure estimate is M = F · Bᵀ over a batch; the FB Bellman residual
penalizes off-diagonal entries against the discounted target measure and
maximizes the diagonal (reference update_fb, url_benchmark/agent/fb_ddpg.py:291-387).
Factored out so FB / discrete-FB / UVF / SF agents share one implementation.

All matmuls here are [batch, z_dim] x [z_dim, batch] — large, batched, and
MXU-friendly; ``precision`` defaults to HIGHEST because the M-matrix
difference enters a squared loss (bf16 matmul noise would bias gradients).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp

Array = jnp.ndarray
# DEFAULT precision: on this TPU backend HIGHEST forces a multi-pass
# f32 emulation that dominates the step (~4x slower end-to-end); the
# f32 casts at the loss boundaries already pin the accumulation
# numerics (loss curves match HIGHEST to 4 decimals).
_PREC = jax.lax.Precision.DEFAULT


def sample_z(key: jax.Array, size: int, z_dim: int, norm_z: bool = True) -> Array:
    """Scaled-normalized Gaussian z (reference sample_z, fb_ddpg.py:224-232)."""
    k1, k2 = jax.random.split(key)
    gaussian = jax.random.normal(k1, (size, z_dim))
    gaussian = gaussian / jnp.maximum(
        jnp.linalg.norm(gaussian, axis=-1, keepdims=True), 1e-12)
    if norm_z:
        return math.sqrt(z_dim) * gaussian
    uniform = jax.random.uniform(k2, (size, z_dim))
    return math.sqrt(z_dim) * uniform * gaussian


def off_diagonal_mask(n: int) -> Array:
    return ~jnp.eye(n, dtype=bool)


def fb_loss_terms(f1: Array, f2: Array, b: Array, target_m: Array,
                  discount: Array) -> tp.Tuple[Array, Array, Array]:
    """Returns (fb_loss, fb_diag, fb_offdiag).

    M_i = F_i · Bᵀ; loss = 0.5 Σ_i mean_offdiag (M_i − γ·target_M)² −
    Σ_i mean diag(M_i). ``discount`` is [batch, 1] and broadcasts row-wise.

    Inputs are upcast to float32: when the nets run in bfloat16 on the MXU,
    the cheap [batch, z_dim] x [z_dim, batch] loss matmuls still happen in
    full precision (squared-residual losses amplify matmul noise).
    """
    f1, f2, b = (x.astype(jnp.float32) for x in (f1, f2, b))
    target_m = target_m.astype(jnp.float32)
    n = f1.shape[0]
    m1 = jnp.einsum("sd,td->st", f1, b, precision=_PREC)
    m2 = jnp.einsum("sd,td->st", f2, b, precision=_PREC)
    off = off_diagonal_mask(n)
    denom = n * (n - 1)
    resid1 = jnp.where(off, m1 - discount * target_m, 0.0)
    resid2 = jnp.where(off, m2 - discount * target_m, 0.0)
    fb_offdiag = 0.5 * (jnp.sum(jnp.square(resid1)) + jnp.sum(jnp.square(resid2))) / denom
    fb_diag = -(jnp.trace(m1) + jnp.trace(m2)) / n
    return fb_offdiag + fb_diag, fb_diag, fb_offdiag


def orthonormality_loss(b: Array) -> tp.Tuple[Array, Array, Array]:
    """B-embedding orthonormality regularizer (reference fb_ddpg.py:344-348).

    Cov = B·Bᵀ; loss = mean_offdiag Cov² − 2·mean diag(Cov).
    Returns (orth_loss, diag_term, offdiag_term).
    """
    b = b.astype(jnp.float32)
    n = b.shape[0]
    cov = jnp.einsum("sd,td->st", b, b, precision=_PREC)
    off = off_diagonal_mask(n)
    diag_term = -2.0 * jnp.trace(cov) / n
    offdiag_term = jnp.sum(jnp.where(off, jnp.square(cov), 0.0)) / (n * (n - 1))
    return offdiag_term + diag_term, diag_term, offdiag_term
