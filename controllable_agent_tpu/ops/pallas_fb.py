"""Pallas TPU kernel: fused Forward-Backward loss.

The FB loss builds four batch×batch matrices (M1, M2, target-M, and the
B-covariance) from [batch, z_dim] embeddings, then reduces them to five
scalars (off-diag residual energy, diagonal sums, orthonormality terms —
reference update_fb, url_benchmark/agent/fb_ddpg.py:311-348). XLA
materializes those matrices in HBM (f32 batch=4096 → 64 MB each, several
reads/writes per step plus their gradients). This kernel tiles the batch
both ways and accumulates the scalar reductions on-chip: the M-matrices
never leave VMEM, cutting the loss's HBM traffic from O(batch²) to
O(batch·z_dim).

Forward emits the scalar loss pieces; the custom VJP recomputes each tile's
residuals in a second kernel and accumulates dF1/dF2/dB directly. Target
inputs are constants (stop-gradient in the caller).

Use via ``fb_loss_terms_fused(f1, f2, b, tf1, tf2, tb, discount)`` —
numerically equivalent to composing ops.fb.fb_loss_terms +
orthonormality_loss with target_m = min(tf1·tbᵀ, tf2·tbᵀ).
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_TILE = 256
# interpret mode lets the kernel run (slowly) on CPU for tests/parity
_INTERPRET = jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _row_ids(i: Array, bm: int, bn: int) -> tp.Tuple[Array, Array]:
    rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 1)
    return rows, cols


def _tile_matrices(f1, f2, b, tf1, tf2, tb, disc):
    """Common per-tile computation: residuals + cov for one (i,j) tile."""
    m1 = jnp.dot(f1, b.T, preferred_element_type=jnp.float32)
    m2 = jnp.dot(f2, b.T, preferred_element_type=jnp.float32)
    tm = jnp.minimum(
        jnp.dot(tf1, tb.T, preferred_element_type=jnp.float32),
        jnp.dot(tf2, tb.T, preferred_element_type=jnp.float32))
    resid1 = m1 - disc * tm
    resid2 = m2 - disc * tm
    return m1, m2, resid1, resid2


def _fwd_kernel(f1_ref, f2_ref, b_ref, tf1_ref, tf2_ref, tb_ref, disc_ref,
                bi_ref, bj_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bm, d = f1_ref.shape
    bn = b_ref.shape[0]

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        # SMEM stores must be scalar on TPU
        out_ref[0, 0] = 0.0
        out_ref[0, 1] = 0.0

    m1, m2, resid1, resid2 = _tile_matrices(
        f1_ref[...], f2_ref[...], b_ref[...], tf1_ref[...], tf2_ref[...],
        tb_ref[...], disc_ref[...])
    rows, cols = _row_ids(i, bm, bn)
    gr = i * bm + rows
    gc = j * bn + cols
    diag = gr == gc
    # cross-batch-boundary padding guard (batch may not divide the tile)
    valid = jnp.logical_and(gr < bi_ref[0], gc < bj_ref[0])
    off = jnp.logical_and(~diag, valid)
    diag = jnp.logical_and(diag, valid)

    out_ref[0, 0] += jnp.sum(jnp.where(off, resid1 * resid1, 0.0)) + \
        jnp.sum(jnp.where(off, resid2 * resid2, 0.0))
    out_ref[0, 1] += jnp.sum(jnp.where(diag, m1 + m2, 0.0))


def _cov_kernel(bi_tile_ref, bj_tile_ref, n_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    bm = bi_tile_ref.shape[0]
    bn = bj_tile_ref.shape[0]

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        out_ref[0, 0] = 0.0
        out_ref[0, 1] = 0.0

    cov = jnp.dot(bi_tile_ref[...], bj_tile_ref[...].T,
                  preferred_element_type=jnp.float32)
    rows, cols = _row_ids(i, bm, bn)
    gr = i * bm + rows
    gc = j * bn + cols
    diag = gr == gc
    valid = jnp.logical_and(gr < n_ref[0], gc < n_ref[0])
    off = jnp.logical_and(~diag, valid)
    diag = jnp.logical_and(diag, valid)
    out_ref[0, 0] += jnp.sum(jnp.where(off, cov * cov, 0.0))
    out_ref[0, 1] += jnp.sum(jnp.where(diag, cov, 0.0))


def _pad_rows(x: Array, to: int) -> Array:
    pad = to - x.shape[0]
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fb_loss_terms_fused(f1: Array, f2: Array, b: Array, tf1: Array,
                        tf2: Array, tb: Array, discount: Array
                        ) -> tp.Tuple[Array, Array, Array, Array]:
    """Returns (fb_offdiag_sum, fb_diag_sum, orth_offdiag_sum,
    orth_diag_sum) — UNnormalized sums; the caller applies the
    1/(n(n-1)), 1/n factors (ops/fb.py conventions)."""
    return _fused_forward(f1, f2, b, tf1, tf2, tb, discount)


def _fused_forward(f1, f2, b, tf1, tf2, tb, discount):
    n = f1.shape[0]
    tiles = _cdiv(n, _TILE)
    np_ = tiles * _TILE
    f1p, f2p, bp = (_pad_rows(x.astype(jnp.float32), np_) for x in (f1, f2, b))
    tf1p, tf2p, tbp = (_pad_rows(x.astype(jnp.float32), np_)
                       for x in (tf1, tf2, tb))
    discp = _pad_rows(discount.astype(jnp.float32).reshape(-1, 1), np_)
    nn = jnp.full((1,), n, jnp.int32)

    d = f1p.shape[1]
    row = lambda i, j: (i, 0)  # noqa: E731
    col = lambda i, j: (j, 0)  # noqa: E731
    grid = (tiles, tiles)
    fb_out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        interpret=_INTERPRET,
        in_specs=[
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),  # f1 rows
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),  # f2 rows
            pl.BlockSpec((_TILE, d), col, memory_space=pltpu.VMEM),  # b cols
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),  # tf1 rows
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),  # tf2 rows
            pl.BlockSpec((_TILE, d), col, memory_space=pltpu.VMEM),  # tb cols
            pl.BlockSpec((_TILE, 1), row, memory_space=pltpu.VMEM),  # discount
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n (rows)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n (cols)
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
    )(f1p, f2p, bp, tf1p, tf2p, tbp, discp, nn, nn)

    cov_out = pl.pallas_call(
        _cov_kernel,
        grid=grid,
        interpret=_INTERPRET,
        in_specs=[
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
    )(bp, bp, nn)

    return (fb_out[0, 0], fb_out[0, 1], cov_out[0, 0], cov_out[0, 1])


def _bwd_kernel(f1_ref, f2_ref, b_ref, tf1_ref, tf2_ref, tb_ref, disc_ref,
                bi_ref, bj_ref, g_ref, df1_ref, df2_ref):
    """Per-tile gradient accumulation for the ROW-indexed outputs dF1, dF2."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    bm, d = f1_ref.shape
    bn = b_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        df1_ref[...] = jnp.zeros_like(df1_ref)
        df2_ref[...] = jnp.zeros_like(df2_ref)

    m1, m2, resid1, resid2 = _tile_matrices(
        f1_ref[...], f2_ref[...], b_ref[...], tf1_ref[...], tf2_ref[...],
        tb_ref[...], disc_ref[...])
    rows, cols = _row_ids(i, bm, bn)
    gr = i * bm + rows
    gc = j * bn + cols
    diag = gr == gc
    valid = jnp.logical_and(gr < bi_ref[0], gc < bj_ref[0])
    off = jnp.logical_and(~diag, valid).astype(jnp.float32)
    diagf = jnp.logical_and(diag, valid).astype(jnp.float32)

    g_off = g_ref[0]  # d(loss)/d(offdiag_sum)
    g_diag = g_ref[1]  # d(loss)/d(diag_sum)
    # d(offdiag_sum)/dF1_i = 2 Σ_j off·resid1 · B_j ; diag: + g_diag·B_i
    w1 = 2.0 * g_off * off * resid1 + g_diag * diagf
    w2 = 2.0 * g_off * off * resid2 + g_diag * diagf
    df1_ref[...] += jnp.dot(w1, b_ref[...],
                            preferred_element_type=jnp.float32)
    df2_ref[...] += jnp.dot(w2, b_ref[...],
                            preferred_element_type=jnp.float32)


def _bwd_db_kernel(f1_ref, f2_ref, b_ref, tf1_ref, tf2_ref, tb_ref,
                   disc_ref, bi_ref, bj_ref, g_ref, db_ref):
    """dB accumulation: for column tile j (block-indexed output), sum over
    row tiles i of resid1ᵀ·F1 + resid2ᵀ·F2, plus the orthonormality
    gradient (4·Σ off·cov·B + 2·g_covdiag·B)."""
    i = pl.program_id(1)  # NOTE: row axis iterates fastest here
    j = pl.program_id(0)
    bn, d = b_ref.shape
    bm = f1_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        db_ref[...] = jnp.zeros_like(db_ref)

    m1, m2, resid1, resid2 = _tile_matrices(
        f1_ref[...], f2_ref[...], b_ref[...], tf1_ref[...], tf2_ref[...],
        tb_ref[...], disc_ref[...])
    rows, cols = _row_ids(i, bm, bn)
    gr = i * bm + rows
    gc = j * bn + cols
    diag = gr == gc
    valid = jnp.logical_and(gr < bi_ref[0], gc < bj_ref[0])
    off = jnp.logical_and(~diag, valid).astype(jnp.float32)
    diagf = jnp.logical_and(diag, valid).astype(jnp.float32)

    g_off, g_diag, g_covoff, g_covdiag = (g_ref[0], g_ref[1], g_ref[2],
                                          g_ref[3])
    w1 = 2.0 * g_off * off * resid1 + g_diag * diagf
    w2 = 2.0 * g_off * off * resid2 + g_diag * diagf
    db_ref[...] += (jnp.dot(w1.T, f1_ref[...],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(w2.T, f2_ref[...],
                              preferred_element_type=jnp.float32))
    # orthonormality: cov tile between B rows (i) and B cols (j) — but this
    # kernel's b_ref is the COLUMN tile; the row tile of B rides in place of
    # f1/f2? No: the cov gradient needs B_i which is not loaded here, so the
    # caller adds the (cheap, [n,d]-sized) cov gradient outside the kernel.
    del g_covoff, g_covdiag


def _fused_fwd_rule(f1, f2, b, tf1, tf2, tb, discount):
    out = _fused_forward(f1, f2, b, tf1, tf2, tb, discount)
    return out, (f1, f2, b, tf1, tf2, tb, discount)


def _fused_bwd_rule(res, g):
    f1, f2, b, tf1, tf2, tb, discount = res
    g_off, g_diag, g_covoff, g_covdiag = g
    n = f1.shape[0]
    tiles = _cdiv(n, _TILE)
    np_ = tiles * _TILE
    d = f1.shape[1]
    f1p, f2p, bp = (_pad_rows(x.astype(jnp.float32), np_) for x in (f1, f2, b))
    tf1p, tf2p, tbp = (_pad_rows(x.astype(jnp.float32), np_)
                       for x in (tf1, tf2, tb))
    discp = _pad_rows(discount.astype(jnp.float32).reshape(-1, 1), np_)
    nn = jnp.full((1,), n, jnp.int32)
    gvec = jnp.stack([g_off, g_diag, g_covoff, g_covdiag]).astype(jnp.float32)

    row = lambda i, j: (i, 0)  # noqa: E731
    col = lambda i, j: (j, 0)  # noqa: E731
    grid = (tiles, tiles)
    df1, df2 = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        interpret=_INTERPRET,
        in_specs=[
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((np_, d), jnp.float32)] * 2,
    )(f1p, f2p, bp, tf1p, tf2p, tbp, discp, nn, nn, gvec)

    # dB from the M-residual terms: grid transposed so the column tile is
    # the slow (output) axis
    rowT = lambda j, i: (i, 0)  # noqa: E731
    colT = lambda j, i: (j, 0)  # noqa: E731
    db = pl.pallas_call(
        _bwd_db_kernel,
        grid=grid,
        interpret=_INTERPRET,
        in_specs=[
            pl.BlockSpec((_TILE, d), rowT, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), rowT, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), rowT, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), rowT, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, d), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, 1), rowT, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, d), colT, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, d), jnp.float32),
    )(f1p, f2p, bp, tf1p, tf2p, tbp, discp, nn, nn, gvec)

    # orthonormality gradient is O(n·d) math — plain XLA is fine:
    # d/dB [Σ_off cov² + Σ_diag cov] = 4·(cov⊙off)·B ... computed exactly:
    bf = b.astype(jnp.float32)
    cov = jnp.dot(bf, bf.T, preferred_element_type=jnp.float32)
    off_mask = ~jnp.eye(n, dtype=bool)
    cov_off = jnp.where(off_mask, cov, 0.0)
    db_orth = (4.0 * g_covoff * jnp.dot(cov_off, bf,
                                        preferred_element_type=jnp.float32)
               + 2.0 * g_covdiag * bf)

    df1 = df1[:n].astype(f1.dtype)
    df2 = df2[:n].astype(f2.dtype)
    db_total = (db[:n] + db_orth).astype(b.dtype)
    zeros = lambda x: jnp.zeros_like(x)  # noqa: E731
    # discount is replay data (never differentiated) — zero cotangent
    return (df1, df2, db_total, zeros(tf1), zeros(tf2), zeros(tb),
            zeros(discount))


fb_loss_terms_fused.defvjp(_fused_fwd_rule, _fused_bwd_rule)
