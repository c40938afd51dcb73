"""Pallas TPU kernel: fused batched Riccati backward pass.

Why: the solver's hot op is the backward recursion over the horizon with
n, m <= ~64. Under plain vmap, XLA lays batched [B, n, n] matmuls out with
the tiny n on the 128-wide lane dimension (~9% utilization at n=12) — the
measured ceiling is a few hundred solves/s/chip. This kernel packs the
SCENARIO axis onto the lanes instead: every tensor is stored [..., B_blk]
with B_blk up to 1024 (8 sublanes x 128 lanes), so each small-matrix FMA is
a full-width VPU op across the whole scenario block.

Structure: grid = (B / B_blk, N-1) with the knot axis innermost, index-mapped
in reverse so the automatic pipeline streams per-knot blocks HBM->VMEM
backward in time (double-buffered by Pallas); the value-function carry
(Vxx [n,n,B_blk], Vx [n,B_blk]) lives in VMEM scratch across grid steps.
The m x m solve is an in-kernel Cholesky, scalarized over (i, j) with all
arithmetic on [B_blk]-wide vectors.

Numerics match solver.altro.backward_pass (same recursion, same
regularization); see tests/test_riccati_kernel.py for the parity check.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 1024  # scenarios per block: 8 sublanes x 128 lanes


def riccati_supported(n: int, m: int, batch: int) -> bool:
    """Kernel applicability: small dims, batch divisible into lane blocks."""
    return n <= 64 and m <= 64 and batch % 128 == 0


def _matmul(A, B, k):
    """C[i, j, :] = sum_p A[i, p, :] B[p, j, :]; unrolled over the (small)
    contraction dim — k vector FMAs of full lane width."""
    acc = A[:, 0, None, :] * B[None, 0, :, :]
    for p in range(1, k):
        acc = acc + A[:, p, None, :] * B[None, p, :, :]
    return acc


def _matvec(A, x, k):
    acc = A[:, 0, :] * x[None, 0, :]
    for p in range(1, k):
        acc = acc + A[:, p, :] * x[None, p, :]
    return acc


def _t(A):
    return A.transpose(1, 0, 2)


def _chol_factor(M, m, eps):
    """Lane-wise Cholesky of [m, m, Bb]; returns lower factor as lists."""
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        d = M[j, j, :]
        for p in range(j):
            d = d - L[j][p] * L[j][p]
        Ljj = jnp.sqrt(jnp.maximum(d, eps))
        L[j][j] = Ljj
        inv = 1.0 / Ljj
        for i in range(j + 1, m):
            s = M[i, j, :]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            L[i][j] = s * inv
    return L


def _chol_solve_cols(L, R, m, ncols):
    """Solve L L' X = R for R of shape [m, ncols, Bb]."""
    t = [[None] * ncols for _ in range(m)]
    for i in range(m):
        inv = 1.0 / L[i][i]
        for c in range(ncols):
            s = R[i, c, :]
            for p in range(i):
                s = s - L[i][p] * t[p][c]
            t[i][c] = s * inv
    x = [[None] * ncols for _ in range(m)]
    for i in range(m - 1, -1, -1):
        inv = 1.0 / L[i][i]
        for c in range(ncols):
            s = t[i][c]
            for p in range(i + 1, m):
                s = s - L[p][i] * x[p][c]
            x[i][c] = s * inv
    return jnp.stack([jnp.stack(row, axis=0) for row in x], axis=0)


def _kernel(n: int, m: int, N1: int, A_ref, B_ref, lx_ref, lu_ref, lxx_ref,
            luu_ref, lux_ref, reg_ref, K_ref, d_ref, dV_ref, Vx_ref, Vxx_ref,
            dVacc_ref):
    k_rev = pl.program_id(1)          # 0 .. N1-1; streams knot k = N1-1-k_rev

    @pl.when(k_rev == 0)
    def _init():
        # terminal expansion rides the first streamed block's (k+1) rows
        Vxx_ref[:] = lxx_ref[0, 1]
        Vx_ref[:] = lx_ref[0, 1]
        dVacc_ref[:] = jnp.zeros_like(dVacc_ref)

    A = A_ref[0]            # [n, n, Bb]
    Bm = B_ref[0]           # [n, m, Bb]
    lx = lx_ref[0, 0]       # [n, Bb]
    lu = lu_ref[0]          # [m, Bb]
    lxx = lxx_ref[0, 0]     # [n, n, Bb]
    luu = luu_ref[0]        # [m, m, Bb]
    lux = lux_ref[0]        # [m, n, Bb]
    reg = reg_ref[0]        # [Bb]
    Vxx = Vxx_ref[:]
    Vx = Vx_ref[:]

    VA = _matmul(Vxx, A, n)
    Qx = lx + _matvec(_t(A), Vx, n)
    Qu = lu + _matvec(_t(Bm), Vx, n)
    Qxx = lxx + _matmul(_t(A), VA, n)
    Quu = luu + _matmul(_t(Bm), _matmul(Vxx, Bm, n), n)
    Qux = lux + _matmul(_t(Bm), VA, n)

    Quu_reg = Quu + jnp.eye(m, dtype=Quu.dtype)[:, :, None] * reg[None, None, :]
    L = _chol_factor(Quu_reg, m, 1e-12)
    rhs = jnp.concatenate([Qux, Qu[:, None, :]], axis=1)  # [m, n+1, Bb]
    sol = _chol_solve_cols(L, rhs, m, n + 1)
    Kk = -sol[:, :n, :]
    dk = -sol[:, n, :]

    K_ref[0] = Kk
    d_ref[0] = dk

    QuuK = _matmul(Quu, Kk, m)                    # [m, n, Bb]
    Quud = _matvec(Quu, dk, m)                    # [m, Bb]
    Vx_new = Qx + _matvec(_t(Kk), Quud, m) + _matvec(_t(Kk), Qu, m) \
        + _matvec(_t(Qux), dk, m)
    KtQux = _matmul(_t(Kk), Qux, m)
    Vxx_new = Qxx + _matmul(_t(Kk), QuuK, m) + KtQux + _t(KtQux)
    Vxx_new = 0.5 * (Vxx_new + _t(Vxx_new))

    Vx_ref[:] = Vx_new
    Vxx_ref[:] = Vxx_new

    dVacc_ref[0, :] = dVacc_ref[0, :] + jnp.sum(dk * Qu, axis=0)
    dVacc_ref[1, :] = dVacc_ref[1, :] + 0.5 * jnp.sum(dk * Quud, axis=0)

    @pl.when(k_rev == N1 - 1)
    def _flush():
        dV_ref[:] = dVacc_ref[:]


def batched_riccati(A, B, lx, lu, lxx, luu, lux, reg,
                    interpret: bool = False) -> Tuple:
    """Batched Riccati backward pass (drop-in for vmapped
    solver.altro.backward_pass).

    A: [Bt, N-1, n, n], B: [Bt, N-1, n, m], lx/lxx: [Bt, N, ...],
    lu/luu/lux: [Bt, N, ...] (terminal control rows ignored), reg: [Bt].
    Returns K [Bt, N-1, m, n], d [Bt, N-1, m], dV1 [Bt], dV2 [Bt].
    """
    Bt, N1, n, _ = A.shape
    m = B.shape[-1]
    blk = min(LANE_BLOCK, Bt)
    assert Bt % blk == 0, (Bt, blk)
    nb = Bt // blk
    dtype = A.dtype

    def lm(x):  # [Bt, N, ...] -> [N, ..., Bt]
        return jnp.moveaxis(x, 0, -1)

    def pair(x):  # [N, ..., Bt] -> [N-1, 2, ..., Bt] rows (k, k+1)
        return jnp.stack([x[:-1], x[1:]], axis=1)

    A_l = lm(A)
    B_l = lm(B)
    lx_p = pair(lm(lx))
    lxx_p = pair(lm(lxx))
    lu_l = lm(lu)[:N1]
    luu_l = lm(luu)[:N1]
    lux_l = lm(lux)[:N1]
    reg2 = reg[None, :]  # [1, Bt]

    idx4 = lambda b, k: (N1 - 1 - k, 0, 0, b)      # noqa: E731
    idx5 = lambda b, k: (N1 - 1 - k, 0, 0, 0, b)   # noqa: E731
    idx3 = lambda b, k: (N1 - 1 - k, 0, b)         # noqa: E731

    kernel = functools.partial(_kernel, n, m, N1)
    K, d, dV = pl.pallas_call(
        kernel,
        grid=(nb, N1),
        in_specs=[
            pl.BlockSpec((1, n, n, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, m, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, blk), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n, n, blk), idx5, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, m, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, n, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk), lambda b, k: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m, n, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, blk), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, blk), lambda b, k: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1, m, n, Bt), dtype),
            jax.ShapeDtypeStruct((N1, m, Bt), dtype),
            jax.ShapeDtypeStruct((2, Bt), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, blk), dtype),          # Vx carry
            pltpu.VMEM((n, n, blk), dtype),       # Vxx carry
            pltpu.VMEM((2, blk), dtype),          # dV accumulators
        ],
        interpret=interpret,
    )(A_l, B_l, lx_p, lu_l, lxx_p, luu_l, lux_l, reg2)

    K_out = jnp.moveaxis(K, -1, 0)
    d_out = jnp.moveaxis(d, -1, 0)
    return K_out, d_out, dV[0], dV[1]
