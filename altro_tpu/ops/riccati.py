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

# Per-kernel scoped-VMEM budget for picking the lane-block width. The chip
# limit is 16M; the pipeline double-buffers streamed inputs/outputs, so the
# estimate is 2*(inputs+outputs) + scratch per block, with every block's
# second-to-last dim padded to the f32 sublane tile of 8 (callers pass
# padded per-lane float counts via :func:`pad8`). 10M leaves headroom for
# what the model still misses — measured: the n=m=12 quadruped config
# overflows the limit at blk=1024 and fits at 512.
VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def pad8(x: int) -> int:
    """f32 sublane padding: a block's second-to-last dim occupies a multiple
    of 8 rows in VMEM."""
    return (x + 7) // 8 * 8


def pick_lane_block(batch: int, in_out_floats: int, scratch_floats: int,
                    itemsize: int = 4) -> int:
    """Largest lane-block width (multiple of 128, dividing ``batch``) whose
    double-buffered per-grid-step VMEM footprint fits the budget.

    ``in_out_floats``/``scratch_floats`` are per-lane float counts of the
    streamed blocks and the carry scratch (sublane-padded; see :func:`pad8`).
    Large state/control dims (the quadruped's n=m=12) overflow the 16M
    scoped-vmem limit at blk=1024; shrinking the block (the grid's batch
    dimension gains steps) trades a little pipeline overhead for fitting —
    B=1024 then runs as 2x512 blocks instead of failing to compile.

    Candidates walk k*128 widths DESCENDING (not blk //= 2): halving a
    non-power-of-two multiple like 640 would yield 320 — still dividing the
    batch but breaking the kernels' 128-lane packing. Every candidate here
    is a multiple of 128; if even 128 overflows the budget it is returned
    anyway (the budget is a heuristic with headroom, and callers gate batch
    % 128 via riccati_supported). Batches below 128 (interpret-mode tests)
    run as a single block."""
    if batch < 128:
        return batch
    for k in range(min(LANE_BLOCK, batch) // 128, 1, -1):
        blk = k * 128
        if batch % blk == 0:
            bytes_est = itemsize * blk * (2 * in_out_floats + scratch_floats)
            if bytes_est <= VMEM_BUDGET_BYTES:
                return blk
    return 128


def riccati_supported(n: int, m: int, batch: int) -> bool:
    """Kernel applicability: small dims, batch divisible into lane blocks."""
    return n <= 64 and m <= 64 and batch % 128 == 0


# All small-matrix algebra below works on row-slabs ([cols, Bb] arrays) and
# [Bb]-wide vectors with explicit python indexing. Mosaic's TPU lowering
# rejects >2D transposes / stacks / concats (they become gathers), so
# transposition is done by swapping loop indices and nothing is ever
# concatenated inside the kernel.

def _mm_nn(A, B, r, k):
    """C = A @ B; A, B as lists of row slabs [*, Bb]. Returns row slabs.

    Note the static ``p:p+1`` slices: mixed integer+newaxis indexing lowers
    to a gather, which Mosaic rejects for these shapes."""
    return [sum(A[i][p:p + 1, :] * B[p] for p in range(k)) for i in range(r)]


def _mm_tn(A, B, r, k):
    """C = A' @ B; A as list of k row slabs of width r."""
    return [sum(A[p][i:i + 1, :] * B[p] for p in range(k)) for i in range(r)]


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

    A = [A_ref[0, i] for i in range(n)]     # n row slabs [n, Bb]
    Bm = [B_ref[0, i] for i in range(n)]    # n row slabs [m, Bb]
    lx = lx_ref[0, 0]                       # [n, Bb]
    lu = lu_ref[0]                          # [m, Bb]
    lxx = [lxx_ref[0, 0, i] for i in range(n)]
    luu = [luu_ref[0, i] for i in range(m)]
    lux = [lux_ref[0, i] for i in range(m)]
    reg = reg_ref[0]                        # [Bb]
    Vxx = [Vxx_ref[i] for i in range(n)]
    Vx = Vx_ref[:]                          # [n, Bb]

    VA = _mm_nn(Vxx, A, n, n)               # n row slabs [n, Bb]
    VB = _mm_nn(Vxx, Bm, n, n)              # n row slabs [m, Bb]
    Qxx = [lxx[i] + r for i, r in enumerate(_mm_tn(A, VA, n, n))]
    Quu = [luu[i] + r for i, r in enumerate(_mm_tn(Bm, VB, m, n))]
    Qux = [lux[i] + r for i, r in enumerate(_mm_tn(Bm, VA, m, n))]
    # Qx/Qu as lists of [Bb] vectors
    Qx = [lx[i, :] + sum(A[p][i, :] * Vx[p, :] for p in range(n))
          for i in range(n)]
    Qu = [lu[i, :] + sum(Bm[p][i, :] * Vx[p, :] for p in range(n))
          for i in range(m)]

    # lane-wise Cholesky of Quu + reg I
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        dgj = Quu[j][j, :] + reg
        for p in range(j):
            dgj = dgj - L[j][p] * L[j][p]
        Ljj = jnp.sqrt(jnp.maximum(dgj, 1e-12))
        L[j][j] = Ljj
        for i in range(j + 1, m):
            s = Quu[i][j, :]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            L[i][j] = s / Ljj

    def chol_solve(b):  # b: list of m [Bb] vectors
        t = [None] * m
        for i in range(m):
            s = b[i]
            for p in range(i):
                s = s - L[i][p] * t[p]
            t[i] = s / L[i][i]
        x = [None] * m
        for i in range(m - 1, -1, -1):
            s = t[i]
            for p in range(i + 1, m):
                s = s - L[p][i] * x[p]
            x[i] = s / L[i][i]
        return x

    # K columns: solve for each column j of Qux, then d from Qu
    Kc = [chol_solve([-Qux[i][j, :] for i in range(m)]) for j in range(n)]
    dk = chol_solve([-Qu[i] for i in range(m)])
    for i in range(m):
        for j in range(n):
            K_ref[0, i, j, :] = Kc[j][i]
        d_ref[0, i, :] = dk[i]

    Quud = [sum(Quu[i][p, :] * dk[p] for p in range(m)) for i in range(m)]
    dVacc_ref[0, :] = dVacc_ref[0, :] + sum(dk[i] * Qu[i] for i in range(m))
    dVacc_ref[1, :] = dVacc_ref[1, :] \
        + 0.5 * sum(dk[i] * Quud[i] for i in range(m))

    # Vx_new[i] = Qx + K'(Quu d + Qu) + Qux' d   (K[p][i] = Kc[i][p])
    for i in range(n):
        Vx_ref[i, :] = Qx[i] \
            + sum(Kc[i][p] * (Quud[p] + Qu[p]) for p in range(m)) \
            + sum(Qux[p][i, :] * dk[p] for p in range(m))

    # Vxx_new = Qxx + K'QuuK + K'Qux + (K'Qux)'  — symmetric by construction
    # QuuK[p][j] = sum_q Quu[p][q] Kc[j][q]
    QuuK = [[sum(Quu[p][q, :] * Kc[j][q] for q in range(m)) for j in range(n)]
            for p in range(m)]
    for i in range(n):
        for j in range(i, n):
            ktquuk = sum(Kc[i][p] * QuuK[p][j] for p in range(m))
            ktqux_ij = sum(Kc[i][p] * Qux[p][j, :] for p in range(m))
            ktqux_ji = sum(Kc[j][p] * Qux[p][i, :] for p in range(m))
            v = Qxx[i][j, :] + ktquuk + ktqux_ij + ktqux_ji
            Vxx_ref[i, j, :] = v
            if j != i:
                Vxx_ref[j, i, :] = v

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
    # streamed floats/lane (sublane-padded): A, B, lx-pair, lu, lxx-pair,
    # luu, lux, reg in; K, d, dV out. scratch: Vx, Vxx, dV accumulators.
    pn, pm = pad8(n), pad8(m)
    in_out = (n * pn + n * pm + 2 * pn + pm + 2 * n * pn + m * pm + m * pn
              + 8 + m * pn + pm + 8)
    blk = pick_lane_block(Bt, in_out, pn + n * pn + 8)
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
