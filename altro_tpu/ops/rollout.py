"""Pallas TPU kernel: fused closed-loop line-search rollouts.

The parallel line search evaluates the closed-loop rollout
``u = ubar + alpha d + K (x - xbar); x+ = A x + B u + dd`` for a ladder of
L step sizes. Like the backward pass, this is a sequential sweep of tiny
matvecs that XLA executes at ~9% lane occupancy when batched conventionally;
this kernel packs scenarios onto the lanes ([.., B_blk] layout) and keeps
the L-ladder state in VMEM scratch, streaming per-knot (A, B, dd, xbar,
ubar, K, d) blocks forward in time.

Outputs are the states/controls for every (alpha, scenario); the AL cost of
each candidate is evaluated afterwards by XLA over the merged L x B batch
(large einsums — already efficient).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 1024


def rollout_supported(n: int, m: int, batch: int, L: int) -> bool:
    return n <= 64 and m <= 64 and L <= 32 and batch % 128 == 0


def _kernel(n: int, m: int, L: int, N1: int, alphas,
            A_ref, B_ref, dd_ref, xb_ref, ub_ref, K_ref, d_ref,
            X_ref, U_ref, x_scr):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        # every alpha starts from x0 = xbar[0]
        for l in range(L):
            x_scr[l] = xb_ref[0]

    A = [A_ref[0, i] for i in range(n)]      # n rows of [n, Bb]
    Bd = [B_ref[0, i] for i in range(n)]     # n rows of [m, Bb]
    dd = dd_ref[0]                           # [n, Bb]
    xb = xb_ref[0]                           # [n, Bb]
    ub = ub_ref[0]                           # [m, Bb]
    K = [K_ref[0, i] for i in range(m)]      # m rows of [n, Bb]
    dvec = d_ref[0]                          # [m, Bb]

    for l in range(L):
        x = x_scr[l]                         # [n, Bb]
        dx = x - xb
        # u = ub + alpha*d + K dx
        u_rows = [ub[i, :] + alphas[l] * dvec[i, :]
                  + sum(K[i][p, :] * dx[p, :] for p in range(n))
                  for i in range(m)]
        for i in range(m):
            U_ref[0, l, i, :] = u_rows[i]
        # x+ = A x + B u + dd
        for i in range(n):
            xi = dd[i, :] \
                + sum(A[i][p, :] * x[p, :] for p in range(n)) \
                + sum(Bd[i][p, :] * u_rows[p] for p in range(m))
            X_ref[0, l, i, :] = xi
            x_scr[l, i, :] = xi


def batched_ls_rollout(A, B, dd, Xbar, Ubar, K, d, alphas) -> Tuple:
    """Batched fused rollouts.

    A: [Bt, N-1, n, n], B: [Bt, N-1, n, m], dd: [Bt, N-1, n],
    Xbar: [Bt, N, n], Ubar/d: [Bt, N-1, m], K: [Bt, N-1, m, n],
    alphas: STATIC tuple of python floats (the ladder is baked into the
    kernel as constants).
    Returns Xs [Bt, L, N, n], Us [Bt, L, N-1, m].
    """
    Bt, N1, n, _ = A.shape
    m = B.shape[-1]
    alphas_tuple = tuple(float(a) for a in alphas)
    L = len(alphas_tuple)
    from .riccati import pad8, pick_lane_block
    # streamed floats/lane (sublane-padded): A, B, dd, xbar, ubar, K, d in;
    # X, U (L-ladder) out. scratch: the L-ladder state carry.
    pn, pm = pad8(n), pad8(m)
    in_out = (n * pn + n * pm + 2 * pn + pm + m * pn + pm + L * (pn + pm))
    blk = pick_lane_block(Bt, in_out, L * pn)
    assert Bt % blk == 0
    nb = Bt // blk
    dtype = A.dtype

    lm = lambda x: jnp.moveaxis(x, 0, -1)   # noqa: E731

    idx4 = lambda b, k: (k, 0, 0, b)        # noqa: E731
    idx3 = lambda b, k: (k, 0, b)           # noqa: E731

    kernel = functools.partial(_kernel, n, m, L, N1, alphas_tuple)
    X_tail, U = pl.pallas_call(
        kernel,
        grid=(nb, N1),
        in_specs=[
            pl.BlockSpec((1, n, n, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, m, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, blk), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, blk), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, blk), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, n, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, blk), idx3, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, L, n, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, m, blk), idx4, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1, L, n, Bt), dtype),
            jax.ShapeDtypeStruct((N1, L, m, Bt), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((L, n, blk), dtype)],
    )(lm(A), lm(B), lm(dd), lm(Xbar)[:N1], lm(Ubar), lm(K), lm(d))

    # assemble full state trajectories: X[l, 0] = Xbar[0] for every alpha
    X_tail = jnp.moveaxis(X_tail, -1, 0)        # [Bt, N-1, L, n]
    X_tail = jnp.swapaxes(X_tail, 1, 2)         # [Bt, L, N-1, n]
    U = jnp.swapaxes(jnp.moveaxis(U, -1, 0), 1, 2)
    x0 = jnp.broadcast_to(Xbar[:, None, 0:1, :], (Bt, L, 1, n))
    Xs = jnp.concatenate([x0, X_tail], axis=2)
    return Xs, U
