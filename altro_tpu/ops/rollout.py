"""Pallas TPU kernels: fused closed-loop line-search rollouts.

The parallel line search evaluates the closed-loop rollout
``u = ubar + alpha d + K (x - xbar); x+ = A x + B u + dd`` for a ladder of
L step sizes. Like the backward pass, this is a sequential sweep of tiny
matvecs that XLA executes at ~9% lane occupancy when batched conventionally;
this kernel packs scenarios onto the lanes ([.., B_blk] layout) and keeps
the L-ladder state in VMEM scratch, streaming per-knot (A, B, dd, xbar,
ubar, K, d) blocks forward in time.

Two variants:

- :func:`batched_ls_rollout`: states/controls only; the AL cost of each
  candidate is evaluated afterwards by XLA over the merged L x B batch.
- :func:`batched_ls_rollout_al` (round 5): ALSO accumulates each rung's
  AL line-search MERIT in-kernel — the quadratic true cost plus the
  penalty term sum(mask * |proj_polar(lam + rho c)|^2 / (2 rho)) per
  constraint block (ZERO/NONPOS/SOC) — eliminating the XLA-side per-rung
  cost/residual evaluation, which was the largest remaining XLA piece of
  the iteration (0.44 of 0.97 ms on the rocket config,
  results_tpu/conic_attribution.json). Shared problem data (cost stacks,
  dynamics, constraint rows) is read as SMEM scalars like
  ops/riccati_fused.py; only (xbar, ubar, K, d, lam, rho) stream per lane.
  The merit omits the rung-independent -|lam|^2/(2 rho) term of the true
  AL objective (constant within an iteration: every use of J in the
  solver is a difference or comparison across rungs), matching the XLA
  base implementation in solver/altro.py's ``_al_merit``.
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


def rollout_al_supported(n: int, m: int, batch: int, L: int, cones) -> bool:
    from ..cones import Cone
    return (n <= 64 and m <= 64 and L <= 16 and batch % 128 == 0
            and all(c in (Cone.ZERO, Cone.NONPOS, Cone.SOC) for c in cones))


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


# ---------------------------------------------------------------------------
# Fused rollouts + AL line-search merit (round 5)
# ---------------------------------------------------------------------------

def _make_al_kernel(n, m, L, N1, alphas, block_meta):
    from ..cones import Cone

    nblocks = len(block_meta)

    def kernel(*refs):
        idx = 0
        (Q_ref, q_ref, R_ref, r_ref, H_ref, c_ref,
         A_ref, B_ref, dd_ref) = refs[idx:idx + 9]
        idx += 9
        bl_refs = []
        for _ in block_meta:
            bl_refs.append(refs[idx:idx + 4])  # Cx, Cu, b, mask (paired)
            idx += 4
        xb_ref, ub_ref, K_ref, d_ref, rho_ref = refs[idx:idx + 5]
        idx += 5
        lam_refs = refs[idx:idx + nblocks]
        idx += nblocks
        X_ref, U_ref, J_ref = refs[idx:idx + 3]
        idx += 3
        x_scr, J_scr = refs[idx:idx + 2]

        k = pl.program_id(1)
        ones = jnp.ones_like(x_scr[0, 0])       # [Bb]

        def al_penalty(row, x, u, include_control):
            """sum over blocks of mask * |proj_polar(lam + rho c)|^2/(2rho)
            at pair-row ``row`` (0 = knot k, 1 = knot k+1). x, u are lists
            of [Bb] vectors."""
            rho = rho_ref[0, row, 0]
            inv2rho = 0.5 / rho
            pen = jnp.zeros_like(ones)
            for (bl, lam_ref, (p, cone)) in zip(bl_refs, lam_refs,
                                                block_meta):
                Cx_ref, Cu_ref, b_ref, mask_ref = bl
                mask = mask_ref[0, row, 0]

                def row_residual(pp):
                    c = b_ref[0, row, pp] * ones
                    for i in range(n):
                        c = c + Cx_ref[0, row, pp, i] * x[i]
                    if include_control:
                        for j in range(m):
                            c = c + Cu_ref[0, row, pp, j] * u[j]
                    return lam_ref[0, row, pp] + rho * c

                if cone in (Cone.ZERO, Cone.NONPOS):
                    ssq = jnp.zeros_like(ones)
                    for pp in range(p):
                        z = row_residual(pp)
                        if cone == Cone.NONPOS:
                            z = jnp.maximum(z, 0.0)
                        ssq = ssq + z * z
                    pen = pen + (mask * inv2rho) * ssq
                else:  # SOC: |proj_polar(v, s)|^2, branchless three-case
                    zs = [row_residual(pp) for pp in range(p)]
                    a2 = sum(zi * zi for zi in zs[:-1])
                    a = jnp.sqrt(a2)
                    sv = zs[-1]
                    a_safe = jnp.where(a > 0, a, 1.0)
                    polar = (a <= -sv).astype(a.dtype)
                    bnd = ((a > sv) & (a > -sv)).astype(a.dtype)
                    gamma = bnd * (a - sv) / (2.0 * a_safe)
                    ssq = polar * (a2 + sv * sv) \
                        + 2.0 * gamma * gamma * a2
                    pen = pen + (mask * inv2rho) * ssq
            return pen

        def stage_cost(row, x, u, include_control):
            """0.5 x'Qx + q'x (+ 0.5 u'Ru + r'u + u'Hx) + c at pair-row.
            R/r/H stream UNPAIRED (control rows have no terminal knot), so
            they are only read when include_control (row 0)."""
            jj = c_ref[0, row, 0] * ones
            for i in range(n):
                qx = q_ref[0, row, i] * ones
                for j in range(n):
                    coef = 0.5 * Q_ref[0, row, i, j]
                    qx = qx + coef * x[j]
                jj = jj + x[i] * qx
            if include_control:
                for i in range(m):
                    ru = r_ref[0, 0, i] * ones
                    for j in range(m):
                        ru = ru + 0.5 * R_ref[0, i, j] * u[j]
                    for j in range(n):
                        ru = ru + H_ref[0, i, j] * x[j]
                    jj = jj + u[i] * ru
            return jj

        @pl.when(k == 0)
        def _init():
            for l in range(L):
                for i in range(n):
                    x_scr[l, i, :] = xb_ref[0, i]
            J_scr[:] = jnp.zeros_like(J_scr)

        xb = [xb_ref[0, i] for i in range(n)]
        ub = [ub_ref[0, i] for i in range(m)]
        dvec = [d_ref[0, i] for i in range(m)]

        for l in range(L):
            x = [x_scr[l, i] for i in range(n)]
            dx = [x[i] - xb[i] for i in range(n)]
            u = [ub[i] + alphas[l] * dvec[i]
                 + sum(K_ref[0, i, j] * dx[j] for j in range(n))
                 for i in range(m)]
            for i in range(m):
                U_ref[0, l, i, :] = u[i]
            # AL merit at knot k (pair-row 0), with control
            J_scr[l, :] = J_scr[l, :] + stage_cost(0, x, u, True) \
                + al_penalty(0, x, u, True)
            # x+ = A x + B u + dd (shared scalars)
            for i in range(n):
                xi = dd_ref[0, 0, i] * ones \
                    + sum(A_ref[0, i, j] * x[j] for j in range(n)) \
                    + sum(B_ref[0, i, j] * u[j] for j in range(m))
                X_ref[0, l, i, :] = xi
                x_scr[l, i, :] = xi

        @pl.when(k == N1 - 1)
        def _flush():
            uz = [jnp.zeros_like(ones) for _ in range(m)]
            for l in range(L):
                xN = [x_scr[l, i] for i in range(n)]
                J_ref[l, :] = J_scr[l, :] \
                    + stage_cost(1, xN, uz, False) \
                    + al_penalty(1, xN, uz, False)

    return kernel


def batched_ls_rollout_al(cost, dynA, dynB, dynd, blocks, Xbar, Ubar, K, d,
                          lams, rho, alphas,
                          interpret: bool = False) -> Tuple:
    """Fused line-search rollouts + per-rung AL merit.

    Shared (unbatched): cost (QuadCost stacks), dynA [N-1,n,n],
    dynB [N-1,n,m], dynd [N-1,n], blocks (affine ConicConstraint tuple).
    Per-lane: Xbar [Bt,N,n], Ubar/d [Bt,N-1,m], K [Bt,N-1,m,n],
    lams tuple of [Bt,N,p], rho [Bt,N] (the shared penalty schedule).
    alphas: STATIC tuple. Returns Xs [Bt,L,N,n], Us [Bt,L,N-1,m],
    J [Bt,L] — the AL merit of each rung (true cost + penalty, without
    the rung-independent -|lam|^2/(2 rho) term).
    """
    Bt, N, n = Xbar.shape
    m = Ubar.shape[-1]
    N1 = N - 1
    alphas_tuple = tuple(float(a) for a in alphas)
    L = len(alphas_tuple)
    from .riccati import pad8, pick_lane_block
    pn, pm = pad8(n), pad8(m)
    pls = [pad8(int(c.p)) for c in blocks]
    in_out = (pn + pm + m * pn + pm            # xb, ub, K, d
              + 2 * pad8(1)                    # rho pair
              + sum(2 * p for p in pls)        # lam pairs
              + L * (pn + pm) + pad8(L))       # X, U, J out
    blk = pick_lane_block(Bt, in_out, L * pn + pad8(L))
    assert Bt % blk == 0
    nb = Bt // blk
    dtype = Xbar.dtype

    lm = lambda x: jnp.moveaxis(x, 0, -1)       # noqa: E731

    def pair(x):  # [N, ...] -> [N-1, 2, ...]
        return jnp.stack([x[:-1], x[1:]], axis=1)

    # shared scalar streams (SMEM; paired so terminal rows ride the last
    # streamed block). Rank-2 streams get a unit middle/trailing axis:
    # Mosaic requires an SMEM block's last two dims to equal the array's
    # (or be 8/128-aligned), so [N1, m] with block (1, m) is rejected
    # while [N1, 1, m] with block (1, 1, m) lowers fine.
    inputs = [pair(cost.Q), pair(cost.q), cost.R[:N1],
              cost.r[:N1, None, :], cost.H[:N1],
              pair(cost.c)[:, :, None], dynA, dynB, dynd[:, None, :]]
    block_meta = tuple((int(c.p), c.cone) for c in blocks)
    for c in blocks:
        inputs += [pair(c.Cx), pair(c.Cu), pair(c.b), pair(c.mask[:, None])]

    # lane streams
    rho_p = pair(lm(rho))[:, :, None, :]        # [N1, 2, 1, Bt]
    inputs += [lm(Xbar)[:N1], lm(Ubar), lm(K), lm(d), rho_p]
    inputs += [pair(lm(l)) for l in lams]

    def sh(*s):
        return pl.BlockSpec(
            (1,) + s, lambda b, k: (k,) + (0,) * len(s),
            memory_space=pltpu.SMEM)

    def ln(*s):
        return pl.BlockSpec(
            (1,) + s + (blk,),
            lambda b, k: (k,) + (0,) * len(s) + (b,),
            memory_space=pltpu.VMEM)

    in_specs = [sh(2, n, n), sh(2, n), sh(m, m), sh(1, m), sh(m, n),
                sh(2, 1), sh(n, n), sh(n, m), sh(1, n)]
    for (p, _) in block_meta:
        in_specs += [sh(2, p, n), sh(2, p, m), sh(2, p), sh(2, 1)]
    in_specs += [ln(n), ln(m), ln(m, n), ln(m), ln(2, 1)]
    for (p, _) in block_meta:
        in_specs += [ln(2, p)]

    idx4 = lambda b, k: (k, 0, 0, b)            # noqa: E731

    kernel = _make_al_kernel(n, m, L, N1, alphas_tuple, block_meta)
    X_tail, U, J = pl.pallas_call(
        kernel,
        grid=(nb, N1),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, L, n, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, m, blk), idx4, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, blk), lambda b, k: (0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1, L, n, Bt), dtype),
            jax.ShapeDtypeStruct((N1, L, m, Bt), dtype),
            jax.ShapeDtypeStruct((L, Bt), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, n, blk), dtype),
            pltpu.VMEM((L, blk), dtype),
        ],
        interpret=interpret,
    )(*inputs)

    X_tail = jnp.moveaxis(X_tail, -1, 0)        # [Bt, N-1, L, n]
    X_tail = jnp.swapaxes(X_tail, 1, 2)
    U = jnp.swapaxes(jnp.moveaxis(U, -1, 0), 1, 2)
    x0 = jnp.broadcast_to(Xbar[:, None, 0:1, :], (Bt, L, 1, n))
    Xs = jnp.concatenate([x0, X_tail], axis=2)
    return Xs, U, jnp.moveaxis(J, -1, 0)
