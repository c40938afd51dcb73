"""Pallas TPU kernel: AL expansion fused into the Riccati backward pass.

The measured bottleneck of the batched solve is the AL expansion (~1.35 ms
of a ~2.0 ms iteration at B=1024): XLA evaluates the per-knot cost/constraint
expansions as batched ops with the tiny state dims on the vector lanes. This
kernel computes the expansion *inside* the backward sweep instead:

- problem data (cost stacks, dynamics A/B, constraint Cx/Cu/b/mask) is
  SHARED across scenarios -> read as scalars straight from the streamed
  blocks; per-knot HBM traffic drops ~16x vs precomputed [n,n,B] expansions;
- per-lane inputs are only x, u, lambda, rho: every arithmetic op is a
  full-width [B_blk] vector op (one vreg), scalar x vector FMAs throughout;
- constraint curvature uses the cone-diagonal form, so the kernel supports
  ZERO/NONPOS blocks; problems with SOC blocks use the unfused path (the
  solver's custom_vmap rule checks the cone set statically).

Assumption shared with the solver's AL: every block's penalty follows one
schedule (rho identical across blocks at a given knot), which holds for
DualState as the solver manages it.

Recursion and outputs are identical to ops/riccati.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 1024


def fused_supported(n: int, m: int, batch: int, cones) -> bool:
    from ..cones import Cone
    return (n <= 64 and m <= 64 and batch % 128 == 0
            and all(c in (Cone.ZERO, Cone.NONPOS, Cone.SOC)
                    for c in cones))


def _make_kernel(n, m, N1, block_meta):
    from ..cones import Cone

    nblocks = len(block_meta)

    def kernel(*refs):
        idx = 0
        Q_ref, q_ref, R_ref, r_ref, H_ref, A_ref, B_ref = refs[idx:idx + 7]
        idx += 7
        bl_refs = []
        for _ in block_meta:
            bl_refs.append(refs[idx:idx + 4])  # Cx, Cu, b, mask
            idx += 4
        x_ref, u_ref, rho_ref = refs[idx:idx + 3]
        idx += 3
        lam_refs = refs[idx:idx + nblocks]
        idx += nblocks
        K_ref, d_ref, dV_ref = refs[idx:idx + 3]
        idx += 3
        Vx_ref, Vxx_ref, dVacc_ref = refs[idx:idx + 3]

        k_rev = pl.program_id(1)
        ones = jnp.ones_like(rho_ref[0, 0, 0])   # [Bb]

        def expansion(row, include_control):
            """AL expansion at pair-row `row` (0 = knot k, 1 = knot k+1)."""
            rho = rho_ref[0, row, 0]
            x = [x_ref[0, row, i] for i in range(n)]        # [Bb] each
            if include_control:
                u = [u_ref[0, i] for i in range(m)]
            else:
                u = [jnp.zeros_like(ones) for _ in range(m)]

            lx = [q_ref[0, row, i] * ones
                  + sum(Q_ref[0, row, i, p] * x[p] for p in range(n))
                  for i in range(n)]
            lxx = [[Q_ref[0, row, i, j] * ones for j in range(n)]
                   for i in range(n)]
            if include_control:
                lu = [r_ref[0, row, i] * ones
                      + sum(R_ref[0, row, i, p] * u[p] for p in range(m))
                      + sum(H_ref[0, row, i, p] * x[p] for p in range(n))
                      for i in range(m)]
                luu = [[R_ref[0, row, i, j] * ones for j in range(m)]
                       for i in range(m)]
                lux = [[H_ref[0, row, i, j] * ones for j in range(n)]
                       for i in range(m)]
            else:
                lu = [jnp.zeros_like(ones) for _ in range(m)]
                luu = [[jnp.zeros_like(ones) for _ in range(m)]
                       for _ in range(m)]
                lux = [[jnp.zeros_like(ones) for _ in range(n)]
                       for _ in range(m)]

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
                    return lam_ref[0, row, pp] + rho * c  # z = lam + rho c

                def add_gw(pp, g, w):
                    """Accumulate gradient g and diagonal curvature weight w
                    for constraint row pp (g, w are [Bb] vectors)."""
                    for i in range(n):
                        cxi = Cx_ref[0, row, pp, i]
                        lx[i] = lx[i] + cxi * g
                        cw = cxi * w
                        for j in range(i, n):
                            lxx[i][j] = lxx[i][j] + cw * Cx_ref[0, row, pp, j]
                    if include_control:
                        for i in range(m):
                            cui = Cu_ref[0, row, pp, i]
                            lu[i] = lu[i] + cui * g
                            cw = cui * w
                            for j in range(i, m):
                                luu[i][j] = luu[i][j] \
                                    + cw * Cu_ref[0, row, pp, j]
                            for j in range(n):
                                lux[i][j] = lux[i][j] \
                                    + cw * Cx_ref[0, row, pp, j]

                if cone in (Cone.ZERO, Cone.NONPOS):
                    for pp in range(p):
                        z = row_residual(pp)
                        if cone == Cone.ZERO:
                            g = z * mask
                            w = rho * mask * ones
                        else:  # NONPOS
                            g = jnp.maximum(z, 0.0) * mask
                            w = rho * (z > 0.0).astype(z.dtype) * mask
                        add_gw(pp, g, w)
                else:
                    # SOC: z = (v, s); branchless three-case polar
                    # projection (cones.soc_polar_curvature_factors):
                    #   inside  (a <= s):  g = 0,      J = 0
                    #   polar   (a <= -s): g = z,      J = I
                    #   boundary:          g = gamma (v, -a),
                    #     J = diag(gamma..gamma, 0) - gamma u1 u1'
                    #         + 1/2 u2 u2',  u1 = (vh, 0), u2 = (-vh, 1)
                    zs = [row_residual(pp) for pp in range(p)]
                    a2 = sum(zi * zi for zi in zs[:-1])
                    a = jnp.sqrt(a2)
                    sv = zs[-1]
                    a_safe = jnp.where(a > 0, a, 1.0)
                    polar = (a <= -sv).astype(a.dtype)
                    bnd = ((a > sv) & (a > -sv)).astype(a.dtype)
                    gamma = bnd * (a - sv) / (2.0 * a_safe)
                    # gradient rows (mask applied)
                    for pp in range(p - 1):
                        g = (polar * zs[pp] + gamma * zs[pp]) * mask
                        w = rho * (polar + gamma) * mask
                        add_gw(pp, g, w)
                    g_last = (polar * sv - gamma * a) * mask
                    w_last = rho * polar * mask
                    add_gw(p - 1, g_last, w_last)
                    # rank-1 terms: coef1 (vh,0), coef2 (-vh,1) with
                    # coef1 = -rho gamma, coef2 = rho bnd / 2. Project the
                    # cone rows through them once: ax_i = sum_pp C[pp,i] u_pp
                    rm = rho * mask
                    coef1 = -(rm * gamma)
                    coef2 = 0.5 * (rm * bnd)
                    vh = [zi / a_safe for zi in zs[:-1]]
                    for coef, u_rows in (
                            (coef1, vh + [jnp.zeros_like(ones)]),
                            (coef2, [-vhi for vhi in vh] + [ones])):
                        ax = [sum(Cx_ref[0, row, pp, i] * u_rows[pp]
                                  for pp in range(p)) for i in range(n)]
                        cax = [coef * axi for axi in ax]
                        for i in range(n):
                            for j in range(i, n):
                                lxx[i][j] = lxx[i][j] + cax[i] * ax[j]
                        if include_control:
                            au = [sum(Cu_ref[0, row, pp, i] * u_rows[pp]
                                      for pp in range(p)) for i in range(m)]
                            cau = [coef * aui for aui in au]
                            for i in range(m):
                                for j in range(i, m):
                                    luu[i][j] = luu[i][j] + cau[i] * au[j]
                                for j in range(n):
                                    lux[i][j] = lux[i][j] + cau[i] * ax[j]
            # symmetrize the lower triangles
            for i in range(n):
                for j in range(i + 1, n):
                    lxx[j][i] = lxx[i][j]
            for i in range(m):
                for j in range(i + 1, m):
                    luu[j][i] = luu[i][j]
            return lx, lu, lxx, luu, lux

        @pl.when(k_rev == 0)
        def _init():
            lxT, _, lxxT, _, _ = expansion(1, include_control=False)
            for i in range(n):
                Vx_ref[i, :] = lxT[i]
                for j in range(n):
                    Vxx_ref[i, j, :] = lxxT[i][j]
            dVacc_ref[:] = jnp.zeros_like(dVacc_ref)

        lx, lu, lxx_r, luu_r, lux_r = expansion(0, include_control=True)

        Vxx = [[Vxx_ref[i, j] for j in range(n)] for i in range(n)]
        Vx = [Vx_ref[i] for i in range(n)]

        def Asc(i, j):
            return A_ref[0, i, j]

        def Bsc(i, j):
            return B_ref[0, i, j]

        VA = [[sum(Vxx[i][p] * Asc(p, j) for p in range(n))
               for j in range(n)] for i in range(n)]
        VB = [[sum(Vxx[i][p] * Bsc(p, j) for p in range(n))
               for j in range(m)] for i in range(n)]
        Qx = [lx[i] + sum(Asc(p, i) * Vx[p] for p in range(n))
              for i in range(n)]
        Qu = [lu[i] + sum(Bsc(p, i) * Vx[p] for p in range(n))
              for i in range(m)]
        Qxx = [[lxx_r[i][j] + sum(Asc(p, i) * VA[p][j] for p in range(n))
                for j in range(n)] for i in range(n)]
        Quu = [[luu_r[i][j] + sum(Bsc(p, i) * VB[p][j] for p in range(n))
                for j in range(m)] for i in range(m)]
        Qux = [[lux_r[i][j] + sum(Bsc(p, i) * VA[p][j] for p in range(n))
                for j in range(n)] for i in range(m)]

        reg = rho_ref[0, 2, 0]
        L = [[None] * m for _ in range(m)]
        for j in range(m):
            dgj = Quu[j][j] + reg
            for p in range(j):
                dgj = dgj - L[j][p] * L[j][p]
            Ljj = jnp.sqrt(jnp.maximum(dgj, 1e-12))
            L[j][j] = Ljj
            for i in range(j + 1, m):
                s = Quu[i][j]
                for p in range(j):
                    s = s - L[i][p] * L[j][p]
                L[i][j] = s / Ljj

        def chol_solve(b):
            t = [None] * m
            for i in range(m):
                s = b[i]
                for p in range(i):
                    s = s - L[i][p] * t[p]
                t[i] = s / L[i][i]
            xx = [None] * m
            for i in range(m - 1, -1, -1):
                s = t[i]
                for p in range(i + 1, m):
                    s = s - L[p][i] * xx[p]
                xx[i] = s / L[i][i]
            return xx

        Kc = [chol_solve([-Qux[i][j] for i in range(m)]) for j in range(n)]
        dk = chol_solve([-Qu[i] for i in range(m)])
        for i in range(m):
            for j in range(n):
                K_ref[0, i, j, :] = Kc[j][i]
            d_ref[0, i, :] = dk[i]

        Quud = [sum(Quu[i][p] * dk[p] for p in range(m)) for i in range(m)]
        dVacc_ref[0, :] = dVacc_ref[0, :] \
            + sum(dk[i] * Qu[i] for i in range(m))
        dVacc_ref[1, :] = dVacc_ref[1, :] \
            + 0.5 * sum(dk[i] * Quud[i] for i in range(m))

        for i in range(n):
            Vx_ref[i, :] = Qx[i] \
                + sum(Kc[i][p] * (Quud[p] + Qu[p]) for p in range(m)) \
                + sum(Qux[p][i] * dk[p] for p in range(m))

        QuuK = [[sum(Quu[p][q2] * Kc[j][q2] for q2 in range(m))
                 for j in range(n)] for p in range(m)]
        for i in range(n):
            for j in range(i, n):
                ktquuk = sum(Kc[i][p] * QuuK[p][j] for p in range(m))
                ktqux_ij = sum(Kc[i][p] * Qux[p][j] for p in range(m))
                ktqux_ji = sum(Kc[j][p] * Qux[p][i] for p in range(m))
                v = Qxx[i][j] + ktquuk + ktqux_ij + ktqux_ji
                Vxx_ref[i, j, :] = v
                if j != i:
                    Vxx_ref[j, i, :] = v

        @pl.when(k_rev == N1 - 1)
        def _flush():
            dV_ref[:] = dVacc_ref[:]

    return kernel


def fused_expand_backward(cost, dynA, dynB, blocks, X, U, lams, rhos, reg,
                          interpret: bool = False) -> Tuple:
    """Fused AL-expansion + Riccati backward pass.

    cost: QuadCost (shared); dynA [N-1,n,n], dynB [N-1,n,m] (shared);
    blocks: tuple of ConicConstraint (shared, diag cones only);
    X [Bt,N,n], U [Bt,N-1,m] (batched); lams: tuple of [Bt,N,p]; rhos:
    tuple of [Bt,N]; reg [Bt].
    Returns K [Bt,N1,m,n], d [Bt,N1,m], dV1 [Bt], dV2 [Bt].
    """
    Bt, N, n = X.shape
    m = U.shape[-1]
    N1 = N - 1
    blk = min(LANE_BLOCK, Bt)
    assert Bt % blk == 0
    nb = Bt // blk
    dtype = X.dtype

    lm = lambda x: jnp.moveaxis(x, 0, -1)          # noqa: E731

    def pair(x):  # [N, ...] -> [N-1, 2, ...]
        return jnp.stack([x[:-1], x[1:]], axis=1)

    # shared scalar streams (paired so the terminal rows ride the first
    # streamed block)
    inputs = [pair(cost.Q), pair(cost.q), pair(cost.R), pair(cost.r),
              pair(cost.H), dynA, dynB]
    block_meta = tuple((int(c.p), c.cone) for c in blocks)
    for c in blocks:
        inputs += [pair(c.Cx), pair(c.Cu), pair(c.b), pair(c.mask[:, None])]

    # lane streams
    x_p = pair(lm(X))                               # [N1, 2, n, Bt]
    u_l = lm(U)                                     # [N1, m, Bt]
    rho0 = lm(rhos[0]) if rhos else jnp.zeros((N, Bt), dtype)
    rho_tri = jnp.stack([rho0[:-1], rho0[1:],
                         jnp.broadcast_to(reg[None, :], (N1, Bt))], axis=1)
    rho_tri = rho_tri[:, :, None, :]                # [N1, 3, 1, Bt]
    inputs += [x_p, u_l, rho_tri]
    inputs += [pair(lm(l)) for l in lams]           # [N1, 2, p, Bt] each

    def sh(*s):
        # shared problem data: scalar reads -> SMEM (scalar memory); VMEM
        # scalar extraction makes the Mosaic lowering explode
        return pl.BlockSpec(
            (1,) + s, lambda b, k: (N1 - 1 - k,) + (0,) * len(s),
            memory_space=pltpu.SMEM)

    def ln(*s):
        return pl.BlockSpec(
            (1,) + s + (blk,),
            lambda b, k: (N1 - 1 - k,) + (0,) * len(s) + (b,),
            memory_space=pltpu.VMEM)

    in_specs = [sh(2, n, n), sh(2, n), sh(2, m, m), sh(2, m), sh(2, m, n),
                sh(n, n), sh(n, m)]
    for (p, _) in block_meta:
        in_specs += [sh(2, p, n), sh(2, p, m), sh(2, p), sh(2, 1)]
    in_specs += [ln(2, n), ln(m), ln(3, 1)]
    for (p, _) in block_meta:
        in_specs += [ln(2, p)]

    idx4 = lambda b, k: (N1 - 1 - k, 0, 0, b)      # noqa: E731
    idx3 = lambda b, k: (N1 - 1 - k, 0, b)         # noqa: E731

    kernel = _make_kernel(n, m, N1, block_meta)
    K, d, dV = pl.pallas_call(
        kernel,
        grid=(nb, N1),
        in_specs=in_specs,
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
            pltpu.VMEM((n, blk), dtype),
            pltpu.VMEM((n, n, blk), dtype),
            pltpu.VMEM((2, blk), dtype),
        ],
        interpret=interpret,
    )(*inputs)

    return (jnp.moveaxis(K, -1, 0), jnp.moveaxis(d, -1, 0), dV[0], dV[1])
