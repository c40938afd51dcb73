"""Parallel (associative-scan) Riccati backward pass.

The serial ``lax.scan`` recursion is O(N) sequential depth — fine at the
reference's N <= 101 but the latency floor for long horizons. This module
reformulates the LQR backward pass as an associative composition of
conditional value functions (Sarkka & Garcia-Fernandez, "Temporal
Parallelization of Bayesian Smoothers"; cf. PAPERS.md "The Parallelization
of Riccati Recursion") and evaluates it with ``lax.associative_scan`` in
O(log N) depth — the trajectory-optimization analog of sequence parallelism.

Element e = (A, b, C, eta, J) represents the conditional value function

    V(x, z) = 0.5 (z - A x - b)' C^+ (z - A x - b) + 0.5 x'J x - eta'x

between two knots. Composition (minimizing over the shared knot):

    A_ij = A_j (I + C_i J_j)^-1 A_i
    b_ij = A_j (I + C_i J_j)^-1 (b_i + C_i eta_j... ) + b_j      [see code]
    C_ij = A_j (I + C_i J_j)^-1 C_i A_j' + C_j
    eta_ij = A_i' (I + J_j C_i)^-1 (eta_j - J_j b_i) + eta_i
    J_ij = A_i' (I + J_j C_i)^-1 J_j A_i + J_i

Stage elements eliminate the control analytically:
    Abar = A - B R^-1 H, bbar = -B R^-1 r, C = B R^-1 B',
    J = Q - H'R^-1 H,    eta = -(q - H'R^-1 r)
with the terminal element (0, 0, 0, -lx_T, lxx_T).

Note: the scan path regularizes Quu = R + B'VB; here regularization folds
into R instead (both are valid Levenberg-style regularizers; they agree at
reg = 0, which the parity test checks).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _combine(ei, ej):
    """Compose earlier element ei with later element ej (batched over the
    leading axis by associative_scan)."""
    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    n = Ai.shape[-1]
    eye = jnp.eye(n, dtype=Ai.dtype)

    M = jnp.linalg.solve(eye + jnp.einsum("...ij,...jk->...ik", Ci, Jj),
                         jnp.concatenate([
                             Ai,
                             (bi + jnp.einsum("...ij,...j->...i", Ci, etaj)
                              )[..., None],
                             Ci,
                         ], axis=-1))
    MA = M[..., :n]
    Mb = M[..., n]
    MC = M[..., n + 1:]

    A_ij = jnp.einsum("...ij,...jk->...ik", Aj, MA)
    b_ij = jnp.einsum("...ij,...j->...i", Aj, Mb) + bj
    C_ij = jnp.einsum("...ij,...jk,...lk->...il", Aj, MC, Aj) + Cj

    Nmat = jnp.linalg.solve(
        eye + jnp.einsum("...ij,...jk->...ik", Jj, Ci),
        jnp.concatenate([
            (etaj - jnp.einsum("...ij,...j->...i", Jj, bi))[..., None],
            jnp.einsum("...ij,...jk->...ik", Jj, Ai),
        ], axis=-1))
    Ne = Nmat[..., 0]
    NJ = Nmat[..., 1:]

    eta_ij = jnp.einsum("...ji,...j->...i", Ai, Ne) + etai
    J_ij = jnp.einsum("...ji,...jk->...ik", Ai, NJ) + Ji
    J_ij = 0.5 * (J_ij + jnp.swapaxes(J_ij, -1, -2))
    return (A_ij, b_ij, C_ij, eta_ij, J_ij)


def parallel_backward_pass(A, B, lx, lu, lxx, luu, lux, reg) -> Tuple:
    """Drop-in for solver.altro._backward_pass_scan with O(log N) depth.

    A: [N-1, n, n], B: [N-1, n, m]; expansions [N, ...]; scalar reg (folded
    into the control Hessian). Returns (K, d, dV1, dV2).
    """
    N1, n, _ = A.shape
    m = B.shape[-1]
    dtype = A.dtype
    eye_m = jnp.eye(m, dtype=dtype)

    R = luu[:-1] + reg * eye_m
    H = lux[:-1]
    Q = lxx[:-1]
    q = lx[:-1]
    r = lu[:-1]

    Rinv_H = jnp.linalg.solve(R, H)                     # [N-1, m, n]
    Rinv_r = jnp.linalg.solve(R, r[..., None])[..., 0]  # [N-1, m]
    Rinv_Bt = jnp.linalg.solve(R, jnp.swapaxes(B, -1, -2))

    A_e = A - jnp.einsum("kij,kjl->kil", B, Rinv_H)
    b_e = -jnp.einsum("kij,kj->ki", B, Rinv_r)
    C_e = jnp.einsum("kij,kjl->kil", B, Rinv_Bt)
    J_e = Q - jnp.einsum("kji,kjl->kil", H, Rinv_H)
    eta_e = -(q - jnp.einsum("kji,kj->ki", H, Rinv_r))

    # terminal element
    zA = jnp.zeros((1, n, n), dtype)
    zb = jnp.zeros((1, n), dtype)
    elems = (
        jnp.concatenate([A_e, zA], axis=0),
        jnp.concatenate([b_e, zb], axis=0),
        jnp.concatenate([C_e, zA], axis=0),
        jnp.concatenate([eta_e, -lx[-1:][..., :]], axis=0),
        jnp.concatenate([J_e, lxx[-1:]], axis=0),
    )

    # suffix compositions: r_k = e_k o e_{k+1} o ... o e_N.
    # associative_scan(reverse=True) flips the array around a forward scan,
    # so the callee sees (higher-index, lower-index) operands — swap them to
    # keep the earlier-element-first composition convention.
    suffix = jax.lax.associative_scan(lambda a, b: _combine(b, a), elems,
                                      reverse=True, axis=0)
    _, _, _, eta_s, J_s = suffix
    Vxx = J_s          # [N, n, n]
    Vx = -eta_s        # [N, n]

    # per-knot gains from V_{k+1}, fully parallel
    Vxx1 = Vxx[1:]
    Vx1 = Vx[1:]
    Quu = luu[:-1] + jnp.einsum("kji,kjl,klm->kim", B, Vxx1, B) \
        + reg * eye_m
    Qux = lux[:-1] + jnp.einsum("kji,kjl,klm->kim", B, Vxx1, A)
    Qu = lu[:-1] + jnp.einsum("kji,kj->ki", B, Vx1)
    rhs = jnp.concatenate([Qux, Qu[..., None]], axis=-1)
    sol = jnp.linalg.solve(Quu, rhs)
    K = -sol[..., :-1]
    d = -sol[..., -1]

    dV1 = jnp.einsum("ki,ki->", d, Qu)
    dV2 = 0.5 * jnp.einsum("ki,kij,kj->", d, Quu, d)
    return K, d, dV1, dV2
