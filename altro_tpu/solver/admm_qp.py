"""Dense ADMM QP solver (the in-framework OSQP equivalent).

Plays the role OSQP (C, ADMM) plays in the reference (random-linear,
flexible-satellite, quadruped QP baselines; setup/update/warm-start API at
random_linear_problem.jl:68-76,149-157): an on-TPU lockstep cross-check
oracle and baseline timing target. Same algorithm family as OSQP:

    (P + sigma I + A' R A) ztil = sigma z - q + A'(R zc - y)
    zc+  = clip(alpha A ztil + (1-alpha) zc + y / R, l, u)
    y+   = y + R (alpha A ztil + (1-alpha) zc - zc+)

with per-row penalty R (equality rows, l == u, get rho * RHO_EQ_SCALE as in
OSQP). The KKT matrix is factored once (dense Cholesky — fine for the
reference's problem sizes, NN <= ~2k) and reused across iterations and MPC
steps; the solve loop is a bounded ``lax.while_loop`` with residual-based
termination, fully jit/vmap-safe.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..transcribe import BatchQP

RHO_EQ_SCALE = 1e3


@struct.dataclass
class ADMMQPWork:
    """Factored workspace (reusable across solves while P, A, rho fixed)."""

    qp: BatchQP
    chol: jnp.ndarray      # Cholesky factor of P + sigma I + A' R A
    rho_vec: jnp.ndarray   # [M]
    sigma: jnp.ndarray
    alpha: jnp.ndarray


@struct.dataclass
class ADMMQPSolution:
    x: jnp.ndarray         # primal [NN]
    z: jnp.ndarray         # Ax at solution [M]
    y: jnp.ndarray         # duals [M]
    iterations: jnp.ndarray
    r_prim: jnp.ndarray
    r_dual: jnp.ndarray
    status: jnp.ndarray    # 1 converged


def setup(qp: BatchQP, rho: float = 0.1, sigma: float = 1e-6,
          alpha: float = 1.6) -> ADMMQPWork:
    dtype = qp.P.dtype
    eq = jnp.isclose(qp.l, qp.u)
    rho_vec = jnp.where(eq, rho * RHO_EQ_SCALE, rho).astype(dtype)
    K = qp.P + sigma * jnp.eye(qp.num_vars, dtype=dtype) \
        + qp.A.T @ (rho_vec[:, None] * qp.A)
    chol = jax.scipy.linalg.cholesky(K, lower=True)
    return ADMMQPWork(qp=qp, chol=chol, rho_vec=rho_vec,
                      sigma=jnp.asarray(sigma, dtype),
                      alpha=jnp.asarray(alpha, dtype))


def update(work: ADMMQPWork, q=None, l=None, u=None) -> ADMMQPWork:
    """Refresh linear data without refactoring (parity with OSQP.update!)."""
    qp = work.qp
    qp = qp.replace(q=qp.q if q is None else q,
                    l=qp.l if l is None else l,
                    u=qp.u if u is None else u)
    return work.replace(qp=qp)


def solve(work: ADMMQPWork, x0: Optional[jnp.ndarray] = None,
          y0: Optional[jnp.ndarray] = None, eps_abs: float = 1e-5,
          max_iter: int = 4000, check_every: int = 1) -> ADMMQPSolution:
    qp = work.qp
    dtype = qp.P.dtype
    NN, M = qp.num_vars, qp.A.shape[0]
    x = jnp.zeros(NN, dtype) if x0 is None else x0
    y = jnp.zeros(M, dtype) if y0 is None else y0
    z = jnp.clip(qp.A @ x, qp.l, qp.u)
    rho = work.rho_vec
    inf = jnp.asarray(jnp.inf, dtype)

    def cond(s):
        x, z, y, it, rp, rd, done = s
        return (~done) & (it < max_iter)

    def body(s):
        x, z, y, it, rp, rd, done = s
        rhs = work.sigma * x - qp.q + qp.A.T @ (rho * z - y)
        xt = jax.scipy.linalg.cho_solve((work.chol, True), rhs)
        Axt = qp.A @ xt
        x_n = work.alpha * xt + (1 - work.alpha) * x
        z_hat = work.alpha * Axt + (1 - work.alpha) * z
        z_n = jnp.clip(z_hat + y / rho, qp.l, qp.u)
        y_n = y + rho * (z_hat - z_n)

        Ax = qp.A @ x_n
        rp_n = jnp.max(jnp.abs(Ax - z_n))
        rd_n = jnp.max(jnp.abs(qp.P @ x_n + qp.q + qp.A.T @ y_n))
        done_n = (rp_n < eps_abs) & (rd_n < eps_abs)
        out = (x_n, z_n, y_n, it + 1, rp_n, rd_n, done_n)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(done, a, b), s, out)

    s0 = (x, z, y, jnp.zeros((), jnp.int32), inf, inf, jnp.zeros((), bool))
    x, z, y, it, rp, rd, done = jax.lax.while_loop(cond, body, s0)
    return ADMMQPSolution(x=x, z=z, y=y, iterations=it, r_prim=rp, r_dual=rd,
                          status=done.astype(jnp.int32))


def extract_traj(qp: BatchQP, x):
    """Split the stacked primal into (X [N, n], U [N-1, m])."""
    n, m, N = qp.n, qp.m, qp.N
    base = jnp.arange(N) * (n + m)
    X = x[base[:, None] + jnp.arange(n)[None, :]]
    U = x[(base[:-1] + n)[:, None] + jnp.arange(m)[None, :]]
    return X, U
