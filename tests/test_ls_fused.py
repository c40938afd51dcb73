"""Fused ladder+AL-merit line search (round 5): correctness.

- the Pallas kernel (interpret mode) must reproduce the XLA base
  implementation's (X, U, J) exactly;
- the restructured solver path (ALTRO_TPU_LSFUSED=1) must solve to the
  same optimum as the classical path on the conic families.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import altro_tpu as at


def _rocket_window(dtype):
    from altro_tpu.models import rocket
    from altro_tpu.mpc import gen_tracking_mpc

    N = 61
    prob = rocket.rocket_problem(N=N, tf=(N - 1) * 0.05, dtype=dtype)
    opts = at.SolverOptions(
        cost_tolerance=1e-5, gradient_tolerance=1e-6,
        constraint_tolerance=1e-4, penalty_initial=1e-2,
        penalty_scaling=500.0, iterations_outer=40, iterations_inner=100)
    sol = at.solve(prob, opts, U0=rocket.hover_controls(prob))
    pm = gen_tracking_mpc(prob, sol.X, sol.U, 21, dt=0.05)
    return pm


def test_al_kernel_interpret_matches_base():
    from altro_tpu.ops.rollout import batched_ls_rollout_al
    from altro_tpu.solver.altro import _al_merit_tail

    dtype = jnp.float64
    pm = _rocket_window(dtype)
    N, n, m = pm.N, pm.n, pm.m
    rng = np.random.default_rng(0)
    B = 4
    Xb = jnp.asarray(rng.standard_normal((B, N, n)), dtype)
    Ub = jnp.asarray(rng.standard_normal((B, N - 1, m)), dtype)
    K = jnp.asarray(0.1 * rng.standard_normal((B, N - 1, m, n)), dtype)
    d = jnp.asarray(0.1 * rng.standard_normal((B, N - 1, m)), dtype)
    lams = tuple(jnp.asarray(rng.standard_normal((B, N, c.p)), dtype)
                 for c in pm.constraints)
    rho = jnp.asarray(10.0 ** rng.uniform(0, 3, (B, N)), dtype)
    # the kernel assumes one shared schedule per lane: constant over knots
    rho = jnp.broadcast_to(rho[:, :1], rho.shape)
    alphas = (1.0, 0.5, 0.0)

    Xs, Us, J = batched_ls_rollout_al(
        pm.cost, pm.dynamics.A, pm.dynamics.B, pm.dynamics.d,
        pm.constraints, Xb, Ub, K, d, lams, rho, alphas, interpret=True)

    def base_one(i):
        def one(alpha):
            def body(x, inp):
                xb, ub, K_k, d_k, A_k, B_k, dd_k = inp
                u = ub + alpha * d_k + K_k @ (x - xb)
                return A_k @ x + B_k @ u + dd_k, (x, u)

            xN, (Xh, U) = jax.lax.scan(
                body, Xb[i][0],
                (Xb[i][:-1], Ub[i], K[i], d[i], pm.dynamics.A,
                 pm.dynamics.B, pm.dynamics.d))
            X = jnp.concatenate([Xh, xN[None]], axis=0)
            Jv = pm.cost.total(X, U) + _al_merit_tail(
                pm.constraints, tuple(l[i] for l in lams), rho[i], X, U)
            return X, U, Jv

        return jax.vmap(one)(jnp.asarray(alphas, dtype))

    for i in range(B):
        Xr, Ur, Jr = base_one(i)
        np.testing.assert_allclose(np.asarray(Xs[i]), np.asarray(Xr),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(Us[i]), np.asarray(Ur),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(J[i]), np.asarray(Jr),
                                   rtol=1e-8)


@pytest.mark.parametrize("family", ["rocket", "bounds"])
def test_lsfused_solver_matches_classical(family):
    dtype = jnp.float64
    if family == "rocket":
        pm = _rocket_window(dtype)
        opts = at.SolverOptions(
            cost_tolerance=1e-6, gradient_tolerance=1e-8,
            constraint_tolerance=1e-6, penalty_initial=1e2,
            penalty_scaling=10.0, iterations_outer=30,
            iterations_inner=50)
    else:
        from altro_tpu.models import random_linear as rl
        rng = np.random.default_rng(7)
        prob = rl.gen_random_linear(rng, 8, 4, 31, dtype=dtype)
        pm = prob
        opts = at.SolverOptions(
            cost_tolerance=1e-8, gradient_tolerance=1e-9,
            constraint_tolerance=1e-8, penalty_initial=1e3,
            penalty_scaling=100.0)

    prev = os.environ.get("ALTRO_TPU_LSFUSED")
    try:
        os.environ["ALTRO_TPU_LSFUSED"] = "0"
        sol0 = at.solve(pm, opts)
        os.environ["ALTRO_TPU_LSFUSED"] = "1"
        sol1 = at.solve(pm, opts)
    finally:
        if prev is None:
            os.environ.pop("ALTRO_TPU_LSFUSED", None)
        else:
            os.environ["ALTRO_TPU_LSFUSED"] = prev
    assert int(sol0.stats.status) == 1
    assert int(sol1.stats.status) == 1
    # same optimum at the solve tolerance (iterate sequences may differ at
    # f64 rounding level: the merit omits the lam^2 constant and the
    # residual pass moved out of the ladder)
    assert float(jnp.max(jnp.abs(sol0.U - sol1.U))) < 1e-4
    gap = abs(float(sol0.stats.cost) - float(sol1.stats.cost)) / max(
        abs(float(sol0.stats.cost)), 1e-9)
    assert gap < 1e-7


def test_lsfused_vmap_matches_single():
    """Batched (custom_vmap base fallback on CPU) vs single-lane solves."""
    dtype = jnp.float64
    pm = _rocket_window(dtype)
    opts = at.SolverOptions(
        cost_tolerance=1e-6, gradient_tolerance=1e-8,
        constraint_tolerance=1e-6, penalty_initial=1e2,
        penalty_scaling=10.0, iterations_outer=30, iterations_inner=50)
    rng = np.random.default_rng(3)
    x0s = jnp.asarray(pm.x0)[None, :] + jnp.asarray(
        0.01 * rng.standard_normal((3, pm.n)), dtype)
    prev = os.environ.get("ALTRO_TPU_LSFUSED")
    try:
        os.environ["ALTRO_TPU_LSFUSED"] = "1"
        sols = jax.vmap(lambda x0: at.solve(pm.replace(x0=x0), opts))(x0s)
        for i in range(3):
            s1 = at.solve(pm.replace(x0=x0s[i]), opts)
            # batched einsums contract in a different order than the
            # single-lane program: f64 reduction-order noise only
            # (measured 2e-7 max with identical iteration counts)
            assert int(sols.stats.iterations[i]) == int(s1.stats.iterations)
            np.testing.assert_allclose(np.asarray(sols.U[i]),
                                       np.asarray(s1.U), atol=2e-6)
    finally:
        if prev is None:
            os.environ.pop("ALTRO_TPU_LSFUSED", None)
        else:
            os.environ["ALTRO_TPU_LSFUSED"] = prev
