"""Fused line-search rollout: base path vs vmapped-scan reference (the
Pallas rule itself is TPU-only; the custom_vmap fallback is exercised here
and the compiled kernel by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np

import altro_tpu as at
from altro_tpu.solver.altro import _ls_rollouts_fn, rollout_closed_loop


def test_ls_rollouts_match_reference():
    n, m, N, Bt = 5, 3, 13, 4
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    A = jax.random.normal(ks[0], (Bt, N - 1, n, n)) * 0.3
    B = jax.random.normal(ks[1], (Bt, N - 1, n, m)) * 0.4
    dd = jax.random.normal(ks[2], (Bt, N - 1, n)) * 0.1
    Xb = jax.random.normal(ks[3], (Bt, N, n))
    Ub = jax.random.normal(ks[4], (Bt, N - 1, m))
    K = jax.random.normal(ks[5], (Bt, N - 1, m, n)) * 0.2
    dff = jax.random.normal(ks[6], (Bt, N - 1, m)) * 0.5
    alphas = tuple(0.5 ** i for i in range(6))

    fn = _ls_rollouts_fn(alphas)
    Xs, Us = jax.vmap(fn)(A, B, dd, Xb, Ub, K, dff)
    assert Xs.shape == (Bt, 6, N, n)
    assert Us.shape == (Bt, 6, N - 1, m)

    # reference: explicit rollout per (scenario, alpha)
    for b in (0, Bt - 1):
        dyn = at.LTVDynamics(A=A[b], B=B[b], d=dd[b])
        for li, alpha in enumerate((alphas[0], alphas[-1])):
            idx = 0 if li == 0 else len(alphas) - 1
            Xr, Ur = rollout_closed_loop(dyn, Xb[b], Ub[b], K[b], dff[b],
                                         alpha)
            np.testing.assert_allclose(Xs[b, idx], Xr, atol=1e-10)
            np.testing.assert_allclose(Us[b, idx], Ur, atol=1e-10)


def test_solver_unchanged_with_fused_path():
    """End-to-end: the LTV fused line-search path gives the same solves."""
    n, m, N = 4, 2, 15
    key = jax.random.PRNGKey(5)
    A = jax.random.normal(key, (n, n)) * 0.3 + jnp.eye(n) * 0.7
    B = jax.random.normal(jax.random.PRNGKey(6), (n, m)) * 0.5
    dyn = at.lti_dynamics(A, B, N)
    cost = at.lqr_objective(jnp.eye(n), jnp.eye(m) * 0.1, jnp.eye(n) * 5,
                            jnp.zeros(n), N)
    cons = (at.bound_constraint(N, n, m, u_min=-1.0, u_max=1.0),)
    x0s = jax.random.normal(jax.random.PRNGKey(7), (4, n)) * 2.0
    opts = at.SolverOptions(penalty_initial=1e2, penalty_scaling=10.0)

    sols = jax.jit(jax.vmap(lambda x0: at.solve(
        at.Problem(dynamics=dyn, cost=cost, constraints=cons, x0=x0),
        opts)))(x0s)
    assert int(jnp.sum(sols.stats.status)) == 4
    assert float(jnp.max(sols.stats.viol)) < 1e-4
