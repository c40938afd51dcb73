"""Associative-scan Riccati vs the serial scan recursion."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from altro_tpu.ops.parallel_riccati import parallel_backward_pass
from altro_tpu.solver.altro import _backward_pass_scan


def _inputs(key, N, n, m, dtype=jnp.float64):
    ks = jax.random.split(key, 7)
    A = jax.random.normal(ks[0], (N - 1, n, n), dtype) * 0.3 \
        + jnp.eye(n, dtype=dtype) * 0.8
    B = jax.random.normal(ks[1], (N - 1, n, m), dtype) * 0.4

    def spd(k, d, scale, Nn):
        M = jax.random.normal(k, (Nn, d, d), dtype) * scale
        return jnp.einsum("kij,klj->kil", M, M) + jnp.eye(d, dtype=dtype)

    lxx = spd(ks[2], n, 0.3, N)
    luu = spd(ks[3], m, 0.3, N).at[-1].set(0.0)
    lux = (jax.random.normal(ks[4], (N, m, n), dtype) * 0.05).at[-1].set(0.0)
    lx = jax.random.normal(ks[5], (N, n), dtype)
    lu = jax.random.normal(ks[6], (N, m), dtype).at[-1].set(0.0)
    return A, B, lx, lu, lxx, luu, lux


@pytest.mark.parametrize("dims", [(12, 3, 2), (31, 8, 4), (101, 12, 6)])
def test_parallel_matches_serial(dims):
    N, n, m = dims
    args = _inputs(jax.random.PRNGKey(0), N, n, m)
    reg = jnp.zeros(())
    K_s, d_s, dV1_s, dV2_s = _backward_pass_scan(*args, reg)
    K_p, d_p, dV1_p, dV2_p = parallel_backward_pass(*args, reg)
    np.testing.assert_allclose(K_p, K_s, atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(d_p, d_s, atol=1e-8, rtol=1e-6)
    np.testing.assert_allclose(dV1_p, dV1_s, rtol=1e-8)
    np.testing.assert_allclose(dV2_p, dV2_s, rtol=1e-8)


def test_solver_with_parallel_riccati():
    """End-to-end solve with the parallel backward pass enabled."""
    import altro_tpu as at
    n, m, N = 6, 3, 41
    key = jax.random.PRNGKey(1)
    A = jax.random.normal(key, (n, n)) * 0.3 + jnp.eye(n) * 0.7
    B = jax.random.normal(jax.random.PRNGKey(2), (n, m)) * 0.5
    x0 = jax.random.normal(jax.random.PRNGKey(3), (n,))
    dyn = at.lti_dynamics(A, B, N)
    cost = at.lqr_objective(jnp.eye(n), jnp.eye(m) * 0.1, jnp.eye(n) * 5,
                            jnp.zeros(n), N)
    cons = (at.bound_constraint(N, n, m, u_min=-1.0, u_max=1.0),)
    prob = at.Problem(dynamics=dyn, cost=cost, constraints=cons, x0=x0)
    opts_serial = at.SolverOptions(penalty_initial=1e2, penalty_scaling=10.0)
    opts_par = opts_serial.replace(parallel_riccati=True)
    sol_s = at.solve(prob, opts_serial)
    sol_p = at.solve(prob, opts_par)
    assert int(sol_p.stats.status) == 1
    np.testing.assert_allclose(sol_p.U, sol_s.U, atol=1e-6)
