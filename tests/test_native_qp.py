"""Native C++ QP solver as a foreign-codebase oracle (the OSQP role)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import altro_tpu as at
from altro_tpu.native import available, solve_qp
from altro_tpu.solver import admm_qp
from altro_tpu.transcribe import to_batch_qp

pytestmark = pytest.mark.skipif(not available(),
                                reason="g++ not available to build native lib")


def test_native_box_qp():
    c = np.array([0.5, 2.0, -3.0, 0.0])
    sol = solve_qp(np.eye(4), -c, np.eye(4), -np.ones(4), np.ones(4),
                   eps_abs=1e-9)
    assert sol.status == 1
    np.testing.assert_allclose(sol.x, np.clip(c, -1, 1), atol=1e-7)


def test_native_matches_jax_admm_on_random_linear():
    """Three-way oracle: ALTRO (JAX), ADMM QP (JAX), ADMM QP (C++)."""
    from altro_tpu.models import random_linear as rl
    rng = np.random.default_rng(7)
    prob = rl.gen_random_linear(rng, 8, 3, 21)
    X_track, U_track = rl.gen_trajectory(rng, prob, 21)
    prob_mpc = rl.gen_tracking_mpc(prob, X_track, U_track, 21)

    qp = to_batch_qp(prob_mpc)
    jax_sol = admm_qp.solve(admm_qp.setup(qp), eps_abs=1e-8, max_iter=40000)
    nat_sol = solve_qp(np.asarray(qp.P), np.asarray(qp.q), np.asarray(qp.A),
                       np.asarray(qp.l), np.asarray(qp.u), eps_abs=1e-8,
                       max_iter=40000)
    assert int(jax_sol.status) == 1 and nat_sol.status == 1
    np.testing.assert_allclose(np.asarray(jax_sol.x), nat_sol.x, atol=1e-5)

    altro_sol = at.solve(prob_mpc, at.SolverOptions(
        cost_tolerance=1e-8, gradient_tolerance=1e-10,
        constraint_tolerance=1e-8, penalty_initial=1e3,
        penalty_scaling=100.0))
    Xa, Ua = altro_sol.X, altro_sol.U
    Xn, Un = admm_qp.extract_traj(qp, jnp.asarray(nat_sol.x))
    np.testing.assert_allclose(Xa, Xn, atol=1e-5)
    np.testing.assert_allclose(Ua, Un, atol=1e-5)
