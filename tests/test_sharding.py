"""Multi-device scenario sharding on the forced 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import altro_tpu as at
from altro_tpu.models import random_linear as rl
from altro_tpu.mpc import shift_fill
from altro_tpu.parallel import make_scenario_mesh, sharded_mpc_step, sharded_solve

OPTS = at.SolverOptions(penalty_initial=1e3, penalty_scaling=100.0,
                        reset_duals=False)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, m, N_track, N_mpc = 6, 3, 61, 11
    prob = rl.gen_random_linear(rng, n, m, N_track)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    prob_mpc = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    return prob, prob_mpc, X_track, U_track


def test_devices_available():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"


def test_sharded_solve_matches_vmap(setup):
    prob, prob_mpc, X_track, U_track = setup
    mesh = make_scenario_mesh()
    B = 16
    x0s = jnp.asarray(np.random.default_rng(1).standard_normal((B, prob.n)))

    U_sharded, total_iters, max_viol = jax.jit(
        lambda x: sharded_solve(prob_mpc, OPTS, x, mesh))(x0s)

    def one(x0):
        return at.solve(prob_mpc.replace(x0=x0), OPTS).U

    U_vmap = jax.vmap(one)(x0s)
    np.testing.assert_allclose(U_sharded, U_vmap, atol=1e-8)
    assert float(max_viol) < 1e-4
    assert int(total_iters) > 0


def test_sharded_mpc_step_runs(setup):
    prob, prob_mpc, X_track, U_track = setup
    mesh = make_scenario_mesh()
    B = 8
    n = prob.n

    step = sharded_mpc_step(prob_mpc, OPTS, X_track, U_track, mesh)

    # initial batched cold solves
    x0s = jnp.tile(prob_mpc.x0, (B, 1))
    sol0 = jax.vmap(lambda x0: at.solve(prob_mpc.replace(x0=x0), OPTS))(x0s)
    state = (x0s, sol0.X, sol0.U, sol0.duals, jnp.asarray(0))

    rng = np.random.default_rng(2)
    jstep = jax.jit(step)
    for _ in range(3):
        noise = jnp.asarray(rng.standard_normal((B, n)))
        state, (total_iters, max_viol, n_success) = jstep(state, noise)
    assert int(n_success) == B
    assert float(max_viol) < 1e-4
