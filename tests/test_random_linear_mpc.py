"""End-to-end random-linear MPC benchmark slice (the reference's benchmark 1).

Reproduces the structure of run_MPC (random_linear_problem.jl:85-189):
warm-started receding-horizon tracking with 1% noise, ALTRO vs the
in-framework ADMM QP in lockstep, inf-norm agreement at tolerance level.
"""
import jax
import jax.numpy as jnp
import numpy as np

import altro_tpu as at
from altro_tpu.models import random_linear as rl
from altro_tpu.mpc import run_mpc, run_mpc_lockstep

OPTS = at.SolverOptions(
    cost_tolerance=1e-4,
    constraint_tolerance=1e-4,
    penalty_initial=1e3,
    penalty_scaling=100.0,
    reset_duals=False,
)


def _make_setup(seed=1, n=12, m=6, N_track=121, N_mpc=21):
    rng = np.random.default_rng(seed)
    prob = rl.gen_random_linear(rng, n, m, N_track)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    prob_mpc = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    return prob, prob_mpc, X_track, U_track


def test_mpc_tracks_reference():
    prob, prob_mpc, X_track, U_track = _make_setup()
    T = 30
    rng = np.random.default_rng(2)
    noise = jnp.asarray(rng.standard_normal((T, prob.n)))
    results = jax.jit(run_mpc, static_argnames=())(
        prob_mpc, OPTS, X_track, U_track, noise)
    # Every step solved successfully within constraint tolerance
    assert int(jnp.sum(results.status)) == T
    assert float(jnp.max(results.viol)) < 1e-4
    # Controls respect the +-3 bound
    assert float(jnp.max(jnp.abs(results.U))) <= 3.0 + 1e-4
    # The closed loop actually tracks: state stays near the reference window
    errs = jnp.array([
        jnp.max(jnp.abs(results.x0[t] - X_track[t + 1]))
        for t in range(T)])
    assert float(jnp.median(errs)) < 2.0  # bounded tracking error


def test_lockstep_altro_vs_admm_qp():
    """The reference's core equivalence oracle: ALTRO and the QP baseline
    agree to ~tolerance on every MPC step (err_traj at 1e-4-ish level,
    random_linear_problem.jl:176-186)."""
    prob, prob_mpc, X_track, U_track = _make_setup()
    T = 15
    rng = np.random.default_rng(3)
    noise = jnp.asarray(rng.standard_normal((T, prob.n)))
    res = run_mpc_lockstep(prob_mpc, OPTS, X_track, U_track, noise,
                           qp_eps=1e-7)
    assert int(jnp.sum(res.status[:, 0])) == T  # ALTRO succeeded every step
    assert int(jnp.sum(res.status[:, 1])) == T  # ADMM converged every step
    # Solution agreement at tolerance level
    assert float(jnp.max(res.err_X)) < 5e-3
    assert float(jnp.max(res.err_U)) < 5e-3
    # Both solutions honor the initial condition
    assert float(jnp.max(res.err_x0)) < 1e-5


def test_mpc_warm_start_reduces_iterations():
    """Warm-started steps should take far fewer iLQR iterations than the
    cold initial solve (the whole point of the MPC warm-start machinery)."""
    prob, prob_mpc, X_track, U_track = _make_setup()
    T = 20
    noise = jnp.zeros((T, prob.n))  # noise-free: warm starts near-exact
    results = run_mpc(prob_mpc, OPTS, X_track, U_track, noise)
    assert float(jnp.mean(results.iters)) <= 8.0
