"""Experiment: warm-start policies for the knot-ADMM quadruped baseline.

Replays the 2 s trot closed loop (simulate_host's structure) with the
knot-ADMM QP backend under different warm-start policies and reports mean
iterations / ms per solve. CPU f64:

    env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/exp_knot_warm.py
"""
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import numpy as np

from altro_tpu.models.quadruped import controller as C
from altro_tpu.models.quadruped import planner
from altro_tpu.models.quadruped.config import MPCConfig
from altro_tpu.models.quadruped.controller import (
    GAITS, DT_SIM, SPRUNG_MASS, build_mpc_problem, initial_state,
    linearize_horizon, make_baseline_state)
from altro_tpu.solver import knot_admm
import altro_tpu as at


def run_policy(policy: str, rho: float = 0.1, tf: float = 2.0):
    dtype = jnp.float64
    cfg = MPCConfig()
    opts = at.SolverOptions(cost_tolerance=1e-4, constraint_tolerance=1e-4,
                            penalty_initial=10.0, penalty_scaling=10.0,
                            reset_duals=False)
    gait = GAITS[cfg.gait_type](cfg.stance_time, cfg.swing_time)
    prob, x_des = build_mpc_problem(cfg, dtype)
    ticks_per_mpc = int(round(cfg.update_dt / DT_SIM))
    n_periods = int(round(tf / cfg.update_dt))
    state0 = initial_state(prob, x_des, opts, dtype)
    baseline0 = make_baseline_state("admm_qp", prob, cfg, x_des, dtype)
    if rho != 0.1:
        baseline0 = knot_admm.setup(baseline0.qp, rho=rho)

    def mpc_part(state, baseline, t, internal):
        x_ref = jnp.tile(x_des, (cfg.N, 1))
        contacts, foot_locs, planner_fl = planner.foot_history(
            t, x_ref, state.feet_w, state.planner_foot_loc, gait, x_des,
            cfg.N, cfg.dynamics_discretization)
        nst = jnp.maximum(jnp.sum(contacts, axis=1, keepdims=True), 1.0)
        fz_ref = SPRUNG_MASS * 9.81 / nst * contacts
        u_ref = jnp.zeros((prob.N, 12), dtype).at[:, 2::3].set(fz_ref)
        dyn = linearize_horizon(x_ref, u_ref, foot_locs, contacts,
                                cfg.dynamics_discretization)
        prob_k = prob.replace(dynamics=dyn, x0=state.x)
        kqp = knot_admm.to_knot_qp(prob_k)
        work = knot_admm.refactor(baseline, kqp)
        ksol = knot_admm.solve(work, eps_abs=1e-4, internal=internal)
        state = state.replace(forces=ksol.U[0], U_prev=ksol.U,
                              planner_foot_loc=planner_fl)
        return state, ksol

    def ticks_part(state, t):
        def tick(s, j):
            tj = t + j.astype(dtype) * DT_SIM
            s, _ = C.control_tick(s, tj, gait, cfg, x_des, None)
            return s, None
        state, _ = jax.lax.scan(tick, state, jnp.arange(ticks_per_mpc))
        return state

    jmpc = jax.jit(mpc_part)
    jticks = jax.jit(ticks_part)

    def make_internal(prev, policy):
        if prev is None or policy == "zero":
            return None
        X, U, z, y, rho_i = prev
        if policy == "full":
            return (X, U, z, y, rho_i)
        if policy == "primal":
            y0 = jax.tree_util.tree_map(jnp.zeros_like, y)
            return (X, U, z, y0, rho_i)
        if policy == "primal_dyn":
            y0 = (y[0], y[1], tuple(jnp.zeros_like(g) for g in y[2]))
            return (X, U, z, y0, rho_i)
        raise ValueError(policy)

    # warm-up compile (both internal variants trace differently)
    s, ks = jmpc(state0, baseline0, jnp.asarray(0.0, dtype), None)
    jax.block_until_ready(ks.iterations)
    if policy != "zero":
        s2, ks2 = jmpc(state0, baseline0, jnp.asarray(0.0, dtype),
                       make_internal(ks.internal, policy))
        jax.block_until_ready(ks2.iterations)
    jax.block_until_ready(jticks(state0, jnp.asarray(0.0, dtype)).x)

    state = state0
    internal = None
    iters, ok, ms = [], [], []
    for k in range(n_periods):
        t = jnp.asarray(k * cfg.update_dt, dtype)
        t0 = time.perf_counter()
        state, ksol = jmpc(state, baseline0, t, internal)
        jax.block_until_ready(ksol.iterations)
        ms.append((time.perf_counter() - t0) * 1e3)
        iters.append(int(ksol.iterations))
        ok.append(int(ksol.status))
        internal = make_internal(ksol.internal, policy)
        state = jticks(state, t)
    height = float(state.x[2])
    print(f"{policy:11s} rho={rho:<5} mean_iters={np.mean(iters):7.1f} "
          f"p90={np.percentile(iters, 90):6.0f} ms/solve={np.mean(ms):7.2f} "
          f"success={np.mean(ok):.3f} height={height:.3f}")
    return np.mean(iters), np.mean(ms)


if __name__ == "__main__":
    for policy in ("zero", "full", "primal", "primal_dyn"):
        run_policy(policy)
