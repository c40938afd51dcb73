"""Round-4 probe: where does the quadruped OSQP-role solve spend time?

VERDICT r3 item 5: the reference's central QP data point is OSQP BEATING
ALTRO on the trot QP (0.562 vs 0.762 ms, quadruped/plots/table.tex:9) while
our OSQP-role loses 3.35 vs 2.37 ms (results_cpu/quadruped.json). But the
reference numbers are SOLVER-INTERNAL: OSQP's `results.info.solve_time`
(ADMM iterations only — update_osqp_model!'s relinearization + sparse
update + the KKT refactor inside OSQP.update! are all excluded,
osqp_solver.jl:84-88) and ALTRO's `stats.tsolve` (altro_solver.jl:75,
excluding update_dynamics_matrices!). Our committed artifact times
prep + transcription + update + solve for both backends.

This probe replays the trot sequence (simulate_host structure) and times
each component separately for the native OSQP-role:

    prep      jitted JAX foot schedule + relinearization + knot transcription
    marshal   jnp -> contiguous np.float64 buffers (ctypes boundary)
    update    build_scaled + banded refactor (OSQP.update! role, untimed by
              the reference)
    solve     ADMM iterations (OSQP info.solve_time role, the table number)

and for the ALTRO backend: prep (same linearization, jitted separately)
vs solve (stats.tsolve role).

Run on CPU: env -u PYTHONPATH JAX_PLATFORMS=cpu python tools/exp_qp_race.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(tf: float = 2.0):
    import altro_tpu as at
    from altro_tpu.models.quadruped import config, controller, planner
    from altro_tpu.models.quadruped.controller import (_linearized_problem,
                                                       initial_state,
                                                       make_baseline_state,
                                                       control_tick, DT_SIM)
    from altro_tpu.models.quadruped.gait import GAITS
    from altro_tpu.native import qp as native_qp
    from altro_tpu.solver import knot_admm

    dtype = jnp.float64
    cfg = config.MPCConfig(linearized_friction=True)
    opts = at.SolverOptions(
        cost_tolerance=1e-4, constraint_tolerance=1e-4,
        penalty_initial=10.0, penalty_scaling=100.0)
    gait = GAITS[cfg.gait_type](cfg.stance_time, cfg.swing_time)
    prob, x_des = controller.build_mpc_problem(cfg, dtype)
    ticks_per_mpc = int(round(cfg.update_dt / DT_SIM))
    n_periods = int(round(tf / cfg.update_dt))

    state0 = initial_state(prob, x_des, opts, dtype)
    baseline = make_baseline_state("admm_qp", prob, cfg, x_des, dtype)
    assert isinstance(baseline, native_qp.NativeKnotWork)

    def mpc_prep(state, t):
        x_ref = jnp.tile(x_des, (cfg.N, 1))
        contacts, foot_locs, planner_fl = planner.foot_history(
            t, x_ref, state.feet_w, state.planner_foot_loc, gait,
            x_des, cfg.N, cfg.dynamics_discretization)
        prob_k = _linearized_problem(
            prob, state.x, x_ref, contacts, foot_locs,
            cfg.dynamics_discretization)
        return knot_admm.to_knot_qp(prob_k), planner_fl

    jprep = jax.jit(mpc_prep)

    def ticks_part(state, t):
        def tick(s, j):
            tj = t + j.astype(dtype) * DT_SIM
            s, _ = control_tick(s, tj, gait, cfg, x_des, None)
            return s, None

        state, _ = jax.lax.scan(tick, state, jnp.arange(ticks_per_mpc))
        return state

    jticks = jax.jit(ticks_part)

    # --- ALTRO backend with prep/solve SPLIT (tsolve-role timing) ---------
    from altro_tpu.mpc import shift_fill

    def altro_prep(state, t):
        x_ref = jnp.tile(x_des, (cfg.N, 1))
        contacts, foot_locs, planner_fl = planner.foot_history(
            t, x_ref, state.feet_w, state.planner_foot_loc, gait,
            x_des, cfg.N, cfg.dynamics_discretization)
        prob_k = _linearized_problem(
            prob, state.x, x_ref, contacts, foot_locs,
            cfg.dynamics_discretization)
        return prob_k, planner_fl

    def altro_solve(prob_k, U_prev, duals):
        sol = at.solve(prob_k, opts, U0=shift_fill(U_prev),
                       duals=tuple(d.shift() for d in duals))
        return sol.U, sol.duals, sol.stats.iterations, sol.stats.status

    japrep = jax.jit(altro_prep)
    jasolve = jax.jit(altro_solve)

    # compile
    t_w = jnp.asarray(0.0, dtype)
    kqp0, _ = jprep(state0, t_w)
    jax.block_until_ready(kqp0.Q)
    baseline.update(kqp0)
    baseline.solve(eps_abs=1e-4, check_every=10, warm=True)
    baseline.reset_iterate()
    pk0, _ = japrep(state0, t_w)
    jax.block_until_ready(pk0.x0)
    s0 = jasolve(pk0, state0.U_prev, state0.duals)
    jax.block_until_ready(s0[0])
    jax.block_until_ready(jticks(state0, t_w).x)

    res = {"n_periods": n_periods}

    # ---- native OSQP-role component sweep --------------------------------
    state = state0
    prep_ms, marshal_ms, update_ms, solve_ms, iters_l = [], [], [], [], []
    for k in range(n_periods):
        t = jnp.asarray(k * cfg.update_dt, dtype)
        t0 = time.perf_counter()
        kqp, planner_fl = jprep(state, t)
        jax.block_until_ready(kqp.Q)
        t1 = time.perf_counter()
        arrs = native_qp._knot_arrays(kqp)
        t2 = time.perf_counter()
        dp = __import__("ctypes").POINTER(__import__("ctypes").c_double)
        ret = native_qp._lib.altro_tpu_knot_update(
            baseline._h, *(a.ctypes.data_as(dp) for a in arrs))
        assert ret == 0
        t3 = time.perf_counter()
        nsol = baseline.solve(eps_abs=float(opts.cost_tolerance),
                              check_every=10, warm=True)
        t4 = time.perf_counter()
        prep_ms.append((t1 - t0) * 1e3)
        marshal_ms.append((t2 - t1) * 1e3)
        update_ms.append((t3 - t2) * 1e3)
        solve_ms.append((t4 - t3) * 1e3)
        iters_l.append(nsol.iterations)
        U_n = jnp.asarray(nsol.U, dtype)
        state = state.replace(forces=U_n[0], U_prev=U_n,
                              planner_foot_loc=planner_fl)
        state = jticks(state, t)
        jax.block_until_ready(state.x)

    res["osqp_role"] = {
        "prep_ms": round(float(np.mean(prep_ms)), 4),
        "marshal_ms": round(float(np.mean(marshal_ms)), 4),
        "update_ms": round(float(np.mean(update_ms)), 4),
        "solve_ms": round(float(np.mean(solve_ms)), 4),
        "solve_ms_std": round(float(np.std(solve_ms)), 4),
        "total_ms": round(float(np.mean(prep_ms) + np.mean(marshal_ms)
                                + np.mean(update_ms) + np.mean(solve_ms)), 4),
        "mean_iters": round(float(np.mean(iters_l)), 2),
    }
    print("OSQP-role:", json.dumps(res["osqp_role"], indent=1), flush=True)

    # ---- ALTRO backend prep/solve split -----------------------------------
    state = state0
    aprep_ms, asolve_ms, aiters = [], [], []
    for k in range(n_periods):
        t = jnp.asarray(k * cfg.update_dt, dtype)
        t0 = time.perf_counter()
        prob_k, planner_fl = japrep(state, t)
        jax.block_until_ready(prob_k.x0)
        t1 = time.perf_counter()
        U_new, duals, iters, status = jasolve(prob_k, state.U_prev,
                                              state.duals)
        jax.block_until_ready(U_new)
        t2 = time.perf_counter()
        aprep_ms.append((t1 - t0) * 1e3)
        asolve_ms.append((t2 - t1) * 1e3)
        aiters.append(int(iters))
        state = state.replace(forces=U_new[0], U_prev=U_new, duals=duals,
                              planner_foot_loc=planner_fl)
        state = jticks(state, t)
        jax.block_until_ready(state.x)

    res["altro"] = {
        "prep_ms": round(float(np.mean(aprep_ms)), 4),
        "solve_ms": round(float(np.mean(asolve_ms)), 4),
        "solve_ms_std": round(float(np.std(asolve_ms)), 4),
        "total_ms": round(float(np.mean(aprep_ms) + np.mean(asolve_ms)), 4),
        "mean_iters": round(float(np.mean(aiters)), 2),
    }
    print("ALTRO:", json.dumps(res["altro"], indent=1), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results_cpu", "qp_race_breakdown.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
