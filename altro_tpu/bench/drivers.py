"""Benchmark sweep drivers — parity with the reference's L5 experiment
scripts (SURVEY.md section 1):

- random-linear horizon / state-dim / control-dim sweeps
  (run_random_linear.jl:109-173)
- rocket tolerance sweep (run_simple_rocket.jl:118-206)
- grasp horizon sweep (grasp_benchmark.jl:16-172)
- flexible-satellite per-step timing (flexible_sat_mpc.jl:242-308)
- quadruped 4-config timing (quadruped_benchmark.jl:1-55)

Each driver runs ALTRO against the in-framework baseline in lockstep,
records per-step solve latency (median-of-samples, jitted, fenced) plus
batched throughput, and persists json results + a comparison figure.

Run: ``python -m altro_tpu.bench.drivers <benchmark> [--out results/]``
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from .harness import BenchResult, benchmark_fn, comparison_plot, save_results


def _opts(**kw):
    import altro_tpu as at
    return at.SolverOptions(**kw)


def _time_mpc_steps(step_fn, carry0, noises, samples=3):
    """Eagerly run an MPC loop, timing each jitted step (the reference times
    each solve call; we time the full warm-started step)."""
    jstep = jax.jit(step_fn)
    carry = jax.block_until_ready(jstep(carry0, noises[0]))[0]  # compile
    carry = carry0
    times = []
    for nz in noises:
        t0 = time.perf_counter()
        carry, out = jstep(carry, nz)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) * 1e3)
    return times, carry


# ---------------------------------------------------------------------------
# Random linear sweeps
# ---------------------------------------------------------------------------

def random_linear_sweep(kind: str = "horizon", T: int = 100, seed: int = 1,
                        dtype=jnp.float32):
    """kind in {horizon, state_dim, control_dim}
    (run_random_linear.jl:109-156)."""
    import altro_tpu as at
    from altro_tpu.models import random_linear as rl
    from altro_tpu.mpc import run_mpc_lockstep

    sweeps = {
        "horizon": dict(Ns=[11, 31, 51, 71, 101], n=12, m=6, seed=1),
        "state_dim": dict(Ns=[21], ns=[2, 15, 25, 35, 45, 55], m=2, seed=10),
        "control_dim": dict(Ns=[21], ms=[2, 6, 10, 15, 20, 25], n=30, seed=15),
    }[kind]
    opts = _opts(cost_tolerance=1e-4, constraint_tolerance=1e-4,
                 gradient_tolerance=1e-4, penalty_initial=1e3,
                 penalty_scaling=100.0, reset_duals=False)

    if kind == "horizon":
        configs = [(sweeps["n"], sweeps["m"], N) for N in sweeps["Ns"]]
        xs = sweeps["Ns"]
        xlabel = "MPC horizon N"
    elif kind == "state_dim":
        configs = [(n, sweeps["m"], sweeps["Ns"][0]) for n in sweeps["ns"]]
        xs = sweeps["ns"]
        xlabel = "state dimension n"
    else:
        configs = [(sweeps["n"], m, sweeps["Ns"][0]) for m in sweeps["ms"]]
        xs = sweeps["ms"]
        xlabel = "control dimension m"

    out: Dict[str, Dict[float, List[float]]] = {"ALTRO": {}, "ADMM-QP": {}}
    errs = {}
    for x, (n, m, N_mpc) in zip(xs, configs):
        rng = np.random.default_rng(sweeps["seed"])
        N_track = N_mpc + T + 2
        prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
        X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
        prob_mpc = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
        noise = jnp.asarray(rng.standard_normal((T, n)), dtype)

        res = jax.block_until_ready(jax.jit(
            lambda nz: run_mpc_lockstep(prob_mpc, opts, X_track, U_track, nz)
        )(noise))
        errs[x] = dict(err_X=float(jnp.max(res.err_X)),
                       err_U=float(jnp.max(res.err_U)),
                       success=float(jnp.mean(res.status[:, 0])))

        # per-solve latency: time warm solves standalone
        from altro_tpu.mpc import run_mpc
        b_altro = benchmark_fn(
            jax.jit(lambda: run_mpc(prob_mpc, opts, X_track, U_track,
                                    noise[:10]).iters),
            samples=3, evals=1, name=f"altro_{x}")
        out["ALTRO"][x] = [t / 11 for t in b_altro.samples_ms]  # 10 steps + cold

        from altro_tpu.solver import admm_qp
        from altro_tpu.transcribe import to_batch_qp
        work = admm_qp.setup(to_batch_qp(prob_mpc))
        b_qp = benchmark_fn(
            jax.jit(lambda: admm_qp.solve(work, eps_abs=1e-4).x),
            samples=3, evals=3, name=f"qp_{x}")
        out["ADMM-QP"][x] = b_qp.samples_ms
        print(f"  {xlabel}={x}: ALTRO {np.mean(out['ALTRO'][x]):.3f} ms/step, "
              f"ADMM-QP {np.mean(out['ADMM-QP'][x]):.3f} ms, "
              f"err_U={errs[x]['err_U']:.2e}")
    return dict(kind=kind, xlabel=xlabel, times=out, errs=errs)


# ---------------------------------------------------------------------------
# Rocket tolerance sweep
# ---------------------------------------------------------------------------

def rocket_tol_sweep(tols=(1e-2, 1e-4, 1e-6, 1e-8), T: int = 10,
                     N_mpc: int = 21):
    """Trajectory error + timing vs solver tolerance
    (run_simple_rocket.jl:146-206 / figures/rocket_solver_tol.tikz)."""
    import altro_tpu as at
    from altro_tpu.models import rocket
    from altro_tpu.mpc import gen_tracking_mpc, run_mpc_lockstep_conic

    N = 301
    prob = rocket.rocket_problem(N=N, tf=(N - 1) * 0.05)
    cold = at.solve(prob, _opts(
        cost_tolerance=1e-6, gradient_tolerance=1e-8,
        constraint_tolerance=1e-5, penalty_initial=1e-2, penalty_scaling=500.0,
        iterations_outer=40, iterations_inner=100),
        U0=rocket.hover_controls(prob))
    prob_mpc = gen_tracking_mpc(prob, cold.X, cold.U, N_mpc, dt=0.05)
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((T, 6)))

    rows = []
    for tol in tols:
        opts = _opts(cost_tolerance=tol, gradient_tolerance=tol * 1e-2,
                     constraint_tolerance=tol, penalty_initial=1e3,
                     penalty_scaling=10.0, reset_duals=False,
                     iterations_outer=40)
        res = jax.block_until_ready(run_mpc_lockstep_conic(
            prob_mpc, opts, cold.X, cold.U, noise, conic_eps=1e-9,
            conic_max_iter=50000, noise_model=rocket.rocket_noise_model()))
        from altro_tpu.mpc import run_mpc
        b = benchmark_fn(jax.jit(
            lambda: run_mpc(prob_mpc, opts, cold.X, cold.U, noise,
                            noise_model=rocket.rocket_noise_model()).iters),
            samples=3, evals=1)
        rows.append(dict(tol=tol, err_X=float(jnp.max(res.err_X)),
                         err_U=float(jnp.max(res.err_U)),
                         altro_ms_per_step=b.median_ms / (T + 1),
                         iters=float(jnp.mean(res.iters[:, 0]))))
        print(f"  tol={tol:g}: err_U={rows[-1]['err_U']:.2e} "
              f"altro {rows[-1]['altro_ms_per_step']:.3f} ms/step")
    return dict(rows=rows, cold_iterations=int(cold.stats.iterations))


# ---------------------------------------------------------------------------
# Grasp horizon sweep
# ---------------------------------------------------------------------------

def grasp_horizon_sweep(Ns=(11, 21, 31, 41, 51), T: int = 10):
    """(grasp_benchmark.jl:16-172)"""
    import altro_tpu as at
    from altro_tpu.models import grasp
    from altro_tpu.mpc import (gen_tracking_mpc, run_mpc,
                               run_mpc_lockstep_conic)

    N, tf = 61, 6.0
    o = grasp.make_grasp_object(N, tf)
    prob = grasp.grasp_problem(o, N, tf)
    cold = at.solve(prob, _opts(
        cost_tolerance=1e-6, gradient_tolerance=1e-8,
        constraint_tolerance=1e-6, penalty_initial=10.0, penalty_scaling=10.0,
        iterations_outer=30, iterations_inner=50),
        U0=grasp.hover_controls(o, N))
    opts = _opts(cost_tolerance=1e-4, constraint_tolerance=1e-4,
                 penalty_initial=1e4, penalty_scaling=100.0, reset_duals=False)

    out = {"ALTRO": {}, "ADMM-Conic": {}}
    errs = {}
    rng = np.random.default_rng(0)
    for N_mpc in Ns:
        prob_mpc = gen_tracking_mpc(prob, cold.X, cold.U, N_mpc, Qk=1e3,
                                    Rk=1.0, Qfk=10.0, dt=tf / (N - 1))
        prob_mpc = prob_mpc.replace(
            constraints=grasp.grasp_constraints(o, N_mpc, 0))
        fn = lambda k, N_mpc=N_mpc: grasp.grasp_constraints(o, N_mpc, k)
        noise = jnp.asarray(rng.standard_normal((T, 6)))
        res = jax.block_until_ready(run_mpc_lockstep_conic(
            prob_mpc, opts, cold.X, cold.U, noise, conic_eps=1e-6,
            constraints_fn=fn))
        errs[N_mpc] = dict(err_U=float(jnp.max(res.err_U)),
                           success=float(jnp.mean(res.status[:, 0])))
        b = benchmark_fn(jax.jit(
            lambda: run_mpc(prob_mpc, opts, cold.X, cold.U, noise,
                            constraints_fn=fn).iters),
            samples=3, evals=1)
        out["ALTRO"][N_mpc] = [t / (T + 1) for t in b.samples_ms]
        conic_iters = float(jnp.mean(res.iters[:, 1]))
        out["ADMM-Conic"][N_mpc] = [conic_iters]  # iterations, not ms (see json)
        print(f"  N={N_mpc}: ALTRO {np.mean(out['ALTRO'][N_mpc]):.3f} ms/step,"
              f" err_U={errs[N_mpc]['err_U']:.2e}")
    return dict(times=out, errs=errs)


# ---------------------------------------------------------------------------
# Flexible satellite
# ---------------------------------------------------------------------------

def flexsat_benchmark(T: int = 45, trials: int = 10):
    """(flexible_sat_mpc.jl:242-308)"""
    import altro_tpu as at
    from altro_tpu.models import flexible_satellite as fs

    prob = fs.flexsat_problem()
    opts = _opts(cost_tolerance=1e-4, constraint_tolerance=1e-4,
                 penalty_initial=100.0, penalty_scaling=100.0)
    times = []
    for trial in range(trials):
        rng = np.random.default_rng(trial)
        noise = jnp.asarray(rng.standard_normal((T, prob.n)))
        b = benchmark_fn(jax.jit(
            lambda: fs.run_regulator_mpc(prob, opts, noise).iters),
            samples=1, evals=1, warmup=1 if trial == 0 else 0)
        times.append(b.median_ms / (T + 1))
        print(f"  trial {trial}: {times[-1]:.3f} ms/step")
    return dict(ms_per_step=times)


# ---------------------------------------------------------------------------
# Quadruped
# ---------------------------------------------------------------------------

def quadruped_benchmark(tf: float = 2.0):
    """Four configs: ALTRO-QP, ADMM-QP (OSQP role), ALTRO-SOCP,
    ADMM-Conic (ECOS role) (quadruped_benchmark.jl:1-55)."""
    import altro_tpu as at
    from altro_tpu.models.quadruped import config, controller

    opts = _opts(cost_tolerance=1e-4, constraint_tolerance=1e-4,
                 penalty_initial=10.0, penalty_scaling=100.0,
                 reset_duals=False)
    rows = {}
    for name, lin, backend in (
            ("ALTRO-QP", True, "altro"),
            ("OSQP-role", True, "admm_qp"),
            ("ALTRO-SOCP", False, "altro"),
            ("ECOS-role", False, "admm_conic")):
        cfg = config.MPCConfig(linearized_friction=lin)
        fn = jax.jit(lambda cfg=cfg, backend=backend: controller.simulate(
            cfg, opts, tf=tf, backend=backend)["status"])
        b = benchmark_fn(fn, samples=2, evals=1, name=name)
        n_solves = int(round(tf / cfg.update_dt))
        status = np.asarray(jax.block_until_ready(fn()))
        rows[name] = dict(ms_per_solve=b.median_ms / n_solves,
                          success=float(status.mean()))
        print(f"  {name}: {rows[name]['ms_per_solve']:.3f} ms/solve "
              f"(success {rows[name]['success']:.2f})")
    return rows


BENCHMARKS = {
    "random_linear_horizon": lambda: random_linear_sweep("horizon"),
    "random_linear_state_dim": lambda: random_linear_sweep("state_dim"),
    "random_linear_control_dim": lambda: random_linear_sweep("control_dim"),
    "rocket": rocket_tol_sweep,
    "grasp": grasp_horizon_sweep,
    "flexsat": flexsat_benchmark,
    "quadruped": quadruped_benchmark,
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("benchmark", choices=list(BENCHMARKS) + ["all"])
    p.add_argument("--out", default="results")
    args = p.parse_args()
    names = list(BENCHMARKS) if args.benchmark == "all" else [args.benchmark]
    for name in names:
        print(f"== {name}")
        res = BENCHMARKS[name]()
        save_results(os.path.join(args.out, f"{name}.json"), res)
        if isinstance(res, dict) and "times" in res:
            try:
                comparison_plot(res["times"], res.get("xlabel", "sweep"),
                                os.path.join("figures", f"{name}.png"))
            except Exception as e:  # plotting is best-effort
                print(f"  (plot skipped: {e})")


if __name__ == "__main__":
    main()
