"""Decompose the bare solver's per-solve overhead (~1.6 ms at B=1024).

run_slope_solver's intercept covers everything outside the per-iteration
slope: warm-start state construction (init rollout, dual shift), while-loop
entry/exit (carry layout transitions), and _finalize (final cost eval,
stats assembly). This experiment times nested subsets of that pipeline with
pipelined dispatch (independent program repeats, one fence):

  warmstart_only      _warmstart_state alone
  warmstart_loop0     + while_loop with iterations_outer=0 (cond false)
  solve_iters0        + _finalize (the full solve at zero iterations)
  solve_iters1        one forced iteration (for the marginal-iter check)

Run on TPU: python -m tools.exp_overhead
"""
from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

REPEATS = 100


def _pipe_time(fn, args, label, samples=3):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / REPEATS * 1e3)
    med = float(np.median(times))
    print(f"  {label:34s} {med:8.3f} ms", flush=True)
    return med


def main(B=1024):
    import altro_tpu as at
    from altro_tpu.mpc import make_mpc_step
    from altro_tpu.models import random_linear as rl
    from altro_tpu.solver import altro as S

    dtype = jnp.float32
    rng = np.random.default_rng(1)
    N_mpc, n, m = 30, 12, 6
    prob = rl.gen_random_linear(rng, n, m, N_mpc + 7, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_mpc + 7)
    pm = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    opts_w = at.SolverOptions(
        cost_tolerance=1e-4, gradient_tolerance=1e-4,
        constraint_tolerance=1e-4, penalty_initial=1e3,
        penalty_scaling=100.0, reset_duals=False, iterations_linesearch=4)

    step, init_carry = make_mpc_step(pm, opts_w, X_track, U_track)
    carry = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    x0s, _Xs, Us, duals, _ = carry

    res = {}

    def ws_only(x0, U, d):
        with jax.default_matmul_precision("highest"):
            s = S._warmstart_state(pm.replace(x0=x0), opts_w, U, d)
        return s[0], s[1]

    res["warmstart_only"] = _pipe_time(
        jax.jit(jax.vmap(ws_only)), (x0s, Us, duals), "warmstart state only")

    for iters_outer, iters_inner, key in ((0, 1, "solve_iters0"),
                                          (1, 1, "solve_iters1")):
        opts = opts_w.replace(cost_tolerance=0.0, gradient_tolerance=0.0,
                              early_exact_tol=0.0,
                              iterations_inner=iters_inner,
                              iterations_outer=iters_outer)

        def solve_only(x0, U, d, _opts=opts):
            sol = at.solve(pm.replace(x0=x0), _opts, U0=U, duals=d)
            return sol.U, sol.stats.iterations

        res[key] = _pipe_time(jax.jit(jax.vmap(solve_only)),
                              (x0s, Us, duals), f"solve @ {key}")

    def loop0(x0, U, d):
        with jax.default_matmul_precision("highest"):
            s0 = S._warmstart_state(
                pm.replace(x0=x0),
                opts_w.replace(iterations_outer=0), U, d)
            s = S._flat_while(pm.replace(x0=x0),
                              opts_w.replace(iterations_outer=0), s0, None)
        return s[0], s[1]

    res["warmstart_loop0"] = _pipe_time(
        jax.jit(jax.vmap(loop0)), (x0s, Us, duals),
        "warmstart + empty while_loop")

    res["batch"] = B
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()
