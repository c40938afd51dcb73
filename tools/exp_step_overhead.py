"""Round-4 probe: split the flagship per-STEP overhead in context.

The round-3 attribution (results_tpu/attribution.json) left ~1.25 ms of the
2.10 ms/step intercept unattributed (isolated segments sum to ~0.85 ms).
This probe times three VARIANTS of the real bench step, all with the same
carry pytree and pipelined dispatch, so every number is in-context:

  wrapper_only   x0 propagate + noise + retarget + shifts + xws correction,
                 solve SKIPPED (returns the warm start as the "solution")
  solve_cap0     the full step but the solve runs solve_partial(it_cap=0)
                 + finalize: warm-start state build + while entry/exit +
                 finalize, ZERO loop bodies
  full_step_1it  the full step at forced iterations_inner=1 (the run_slope
                 inner1 row, re-measured in the same session)

  solver_fixed  = solve_cap0 - wrapper_only      (solver entry/exit cost)
  iteration_1   = full_step_1it - solve_cap0     (first loop body, in context)

Also sweeps the line-search ladder length L (BENCH_LS analog): warm solves
take the alpha=1 exact step ~99% of the time, so rungs 2..4 are almost
always wasted kernel+cost-eval work.

Run on TPU: python tools/exp_step_overhead.py
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


REPEATS = 200


def pipeline_time(fn, carry0, noises, label, samples=3):
    carry, out = fn(carry0, noises[0])
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    T = noises.shape[0]
    walls = []
    for _ in range(samples):
        carry = carry0
        t0 = time.perf_counter()
        for t in range(T):
            carry, out = fn(carry, noises[t])
        jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
        walls.append((time.perf_counter() - t0) / T * 1e3)
    med = float(np.median(walls))
    print(f"  {label:34s} {med:8.3f} ms/step", flush=True)
    return med


def main(B=1024):
    import altro_tpu as at
    from altro_tpu import costs as C
    from altro_tpu.mpc import (MPCResults, _xws_corrector, make_mpc_step,
                               shift_fill, track_window)
    from altro_tpu.models import random_linear as rl
    from altro_tpu.solver import altro as S

    dtype = jnp.float32
    rng = np.random.default_rng(1)
    N_mpc, n, m = 30, 12, 6
    N_track = N_mpc + REPEATS + 2
    prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    pm = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    base_opts = dict(
        cost_tolerance=1e-4, gradient_tolerance=1e-4,
        constraint_tolerance=1e-4, penalty_initial=1e3,
        penalty_scaling=100.0, reset_duals=False, early_exact_tol=1e-3)
    opts = at.SolverOptions(iterations_linesearch=4, **base_opts)

    # warm carry at the bench's state
    step, init_carry = make_mpc_step(pm, opts, X_track, U_track,
                                     shared_k=True)
    vstep_k = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
    _kc = jnp.asarray(0, jnp.int32)
    carry0 = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    noise = jnp.asarray(rng.standard_normal((REPEATS, B, n)), dtype)
    for t in range(3):
        carry0, _ = vstep_k(carry0, noise[t], jnp.asarray(t, jnp.int32))
    jax.block_until_ready(carry0)

    dyn = pm.dynamics
    xws = _xws_corrector(dyn)
    res = {}

    with jax.default_matmul_precision("highest"):
        # ---- wrapper-only: everything except the solve ----
        def wrapper_step(carry, noise_i):
            x0, X, U, duals = carry
            x_prop = dyn.step(x0, U[0], 0)
            x0_new = x_prop + noise_i * jnp.max(jnp.abs(x_prop)) / 100.0
            Xw, Uw = track_window(X_track, U_track, _kc + 1, N_mpc)
            cost_new = C.retarget_tracking(pm.cost, Xw, Uw)
            U_ws = shift_fill(U)
            duals_ws = tuple(d.shift() for d in duals)
            X_ws = xws(X, U_ws, x0_new)
            # touch cost_new so the retarget isn't DCE'd
            X_ws = X_ws + 0.0 * jnp.sum(cost_new.q[0])
            return (x0_new, X_ws, U_ws, duals_ws), x0_new

        jwrap = jax.jit(jax.vmap(wrapper_step, in_axes=(0, 0)))
        res["wrapper_only"] = pipeline_time(jwrap, carry0, noise,
                                            "wrapper only (no solve)")

        # ---- solve at it_cap=0: entry/exit + finalize, no loop body ----
        def cap0_step(carry, noise_i):
            x0, X, U, duals = carry
            x_prop = dyn.step(x0, U[0], 0)
            x0_new = x_prop + noise_i * jnp.max(jnp.abs(x_prop)) / 100.0
            Xw, Uw = track_window(X_track, U_track, _kc + 1, N_mpc)
            prob_k = pm.replace(
                cost=C.retarget_tracking(pm.cost, Xw, Uw), x0=x0_new)
            U_ws = shift_fill(U)
            duals_ws = tuple(d.shift() for d in duals)
            X_ws = xws(X, U_ws, x0_new)
            st = S.solve_partial(prob_k, opts, U_ws, duals_ws, X_ws,
                                 it_cap=0)
            with jax.default_matmul_precision("highest"):
                sol = S._finalize(prob_k, st)
            out = MPCResults(X=sol.X, U=sol.U, iters=sol.stats.iterations,
                             status=sol.stats.status, viol=sol.stats.viol,
                             x0=x0_new)
            return (x0_new, sol.X, sol.U, sol.duals), out

        jcap0 = jax.jit(jax.vmap(cap0_step, in_axes=(0, 0)))
        res["solve_cap0"] = pipeline_time(jcap0, carry0, noise,
                                          "step w/ solve capped at 0 iters")

        # ---- forced 1-iteration full step ----
        def forced_step(iters_inner, L):
            o = at.SolverOptions(
                iterations_linesearch=L, iterations_inner=iters_inner,
                iterations_outer=1, **{**base_opts,
                                       "cost_tolerance": 0.0,
                                       "gradient_tolerance": 0.0,
                                       "early_exact_tol": 0.0})
            st, _ic = make_mpc_step(pm, o, X_track, U_track, shared_k=True)
            j = jax.jit(jax.vmap(st, in_axes=(0, 0, None)))
            return lambda c, nz: j(c, nz, _kc)

        res["full_step_1it"] = pipeline_time(
            forced_step(1, 4), carry0, noise, "full step @ 1 forced iter")
        res["full_step_2it"] = pipeline_time(
            forced_step(2, 4), carry0, noise, "full step @ 2 forced iters")

        # ---- ladder-length sweep on the REAL adaptive step ----
        for L in (1, 2, 4):
            o = at.SolverOptions(iterations_linesearch=L, **base_opts)
            st, _ic = make_mpc_step(pm, o, X_track, U_track, shared_k=True)
            j = jax.jit(jax.vmap(st, in_axes=(0, 0, None)))
            fn = lambda c, nz: j(c, nz, _kc)
            res[f"real_step_L{L}"] = pipeline_time(
                fn, carry0, noise, f"real adaptive step, ladder L={L}")

    res["solver_fixed_ms"] = round(res["solve_cap0"] - res["wrapper_only"], 4)
    res["iteration1_ms"] = round(res["full_step_1it"] - res["solve_cap0"], 4)
    res["iteration2_ms"] = round(res["full_step_2it"] - res["full_step_1it"], 4)
    res["batch"] = B
    res["device"] = str(jax.devices()[0])
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in res.items()}, indent=1))
    with open("results_tpu/step_overhead.json", "w") as f:
        json.dump({k: (round(v, 4) if isinstance(v, float) else v)
                   for k, v in res.items()}, f, indent=1)


if __name__ == "__main__":
    main()
