"""Poor-man's per-segment attribution of the flagship MPC iteration.

``jax.profiler`` traces hang through the axon relay (CLAUDE.md), so this
driver times each jitted sub-program of the batched warm-started iteration
separately at the flagship shapes (B=1024, n=12, m=6, N=30, f32):

  - AL expansion (cost + constraint-penalty quadraticization)
  - Riccati backward pass (Pallas lane-packed kernel)
  - fused expansion+backward boundary (what the solver actually calls)
  - line-search ladder rollouts (Pallas kernel)
  - AL cost evaluation of the ladder (the XLA-side einsums)
  - one full iLQR iteration, one full warm MPC step

Sub-program times measured in isolation do NOT add up to the in-context
times (layout transitions at jit boundaries differ — see the
riccati_fused.py lesson), so the full-step and full-iteration rows anchor
the truth; the component rows bound where the time can be.

Run on TPU: ``python -m altro_tpu.bench.attribution``.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


# chain length per timed program: one ~34 ms tunnel RTT is amortized over
# REPEATS scan steps, so the per-segment floor it adds is RTT/REPEATS
# (~0.17 ms at 200 — at 20 the floor was 1.7 ms and swamped every segment)
REPEATS = 200


def _chain_time(fn_scalar, label, samples=5):
    """Time ``fn_scalar(eps) -> scalar`` with a dependency chain of REPEATS
    calls inside one jit (eps_{k+1} = 1e-12 * fn_scalar(eps_k)) so the
    ~30 ms tunnel RTT is amortized instead of dominating every sample."""
    def body(eps, _):
        return 1e-12 * fn_scalar(eps), ()

    jc = jax.jit(lambda e: jax.lax.scan(body, e, None, length=REPEATS)[0])
    e0 = jnp.zeros((), jnp.float32)
    jax.block_until_ready(jc(e0))  # compile
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        out = jc(e0)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / REPEATS * 1e3)
    med = float(np.median(times))
    print(f"  {label:38s} {med:8.3f} ms", flush=True)
    return med


def _pipeline_time(fn, carry0, noises, label):
    """Time a carry-chained step function with pipelined dispatch and one
    fence (the bench.py pattern) — for the full-step row, which cannot be
    scanned (scan-of-solver blows up the remote compile)."""
    carry, out = fn(carry0, noises[0])
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])  # compile
    T = noises.shape[0]
    carry = carry0
    t0 = time.perf_counter()
    for t in range(T):
        carry, out = fn(carry, noises[t])
    jax.block_until_ready(jax.tree_util.tree_leaves(carry)[0])
    med = (time.perf_counter() - t0) / T * 1e3
    print(f"  {label:38s} {med:8.3f} ms", flush=True)
    return med


def run(B=1024, T=5):
    import altro_tpu as at
    from altro_tpu.mpc import make_mpc_step
    from altro_tpu.models import random_linear as rl
    from altro_tpu.solver import altro as S

    dtype = jnp.float32
    rng = np.random.default_rng(1)
    N_mpc, n, m = 30, 12, 6
    N_track = N_mpc + T + 2
    prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    pm = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    opts = at.SolverOptions(
        cost_tolerance=1e-4, gradient_tolerance=1e-4,
        constraint_tolerance=1e-4, penalty_initial=1e3,
        penalty_scaling=100.0, reset_duals=False, iterations_linesearch=4)

    # representative batched state: run a couple of warm steps first
    step, init_carry = make_mpc_step(pm, opts, X_track, U_track,
                                     shared_k=True)
    vstep_k = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
    _kc = jnp.asarray(0, jnp.int32)
    vstep = lambda c, nz, t=0: vstep_k(c, nz, jnp.asarray(t, jnp.int32))
    # 2-arg form for _pipeline_time (fixed k: the window clamps at the tail,
    # the retarget still executes every step)
    vstep2 = lambda c, nz: vstep_k(c, nz, _kc)
    carry = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    noise = jnp.asarray(rng.standard_normal((T, B, n)), dtype)
    for t in range(T - 1):
        carry, out = vstep(carry, noise[t], t)
    jax.block_until_ready(carry)
    x0s, _Xs, Us, duals = carry
    k = jnp.full((B,), T - 1)
    Xs = jax.jit(jax.vmap(pm.dynamics.rollout))(x0s, Us)
    reg = jnp.zeros((B,), dtype)

    res = {}
    with jax.default_matmul_precision("highest"):
        # full warm step: carry-chained pipelined timing (bench.py pattern)
        noise2 = jnp.asarray(rng.standard_normal((REPEATS, B, n)), dtype)
        res["full_mpc_step"] = _pipeline_time(
            vstep2, carry, noise2, "full MPC step")

        # one full iLQR iteration = expansion+backward + ladder + cost evals
        # (problem data stays UNBATCHED/closed-over like the solver does —
        # batching it would disable the custom_vmap Pallas dispatch)
        alphas_t = tuple(0.5 ** i for i in range(4))

        def one_iter(eps):
            def single(X, U, d, rg):
                lams = tuple(dd.lam for dd in d)
                rhos = tuple(dd.rho for dd in d)
                K, dff, dV1, dV2 = S.expand_backward(
                    pm.cost, pm.dynamics.A, pm.dynamics.B, pm.constraints,
                    X, U, lams, rhos, rg)
                dyn = pm.dynamics
                Xts, Uts = S._ls_rollouts_fn(alphas_t)(
                    dyn.A, dyn.B, dyn.d, X, U, K, dff)
                Jts = jax.vmap(
                    lambda Xt, Ut: S.total_al_cost(pm, d, Xt, Ut))(Xts, Uts)
                return jnp.mean(Jts)
            return jnp.mean(jax.vmap(single)(Xs + eps, Us, duals, reg))

        res["one_ilqr_iteration"] = _chain_time(one_iter,
                                                "one iLQR iteration")

        # fused expansion+backward (the solver's actual boundary)
        def eb(eps):
            def single(X, U, d, rg):
                lams = tuple(dd.lam for dd in d)
                rhos = tuple(dd.rho for dd in d)
                K, dff, dV1, dV2 = S.expand_backward(
                    pm.cost, pm.dynamics.A, pm.dynamics.B, pm.constraints,
                    X, U, lams, rhos, rg)
                return jnp.mean(dff)
            return jnp.mean(jax.vmap(single)(Xs + eps, Us, duals, reg))

        res["expansion_plus_backward"] = _chain_time(
            eb, "AL expansion + backward (Pallas)")

        # expansion alone (XLA side)
        def expand_scalar(eps):
            out = jax.vmap(lambda X, U, d: S.al_expansion(pm, d, X, U))(
                Xs + eps, Us, duals)
            return jnp.mean(out[0])

        res["al_expansion_only"] = _chain_time(expand_scalar,
                                               "AL expansion (XLA)")

        # backward pass alone from precomputed expansions
        exp = jax.jit(lambda: jax.vmap(
            lambda X, U, d: S.al_expansion(pm, d, X, U))(Xs, Us, duals))()
        A_b = jnp.broadcast_to(pm.dynamics.A, (B,) + pm.dynamics.A.shape)
        B_b = jnp.broadcast_to(pm.dynamics.B, (B,) + pm.dynamics.B.shape)
        lx, lu, lxx, luu, lux = exp

        def bwd_scalar(eps):
            K, dff, dV1, dV2 = jax.vmap(S.backward_pass)(
                A_b, B_b, lx + eps, lu, lxx, luu, lux, reg)
            return jnp.mean(dff)

        res["backward_only"] = _chain_time(bwd_scalar,
                                           "backward pass (Pallas)")

        K, dff, _, _ = jax.jit(lambda: jax.vmap(S.backward_pass)(
            A_b, B_b, lx, lu, lxx, luu, lux, reg))()

        # ladder rollouts alone
        def ladder_scalar(eps):
            dyn = pm.dynamics
            Xts, Uts = jax.vmap(
                lambda X, U, Kk, dk: S._ls_rollouts_fn(alphas_t)(
                    dyn.A, dyn.B, dyn.d, X, U, Kk, dk))(
                Xs + eps, Us, K, dff)
            return jnp.mean(Uts)

        res["ladder_rollouts_only"] = _chain_time(
            ladder_scalar, "ladder rollouts (Pallas)")

        Xts, Uts = jax.jit(lambda: jax.vmap(
            lambda X, U, Kk, dk: S._ls_rollouts_fn(alphas_t)(
                pm.dynamics.A, pm.dynamics.B, pm.dynamics.d, X, U, Kk, dk))(
            Xs, Us, K, dff))()

        # AL cost evaluation of the ladder (XLA side)
        def costs_scalar(eps):
            def single(d, Xt, Ut):
                return jax.vmap(
                    lambda X, U: S.total_al_cost(pm, d, X, U))(Xt, Ut)
            return jnp.mean(jax.vmap(single)(duals, Xts + eps, Uts))

        res["ladder_al_costs_only"] = _chain_time(
            costs_scalar, "ladder AL cost evals (XLA)")

    return res


def run_overhead(B=1024, T=5):
    """Split the per-STEP fixed overhead (the slope fit's intercept) into
    its candidate components, each timed in isolation at flagship shapes:

      - init open-loop rollout (vmapped scan; runs once per solve)
      - J0 AL-cost evaluation (once per AL round)
      - max_violation + dual update (once per AL round)
      - tracking retarget + window slice + warm-start shifts (MPC step prep)
    """
    import altro_tpu as at
    from altro_tpu import costs as C
    from altro_tpu.mpc import make_mpc_step, shift_fill, track_window
    from altro_tpu.models import random_linear as rl
    from altro_tpu.solver import altro as S
    from altro_tpu.cones import project_polar
    from altro_tpu.constraints import DualState

    dtype = jnp.float32
    rng = np.random.default_rng(1)
    N_mpc, n, m = 30, 12, 6
    N_track = N_mpc + T + 2
    prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    pm = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)
    opts = at.SolverOptions(
        cost_tolerance=1e-4, gradient_tolerance=1e-4,
        constraint_tolerance=1e-4, penalty_initial=1e3,
        penalty_scaling=100.0, reset_duals=False, iterations_linesearch=4)

    step, init_carry = make_mpc_step(pm, opts, X_track, U_track,
                                     shared_k=True)
    vstep_k = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
    _kc = jnp.asarray(0, jnp.int32)
    vstep = lambda c, nz, t=0: vstep_k(c, nz, jnp.asarray(t, jnp.int32))
    # 2-arg form for _pipeline_time (fixed k: the window clamps at the tail,
    # the retarget still executes every step)
    vstep2 = lambda c, nz: vstep_k(c, nz, _kc)
    carry = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    noise = jnp.asarray(rng.standard_normal((T, B, n)), dtype)
    for t in range(T - 1):
        carry, out = vstep(carry, noise[t], t)
    jax.block_until_ready(carry)
    x0s, _Xs, Us, duals = carry
    k = jnp.full((B,), T - 1)
    Xs = jax.jit(jax.vmap(pm.dynamics.rollout))(x0s, Us)

    res = {}
    with jax.default_matmul_precision("highest"):
        def init_rollout(eps):
            # what the solver actually runs: the L=1 ladder kernel with
            # K = 0, d = 0 (solver/altro.py warm-start rollout)
            dyn = pm.dynamics
            Nn, nn, mm = pm.N, pm.n, pm.m

            def single(x0, U):
                Xb0 = jnp.zeros((Nn, nn), x0.dtype).at[0].set(x0)
                Xts, _ = S._ls_rollouts_fn((1.0,))(
                    dyn.A, dyn.B, dyn.d, Xb0, U,
                    jnp.zeros((Nn - 1, mm, nn), x0.dtype),
                    jnp.zeros((Nn - 1, mm), x0.dtype))
                return Xts[0]

            X = jax.vmap(single)(x0s + eps, Us)
            return jnp.mean(X)

        res["init_rollout"] = _chain_time(init_rollout,
                                          "init open-loop rollout (ladder L=1)")

        def final_stats(eps):
            out = jax.vmap(lambda X, U: pm.cost.total(X, U))(Xs + eps, Us)
            return jnp.mean(out)

        res["final_true_cost"] = _chain_time(final_stats,
                                             "final true-cost eval (stats)")

        def j0(eps):
            return jnp.mean(jax.vmap(
                lambda X, U, d: S.total_al_cost(pm, d, X, U))(
                Xs + eps, Us, duals))

        res["j0_al_cost"] = _chain_time(j0, "J0 AL cost eval")

        def viol_dual(eps):
            def single(X, U, d):
                violn = pm.max_violation(X, U)
                new = []
                for con, dual in zip(pm.constraints, d):
                    c = con.evaluate(X, U)
                    z = dual.lam + dual.rho[:, None] * c
                    lam = project_polar(con.cone, z) * con.mask[:, None]
                    new.append(DualState(lam=lam, rho=dual.rho))
                return violn + sum(jnp.mean(nd.lam) for nd in new)

            return jnp.mean(jax.vmap(single)(Xs + eps, Us, duals))

        res["viol_dual_update"] = _chain_time(
            viol_dual, "max_violation + dual update")

        def prep(eps):
            def single(x0, U, kk):
                x_prop = pm.dynamics.step(x0, U[0], 0)
                Xw, Uw = track_window(X_track, U_track, kk + 1, N_mpc)
                cost_new = C.retarget_tracking(pm.cost, Xw, Uw)
                U_ws = shift_fill(U)
                return (jnp.mean(cost_new.q) + jnp.mean(U_ws)
                        + jnp.mean(x_prop))

            return jnp.mean(jax.vmap(single)(x0s + eps, Us, k))

        res["step_prep_retarget_shift"] = _chain_time(
            prep, "retarget + window + shifts")
    return res


def run_slope(B=1024, T=5):
    """In-context cost split: time the full batched warm step with FORCED
    inner-iteration counts (tolerances zeroed so the loop runs exactly
    iterations_inner times, one AL round). The slope over iterations is the
    true in-context per-iteration cost; the intercept is the per-step
    overhead (init rollout, warm-start shifts, AL bookkeeping) — numbers
    isolated segments cannot give (jit-boundary layouts differ)."""
    import altro_tpu as at
    from altro_tpu.mpc import make_mpc_step
    from altro_tpu.models import random_linear as rl

    dtype = jnp.float32
    rng = np.random.default_rng(1)
    N_mpc, n, m = 30, 12, 6
    N_track = N_mpc + T + 2 + REPEATS
    prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    pm = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)

    out = {}
    for iters in (1, 2, 3, 4):
        opts = at.SolverOptions(
            cost_tolerance=0.0, gradient_tolerance=0.0,
            constraint_tolerance=1e-4, penalty_initial=1e3,
            penalty_scaling=100.0, reset_duals=False,
            iterations_linesearch=4, iterations_inner=iters,
            iterations_outer=1)
        step, init_carry = make_mpc_step(pm, opts, X_track, U_track,
                                         shared_k=True)
        vstep_k = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
        _kc = jnp.asarray(0, jnp.int32)
        vstep = lambda c, nz: vstep_k(c, nz, _kc)
        carry = jax.block_until_ready(
            jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
        noise = jnp.asarray(rng.standard_normal((REPEATS, B, n)), dtype)
        out[f"step_ms_inner{iters}"] = _pipeline_time(
            vstep, carry, noise, f"step @ {iters} forced iLQR iters")
    xs = np.array([1, 2, 3, 4], np.float64)
    ys = np.array([out[f"step_ms_inner{i}"] for i in (1, 2, 3, 4)])
    slope, intercept = np.polyfit(xs, ys, 1)
    out["per_iteration_ms"] = round(float(slope), 4)
    out["per_step_overhead_ms"] = round(float(intercept), 4)
    print(f"  in-context: {slope:.3f} ms/iteration + "
          f"{intercept:.3f} ms/step overhead", flush=True)
    return out


def run_slope_solver(B=1024):
    """Same forced-iteration slope fit as :func:`run_slope` but on the BARE
    solver (fixed problem, no MPC-step prep: no x0 propagation, window
    retarget, shifts, or result assembly). intercept(run_slope) -
    intercept(run_slope_solver) = the true in-context cost of the MPC step
    wrapper; the solver intercept itself is init-rollout + duals init +
    while-loop entry/exit + stats."""
    import altro_tpu as at
    from altro_tpu.mpc import make_mpc_step
    from altro_tpu.models import random_linear as rl

    dtype = jnp.float32
    rng = np.random.default_rng(1)
    N_mpc, n, m = 30, 12, 6
    N_track = N_mpc + 7
    prob = rl.gen_random_linear(rng, n, m, N_track, dtype=dtype)
    X_track, U_track = rl.gen_trajectory(rng, prob, N_track)
    pm = rl.gen_tracking_mpc(prob, X_track, U_track, N_mpc)

    # representative warm state
    opts_w = at.SolverOptions(
        cost_tolerance=1e-4, gradient_tolerance=1e-4,
        constraint_tolerance=1e-4, penalty_initial=1e3,
        penalty_scaling=100.0, reset_duals=False, iterations_linesearch=4)
    step, init_carry = make_mpc_step(pm, opts_w, X_track, U_track)
    carry = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    x0s, _Xs, Us, duals, _ = carry

    out = {}
    for iters in (1, 2, 3, 4):
        opts = opts_w.replace(cost_tolerance=0.0, gradient_tolerance=0.0,
                              iterations_inner=iters, iterations_outer=1)

        def solve_only(x0, U, d):
            sol = at.solve(pm.replace(x0=x0), opts, U0=U, duals=d)
            return sol.U, sol.duals, sol.stats.iterations

        vsolve = jax.jit(jax.vmap(solve_only))
        jax.block_until_ready(vsolve(x0s, Us, duals))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            ures = None
            for _ in range(REPEATS // 10):
                ures = vsolve(x0s, Us, duals)
            jax.block_until_ready(ures)
            times.append((time.perf_counter() - t0) / (REPEATS // 10) * 1e3)
        med = float(np.median(times))
        out[f"solver_ms_inner{iters}"] = med
        print(f"  bare solve @ {iters} forced iters          {med:8.3f} ms",
              flush=True)
    xs = np.array([1, 2, 3, 4], np.float64)
    ys = np.array([out[f"solver_ms_inner{i}"] for i in (1, 2, 3, 4)])
    slope, intercept = np.polyfit(xs, ys, 1)
    out["solver_per_iteration_ms"] = round(float(slope), 4)
    out["solver_overhead_ms"] = round(float(intercept), 4)
    print(f"  bare solver: {slope:.3f} ms/iteration + "
          f"{intercept:.3f} ms/solve overhead", flush=True)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="results_tpu")
    p.add_argument("--batch", type=int, default=1024)
    args = p.parse_args()
    res = run(B=args.batch)
    res.update(run_overhead(B=args.batch))
    res = {k: round(v, 4) for k, v in res.items()}
    res.update(run_slope(B=args.batch))
    res.update(run_slope_solver(B=args.batch))
    res["batch"] = args.batch
    res["device"] = str(jax.devices()[0])
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "attribution.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
