"""Diagnose the batched-rocket straggler tail at its source.

results_tpu/rocket_batched.json: lane MEAN 15.4 iters/solve but per-step
lane MAX mean 100.8 — the batched while-loop runs to the slowest lane, so
wall time follows the max. Compaction (mpc.make_mpc_step_device_compacted)
treats the symptom; this tool attributes the cause:

Part A — run the rocket SOC MPC (exact bench config) and record the
  per-lane per-step iteration matrix [T, B]: are slow lanes PERSISTENT
  (carried dual/penalty state disease) or step-localized (hard instances)?
  Which MPC steps host the tail?

Part B — take the worst (step, lane) pairs, rebuild the exact warm-started
  instance, and scan the solver loop body (solver.altro.loop_fns) a fixed
  number of iterations recording per-iteration state: violation, gradient,
  rounds, regularization, penalty level, per-cone-block violation. The
  trace shows WHERE the ~100 iterations go (AL rounds not closing? line
  search stuck? one cone family oscillating?).

Run on TPU (or CPU f32): python -m tools.exp_tail_diag
"""
from __future__ import annotations

import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

import altro_tpu as at
from altro_tpu.costs import retarget_tracking
from altro_tpu.models import rocket
from altro_tpu.mpc import (_xws_corrector, gen_tracking_mpc, make_mpc_step,
                           shift_fill, track_window)
from altro_tpu.solver import altro as S

B, T, N_mpc = 1024, 30, 21
TRACE_ITERS = 120


def build():
    dtype = jnp.float32
    N = 301
    prob = rocket.rocket_problem(N=N, tf=(N - 1) * 0.05, dtype=dtype)
    cold_opts = at.SolverOptions(
        cost_tolerance=1e-5, gradient_tolerance=1e-6,
        constraint_tolerance=1e-4, penalty_initial=1e-2,
        penalty_scaling=500.0, iterations_outer=40, iterations_inner=100)
    print("cold solve...", flush=True)
    cold = jax.jit(at.solve)(prob, cold_opts, U0=rocket.hover_controls(prob))
    jax.block_until_ready(cold.X)
    pm = gen_tracking_mpc(prob, cold.X, cold.U, N_mpc, dt=0.05)
    # the shipped bench tuning (bench/batched_conic.py rocket_batched)
    opts = at.SolverOptions(
        cost_tolerance=1e-4, gradient_tolerance=1e-6,
        constraint_tolerance=1e-4, penalty_initial=1e4,
        penalty_scaling=10.0, reset_duals=False, reset_penalties=False,
        iterations_outer=10, early_exact_tol=1e-3)
    return pm, opts, cold


def part_a(pm, opts, cold, opts_label="shipped"):
    dtype = jnp.float32
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((T, B, 6)), dtype)
    step, init_carry = make_mpc_step(
        pm, opts, cold.X, cold.U,
        noise_model=rocket.rocket_noise_model(), shared_k=True)
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
    carry = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    iters = np.zeros((T, B), np.int32)
    viols = np.zeros((T, B), np.float32)
    rho_max = np.zeros((T, B), np.float32)
    carries = [jax.tree_util.tree_map(np.asarray, carry)]
    for t in range(T):
        carry, out = vstep(carry, noise[t], jnp.asarray(t, jnp.int32))
        iters[t] = np.asarray(out.iters)
        viols[t] = np.asarray(out.viol)
        rho_max[t] = np.asarray(
            jnp.max(jnp.stack([jnp.max(d.rho, axis=-1)
                               for d in carry[3]]), axis=0))
        carries.append(jax.tree_util.tree_map(np.asarray, carry))
    print(f"[{opts_label}] iters: mean {iters.mean():.1f} p50 "
          f"{np.percentile(iters, 50):.0f} p99 "
          f"{np.percentile(iters, 99):.0f} max {iters.max()}", flush=True)
    print(f"  per-step lane-max: mean {iters.max(axis=1).mean():.1f} "
          f"min {iters.max(axis=1).min()} max {iters.max(axis=1).max()}",
          flush=True)
    print("  per-step [t: max@lane p99 mean rho_max_batch]:", flush=True)
    for t in range(T):
        print(f"   t={t:2d}: max {iters[t].max():3d} @lane "
              f"{int(iters[t].argmax()):4d}  p99 "
              f"{np.percentile(iters[t], 99):5.1f}  mean "
              f"{iters[t].mean():5.1f}  rho_max {rho_max[t].max():.1e}",
          flush=True)
    # persistence: of the 16 slowest lanes at each step, how many were in
    # the slowest 16 of the previous step?
    overlaps = []
    for t in range(1, T):
        top_prev = set(np.argsort(iters[t - 1])[-16:].tolist())
        top_now = set(np.argsort(iters[t])[-16:].tolist())
        overlaps.append(len(top_prev & top_now))
    print(f"  tail persistence (slowest-16 overlap step-to-step): "
          f"mean {np.mean(overlaps):.1f}/16", flush=True)
    return iters, noise, carries


def part_b(pm, opts, cold, iters, noise, carries, n_trace=3):
    """Per-iteration trace of the worst (step, lane) instances."""
    dtype = jnp.float32
    dyn = pm.dynamics
    xws = _xws_corrector(dyn)
    nm = rocket.rocket_noise_model()

    flat = np.argsort(iters, axis=None)[::-1]
    picks = []
    for idx in flat:
        t, b = np.unravel_index(idx, iters.shape)
        if all(abs(t - t2) > 0 or b != b2 for t2, b2 in picks):
            picks.append((int(t), int(b)))
        if len(picks) >= n_trace:
            break
    # also trace a MEDIAN lane at the worst step for contrast
    t0 = picks[0][0]
    med_lane = int(np.argsort(iters[t0])[B // 2])
    picks.append((t0, med_lane))

    def trace_one(t, b):
        carry = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a[b]), carries[t])
        x0, X, U, duals = carry
        x_prop = dyn.step(x0, U[0], 0)
        x0_new = nm(x_prop, noise[t, b])
        k_new = t + 1
        Xw, Uw = track_window(cold.X, cold.U, k_new, N_mpc)
        prob_k = pm.replace(cost=retarget_tracking(pm.cost, Xw, Uw),
                            x0=x0_new)
        U_ws = shift_fill(U)
        duals_ws = tuple(d.shift() for d in duals)
        X_ws = xws(X, U_ws, x0_new)

        def run(prob_k, U_ws, duals_ws, X_ws):
            with jax.default_matmul_precision("highest"):
                s0 = S._warmstart_state(prob_k, opts, U_ws, duals_ws, X_ws)
                cond, body = S.loop_fns(prob_k, opts, s0)

                def sbody(s, _):
                    s1 = body(s)
                    Xc, Uc = s1[0], s1[1]
                    blk_viol = jnp.stack([
                        c.max_violation(Xc, Uc) for c in prob_k.constraints])
                    rec = dict(viol=s1[6], grad=s1[5], reg=s1[4],
                               rounds=s1[9], it_rd=s1[7],
                               done=s1[10].astype(jnp.int32),
                               rho=jnp.stack([jnp.max(d.rho)
                                              for d in s1[3]]),
                               blk_viol=blk_viol)
                    return s1, rec
                return jax.lax.scan(sbody, s0, None, length=TRACE_ITERS)

        sF, rec = jax.jit(run)(prob_k, U_ws, duals_ws, X_ws)
        rec = jax.tree_util.tree_map(np.asarray, rec)
        names = [c.name for c in prob_k.constraints]
        print(f"\n== trace t={t} lane={b} (recorded iters={iters[t, b]}) "
              f"cones={names}", flush=True)
        done_at = int(np.argmax(rec["done"])) if rec["done"].any() else -1
        print(f"  done at iter {done_at + 1 if done_at >= 0 else '>120'}",
              flush=True)
        for k in range(TRACE_ITERS):
            if rec["done"][k] and k > done_at + 1:
                break
            bl = " ".join(f"{v:.1e}" for v in rec["blk_viol"][k])
            print(f"   it={k + 1:3d} rd={int(rec['rounds'][k]):2d} "
                  f"viol={rec['viol'][k]:.2e} grad={rec['grad'][k]:.2e} "
                  f"reg={rec['reg'][k]:.1e} "
                  f"rho={max(rec['rho'][k]):.1e} blk=[{bl}]", flush=True)
            if rec["done"][k]:
                break
    for t, b in picks:
        trace_one(t, b)


def main():
    pm, opts, cold = build()
    iters, noise, carries = part_a(pm, opts, cold)
    part_b(pm, opts, cold, iters, noise, carries)


if __name__ == "__main__":
    main()
