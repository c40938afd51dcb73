"""Batched-TPU throughput for the CONIC (SOC) benchmarks.

The flagship bench.py measures the random-linear QP config; ALTRO-C's
subject is SOC-constrained MPC (rocket thrust/angle/glideslope cones,
rocket_landing_problem.jl:119-167; grasp time-varying friction cones,
grasp_problem.jl:60-95). This driver applies the same methodology — a
jitted vmapped warm-started MPC step, host-driven with pipelined dispatch —
to those two conic configs at B scenarios in f32 and reports
solves/s/chip + success + max violation.

Note on kernels (round 4): the SOC augmented-Lagrangian expansion now
runs INSIDE the fused Pallas expansion+backward kernel (branchless
three-case polar projection + diag/rank-2 curvature,
ops/riccati_fused.py) — measured 1.42x on the plain rocket warm step
(results_tpu/fused_soc_check.json); ALTRO_TPU_FUSED=0 restores the
XLA-side expansion.

Run on TPU: ``python -m altro_tpu.bench.batched_conic [--out results_tpu]``.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp


def _throughput(step, init_carry, noise, label, batch_step=None):
    """bench.py methodology: compile, pipelined throughput pass, fenced
    latency pass. Pass ``batch_step`` (a whole-batch step function, e.g.
    from mpc.make_mpc_step_device_compacted) to run it INSTEAD of the
    vmapped per-lane ``step`` — the throughput/latency passes then measure
    the device-side straggler-compacted program."""
    B = noise.shape[1]
    T = noise.shape[0]
    if batch_step is not None:
        vstep = jax.jit(batch_step)
    else:
        vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
    ks = [jnp.asarray(t, jnp.int32) for t in range(T)]
    carry0 = jax.block_until_ready(
        jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
    t0 = time.perf_counter()
    carry, out = vstep(carry0, noise[0], ks[0])
    jax.block_until_ready(carry)
    compile_s = time.perf_counter() - t0

    carry = carry0
    statuses, viols, iters = [], [], []
    t0 = time.perf_counter()
    for t in range(T):
        carry, out = vstep(carry, noise[t], ks[t])
        statuses.append(out.status)
        viols.append(out.viol)
        iters.append(out.iters)
    jax.block_until_ready(carry)
    dt = time.perf_counter() - t0

    step_ms = []
    carry_l = carry0
    for t in range(min(T, 10)):
        ts = time.perf_counter()
        carry_l, out_l = vstep(carry_l, noise[t], ks[t])
        jax.block_until_ready(out_l.status)
        step_ms.append((time.perf_counter() - ts) * 1e3)

    solves = B * T
    res = dict(
        label=label,
        batch=B, steps=T,
        solves_per_s=round(solves / dt, 1),
        success_rate=float(jnp.mean(jnp.stack(statuses).astype(jnp.float32))),
        max_viol=float(jnp.max(jnp.stack(viols))),
        mean_iters=float(jnp.mean(jnp.stack(iters).astype(jnp.float32))),
        # the batched while-loop runs to the SLOWEST lane: the per-step
        # lane-max (and its mean over steps) is the number wall time
        # actually follows, not the lane mean
        iters_max=int(jnp.max(jnp.stack(iters))),
        iters_max_per_step_mean=float(jnp.mean(jnp.stack(
            [jnp.max(i) for i in iters]).astype(jnp.float32))),
        iters_p50=float(np.percentile(np.asarray(jnp.stack(iters)), 50)),
        iters_p90=float(np.percentile(np.asarray(jnp.stack(iters)), 90)),
        iters_p95=float(np.percentile(np.asarray(jnp.stack(iters)), 95)),
        iters_p99=float(np.percentile(
            np.asarray(jnp.stack(iters)), 99)),
        wall_s=round(dt, 4),
        compile_s=round(compile_s, 1),
        step_ms_p50=float(np.percentile(step_ms, 50)),
        step_ms_p99=float(np.percentile(step_ms, 99)),
    )
    print(f"  {label}: {res['solves_per_s']:.0f} solves/s "
          f"(B={B}, success {res['success_rate']:.4f}, "
          f"max_viol {res['max_viol']:.2e}, iters {res['mean_iters']:.2f} "
          f"mean / {res['iters_max_per_step_mean']:.1f} lane-max "
          f"/ {res['iters_max']} max)",
          flush=True)
    return res


def rocket_setup(dtype=None, N_mpc: int = 21, opts_override: dict = None,
                 track=None, warm_start: str = "track"):
    """Shared rocket MPC-bench construction (problem, warm-solve options,
    tracking reference) used by both :func:`rocket_batched` and the conic
    agreement artifact (bench/agreement_conic.py) so the two always measure
    the IDENTICAL configuration. ``track=(X, U)`` skips the cold solve and
    tracks the given trajectory (agreement phase2 re-uses phase1's f32 cold
    reference so f32-TPU and f64-CPU solve the same window targets)."""
    import altro_tpu as at
    from altro_tpu.models import rocket
    from altro_tpu.mpc import gen_tracking_mpc

    dtype = dtype or jnp.float32
    N = 301
    prob = rocket.rocket_problem(N=N, tf=(N - 1) * 0.05, dtype=dtype)
    cold_status = None
    if track is None:
        cold_opts = at.SolverOptions(
            cost_tolerance=1e-5, gradient_tolerance=1e-6,
            constraint_tolerance=1e-4, penalty_initial=1e-2,
            penalty_scaling=500.0, iterations_outer=40,
            iterations_inner=100)
        print(f"  cold solve (N=301, {jnp.dtype(dtype).name})...",
              flush=True)
        cold = jax.jit(at.solve)(prob, cold_opts,
                                 U0=rocket.hover_controls(prob))
        jax.block_until_ready(cold.X)
        cold_status = int(cold.stats.status)
        print(f"  cold: status={cold_status} "
              f"viol={float(cold.stats.viol):.2e}", flush=True)
        track = (cold.X, cold.U)
    X_track, U_track = track

    prob_mpc = gen_tracking_mpc(prob, X_track, U_track, N_mpc, dt=0.05)
    # Warm-solve tuning (measured on TPU, B=1024):
    # - iterations_inner=8 + reg_min=1.0 kill the straggler tail at its
    #   source (tools/exp_inner_cap.py): the old tail lanes spent a full
    #   50-iteration inner phase chattering across the SOC projection kink
    #   with the violation already ~1e-4, plus ~8 iterations re-climbing
    #   regularization from 1e-8 after a rejection. Inexact inner solves
    #   + a floor that makes the first rejection jump straight to working
    #   regularization cut the per-step lane-max from 100.8 to 26 iters.
    # - penalties RESET each solve at 1e2 (the reference's own pattern —
    #   ALTRO.jl resets; run_simple_rocket.jl:121-129 uses reset @ 1e3).
    #   Round 2 carried converged penalties (reset_penalties=False,
    #   penalty_initial=1e4), which is 2.5x faster (mean 1.2 iters/solve)
    #   but LOCKS the solution to the warm start: with stale rho up to 1e8
    #   the warm start is feasible, one exact Newton step "converges", and
    #   the controls sit max-err ~5 / cost +46% from the true optimum
    #   (agreement_conic artifact; a cold f32 solve of the same instance
    #   lands 1.5e-2 from it). The reset config measures err_U 0.47 vs the
    #   1e-7 f64 truth — better than even the f64 closed loop at the
    #   reference's loose tolerance (0.73, rocket_multibaseline.json).
    # - iterations_outer=15: at 10, 1 lane in 10k ends mid-recovery from a
    #   high-rho f32 transient and records a diverged NaN violation (the
    #   same lane converges in 9 rounds bit-differently on CPU f32).
    # - cost_tolerance=1e-5 (not 1e-4): at 1e-4, ~1 lane in 8 hundred
    #   wanders through a high-rho transient to a REMOTE feasible point
    #   and declares cost-convergence there (err_U up to 87 while viol
    #   < 1e-4); 1e-5 forces it back (err max 0.33, median 3.4e-3) at
    #   unchanged throughput (21.3k vs 21.0k uncompacted).
    # iterations_linesearch=5 (round 4): the conic iteration was dominated
    # by the UNTUNED L=10 ladder (rollouts 0.289 + AL-cost evals 0.437 of
    # the 0.968 ms iteration, results_tpu/conic_attribution.json). The
    # L-sweep (tools/exp_conic_tune_r4.py, conic_tune_r4_rocket.json)
    # measures 35.5 -> 57.9 -> 66.8 -> 76.0k solves/s at L=11/5/3/2 — but
    # the MULTI-WINDOW quality gate (agreement_conic at k=4/7/10) shows
    # rocket solution quality degrading monotonically with ladder depth:
    # mean cost gap vs the f64 1e-7 truth 0.005/0.020/0.064/0.148 at
    # L=11/5/3/2 (steeper ls_decrease at small L caps the mean ~0.035 but
    # not the worst lane — /tmp sweeps mirrored in the round-4 notes).
    # The deep-ladder quality term is the rocket's high-penalty rounds
    # occasionally needing alpha ~ 0.06 steps; fewer rungs turn those into
    # rejected rounds that end at the outer cap farther from the optimum
    # (violation still < 1e-4). L=5 was the unfused sweet spot (68.3k at
    # gap mean 0.020). Under the FUSED SOC kernel the depth-quality
    # relation flattens: fused L=8 measured gap mean 0.036 at 72.9k vs
    # fused L=5's 0.039 at 92.4k — the quality limiter is the kernel's
    # f32 arithmetic on knife-edge lanes, not ladder depth — so L=5 is
    # the dominant point and ships.
    # ROUND-5 CONFIG REWRITE — tracking-seeded solves, classical inner
    # loop (the comments above document the r3/r4 configs this replaces;
    # kept for the measured history). The r5 full-batch multi-window gate
    # (all 1024 lanes x windows 2..10 vs the f64 truth) exposed what the
    # 16-lane gate missed: under the SHIFTED-control warm start, 1-3
    # knife-edge lanes per 1024 stall at feasible points up to 2.5x the
    # optimal cost — at ANY tolerance (the tight 23-iteration config
    # leaves a 0.235 lane) and regardless of the r3/r4 knobs
    # (rocket_gap_diag.json, rocket_retune_r5.json). Isolation
    # (rocket_warmtrap_r5.json): fresh duals alone do NOT fix it (max
    # 0.264); seeding from the tracking window's controls does. Shipped
    # config = warm_start="track" + fresh duals + cost_tolerance 1e-6 +
    # classical inner loop (inner 50, reg_min 1e-8, no early-exact stop):
    # 79.7k solves/s with worst-lane gap 0.088 / p99 well under 1%
    # (rocket_final_r5.json trk_fresh_ct6) — dominating the tight config
    # (52.2k, 0.235) and every shifted-seed candidate on BOTH axes. The
    # residual ~0.09 worst-lane tail is an extreme-value statistic of
    # f32 knife-edge lanes (two bit-different compiles of the same
    # algorithm move it 0.07 <-> 0.29): see RESULTS.md's conic section.
    okw = dict(
        cost_tolerance=1e-6, gradient_tolerance=1e-6,
        constraint_tolerance=1e-4, penalty_initial=1e2,
        penalty_scaling=10.0, reset_duals=True, reset_penalties=True,
        iterations_outer=15, iterations_inner=50, reg_min=1e-8,
        early_exact_tol=0.0, iterations_linesearch=5)
    okw.update(opts_override or {})
    opts = at.SolverOptions(**okw)
    from altro_tpu.models import rocket as _rocket
    return dict(prob_mpc=prob_mpc, opts=opts, X_track=X_track,
                U_track=U_track, constraints_fn=None,
                noise_model=_rocket.rocket_noise_model(), noise_dim=6,
                cold_status=cold_status, warm_start=warm_start)


def rocket_batched(B: int = 1024, T: int = 30, N_mpc: int = 21,
                   opts_override: dict = None, compact_cap: int = 0,
                   compact_block: int = 128, compact_levels: tuple = (),
                   warm_start: str = "track"):
    """Rocket soft-landing SOC MPC (max-thrust + thrust-angle + glideslope
    cones; reference MPC config run_simple_rocket.jl:118-132), batched over
    scenarios differing in process noise (wp=1e-3, wv=1e-2)."""
    from altro_tpu.mpc import make_mpc_step

    dtype = jnp.float32
    su = rocket_setup(dtype, N_mpc=N_mpc, opts_override=opts_override,
                      warm_start=warm_start)
    prob_mpc, opts = su["prob_mpc"], su["opts"]

    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((T, B, 6)), dtype)
    ws = su.get("warm_start", "shift")
    step, init_carry = make_mpc_step(
        prob_mpc, opts, su["X_track"], su["U_track"],
        noise_model=su["noise_model"], shared_k=True, warm_start=ws)
    batch_step = None
    if compact_cap:
        from altro_tpu.mpc import make_mpc_step_device_compacted
        batch_step, init_carry = make_mpc_step_device_compacted(
            prob_mpc, opts, su["X_track"], su["U_track"],
            noise_model=su["noise_model"], it_cap=compact_cap,
            block=compact_block, levels=compact_levels, warm_start=ws)
    res = _throughput(step, init_carry, noise, "rocket_soc_mpc_N21",
                      batch_step=batch_step)
    res["warm_start"] = ws
    res["cold_status"] = su["cold_status"]
    if compact_cap:
        res["compact_it_cap"] = compact_cap
        res["compact_levels"] = list(map(list, compact_levels))
    return res


def grasp_setup(dtype=None, N_mpc: int = 21, opts_override: dict = None,
                track=None):
    """Shared grasp MPC-bench construction; see :func:`rocket_setup` for
    the contract (used by grasp_batched + bench/agreement_conic.py)."""
    import altro_tpu as at
    from altro_tpu.models import grasp
    from altro_tpu.mpc import gen_tracking_mpc

    dtype = dtype or jnp.float32
    N, tf = 61, 6.0
    o = grasp.make_grasp_object(N, tf, dtype=dtype)
    prob = grasp.grasp_problem(o, N, tf, dtype=dtype)
    cold_status = None
    if track is None:
        cold_opts = at.SolverOptions(
            cost_tolerance=1e-5, gradient_tolerance=1e-6,
            constraint_tolerance=1e-5, penalty_initial=10.0,
            penalty_scaling=10.0, iterations_outer=30,
            iterations_inner=50)
        print(f"  cold solve (N=61, {jnp.dtype(dtype).name})...",
              flush=True)
        cold = jax.jit(at.solve)(prob, cold_opts,
                                 U0=grasp.hover_controls(o, N, dtype=dtype))
        jax.block_until_ready(cold.X)
        cold_status = int(cold.stats.status)
        print(f"  cold: status={cold_status} "
              f"viol={float(cold.stats.viol):.2e}", flush=True)
        track = (cold.X, cold.U)
    X_track, U_track = track

    prob_mpc = gen_tracking_mpc(prob, X_track, U_track, N_mpc, Qk=1e3,
                                Rk=1.0, Qfk=10.0, dt=tf / (N - 1))
    prob_mpc = prob_mpc.replace(
        constraints=grasp.grasp_constraints(o, N_mpc, 0, dtype=dtype))
    # penalty_initial=1e3 / scaling=10 dominates the round-2 1e4/100 on
    # BOTH axes (TPU B=1024, T=8): 32.3k vs 10.0k solves/s uncompacted
    # (per-step lane-max 23.8 vs 87.6 — the tall grasp straggler tail was
    # mostly the penalty schedule) AND err_U 5.0e-3 / cost gap 4.6e-5 vs
    # 0.90 / 1.92 against the 1e-7 f64 truth (agreement_conic pattern;
    # /tmp-sweep provenance mirrored in tools/exp_inner_cap.py docstring).
    # iterations_linesearch=2: 55.7k -> 95.9k solves/s at L=11 -> 2 with
    # mean iters 4.28 -> 4.03 (same L-sweep provenance as rocket_setup;
    # results_tpu/conic_tune_r4_grasp.json). Unlike the rocket, the grasp
    # quality gate is UNCHANGED at L=2 (multi-window gap ~2e-4 — its
    # torque-balance/friction geometry accepts the full Newton step).
    okw = dict(
        cost_tolerance=1e-4, constraint_tolerance=1e-4,
        penalty_initial=1e3, penalty_scaling=10.0, reset_duals=False,
        iterations_inner=8, reg_min=1.0, early_exact_tol=1e-3,
        iterations_linesearch=2)
    okw.update(opts_override or {})
    opts = at.SolverOptions(**okw)
    fn = lambda k: grasp.grasp_constraints(o, N_mpc, k, dtype=dtype)
    return dict(prob_mpc=prob_mpc, opts=opts, X_track=X_track,
                U_track=U_track, constraints_fn=fn, noise_model=None,
                noise_dim=6, cold_status=cold_status, warm_start="shift")


def grasp_batched(B: int = 1024, T: int = 15, N_mpc: int = 21,
                  opts_override: dict = None, compact_cap: int = 0,
                  compact_block: int = 128, compact_levels: tuple = ()):
    """Grasp time-varying-SOC MPC (rotating contact frames: torque-balance
    equality + max-force + 2 friction cones per knot, refreshed per step
    without re-jit; grasp_benchmark.jl config), batched over noise."""
    from altro_tpu.mpc import make_mpc_step

    dtype = jnp.float32
    su = grasp_setup(dtype, N_mpc=N_mpc, opts_override=opts_override)
    prob_mpc, opts, fn = su["prob_mpc"], su["opts"], su["constraints_fn"]

    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.standard_normal((T, B, 6)), dtype)
    ws = su.get("warm_start", "shift")
    step, init_carry = make_mpc_step(prob_mpc, opts, su["X_track"],
                                     su["U_track"], constraints_fn=fn,
                                     shared_k=True, warm_start=ws)
    batch_step = None
    if compact_cap:
        from altro_tpu.mpc import make_mpc_step_device_compacted
        batch_step, init_carry = make_mpc_step_device_compacted(
            prob_mpc, opts, su["X_track"], su["U_track"], constraints_fn=fn,
            it_cap=compact_cap, block=compact_block, levels=compact_levels,
            warm_start=ws)
    res = _throughput(step, init_carry, noise, "grasp_tv_soc_mpc_N21",
                      batch_step=batch_step)
    if compact_cap:
        res["compact_it_cap"] = compact_cap
        res["compact_levels"] = list(map(list, compact_levels))
    return res


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="results_tpu")
    p.add_argument("--batch", type=int,
                   default=int(os.environ.get("BENCH_BATCH", 1024)))
    p.add_argument("--which", default="all",
                   choices=["all", "rocket", "grasp"])
    # default ON (-1 = per-family measured sweet spot on TPU v5e B=1024
    # with the inner8/reg_min=1 tail fix and the accurate penalty
    # schedules): rocket cap=16/block=256 + (16,128) level (41.1k solves/s
    # at T=10; lane-max 48.5), grasp cap=8/block=256 + (8,128) level
    # (61.1k at T=8; lane-max 23.8 — caps 6/12 and single-level schedules
    # measured worse). 0 restores the plain vmapped step.
    p.add_argument("--compact-cap", type=int,
                   default=int(os.environ.get("BENCH_COMPACT_CAP", -1)),
                   help="it_cap for device-side straggler compaction "
                        "(-1 = per-family default, 0 = plain vmapped step)")
    p.add_argument("--compact-block", type=int,
                   default=int(os.environ.get("BENCH_COMPACT_BLOCK", -1)),
                   help="compaction block size (multiple of 128; "
                        "-1 = per-family default)")
    p.add_argument("--compact-levels",
                   default=os.environ.get("BENCH_COMPACT_LEVELS", ""),
                   help="extra nested compaction stages as "
                        "'cap:block,cap:block' (e.g. '24:128'); each stage "
                        "runs the current block cap more iterations, then "
                        "gathers block stragglers for the next")
    args = p.parse_args()
    os.makedirs(args.out, exist_ok=True)
    meta = dict(device=str(jax.devices()[0]), dtype="float32")
    levels = []
    for part in (s for s in args.compact_levels.split(",") if s):
        fields = part.split(":")
        if len(fields) != 2:
            p.error(f"--compact-levels entry {part!r} must be 'cap:block'")
        cap, block = int(fields[0]), int(fields[1])
        if block % 128 != 0:
            print(f"# warning: --compact-levels block {block} is not a "
                  "multiple of 128; the Pallas kernels will not dispatch "
                  "for that stage", flush=True)
        levels.append((cap, block))
    levels = tuple(levels)
    if levels and args.compact_cap == 0:
        p.error("--compact-levels requires --compact-cap > 0 "
                "(levels are ignored by the plain vmapped step)")
    if args.which in ("all", "rocket"):
        print("== rocket_batched", flush=True)
        cap = 16 if args.compact_cap == -1 else args.compact_cap
        blk = 256 if args.compact_block == -1 else args.compact_block
        lv = (((16, 128),) if (args.compact_cap == -1 and not levels)
              else levels)
        res = dict(rocket_batched(B=args.batch, compact_cap=cap,
                                  compact_block=blk,
                                  compact_levels=lv), **meta)
        with open(os.path.join(args.out, "rocket_batched.json"), "w") as f:
            json.dump(res, f, indent=1)
    if args.which in ("all", "grasp"):
        print("== grasp_batched", flush=True)
        cap = 8 if args.compact_cap == -1 else args.compact_cap
        blk = 256 if args.compact_block == -1 else args.compact_block
        lv = (((8, 128),) if (args.compact_cap == -1 and not levels)
              else levels)
        res = dict(grasp_batched(B=args.batch, compact_cap=cap,
                                 compact_block=blk,
                                 compact_levels=lv), **meta)
        with open(os.path.join(args.out, "grasp_batched.json"), "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
