"""Batched-TPU throughput for the CONIC (SOC) benchmarks.

The flagship bench.py measures the random-linear QP config; ALTRO-C's
subject is SOC-constrained MPC (rocket thrust/angle/glideslope cones,
rocket_landing_problem.jl:119-167; grasp time-varying friction cones,
grasp_problem.jl:60-95). This driver applies the same methodology — a
jitted vmapped warm-started MPC step, host-driven with pipelined dispatch —
to those two conic configs at B scenarios in f32 and reports
solves/s/chip + success + max violation.

Note on kernels: the SOC augmented-Lagrangian expansion carries dense
[N, p, p] projection-Jacobian curvature and runs XLA-side — the Pallas
fused backward/rollout kernels only engage for ZERO/NONPOS cones
(ops/riccati_fused.fused_supported), so these numbers bound what a
lane-packed SOC expansion kernel could improve.

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


def rocket_batched(B: int = 1024, T: int = 30, N_mpc: int = 21,
                   opts_override: dict = None, compact_cap: int = 0,
                   compact_block: int = 128, compact_levels: tuple = ()):
    """Rocket soft-landing SOC MPC (max-thrust + thrust-angle + glideslope
    cones; reference MPC config run_simple_rocket.jl:118-132), batched over
    scenarios differing in process noise (wp=1e-3, wv=1e-2)."""
    import altro_tpu as at
    from altro_tpu.models import rocket
    from altro_tpu.mpc import gen_tracking_mpc, make_mpc_step

    dtype = jnp.float32
    N = 301
    prob = rocket.rocket_problem(N=N, tf=(N - 1) * 0.05, dtype=dtype)
    cold_opts = at.SolverOptions(
        cost_tolerance=1e-5, gradient_tolerance=1e-6,
        constraint_tolerance=1e-4, penalty_initial=1e-2,
        penalty_scaling=500.0, iterations_outer=40, iterations_inner=100)
    print("  cold solve (N=301, f32)...", flush=True)
    cold = jax.jit(at.solve)(prob, cold_opts, U0=rocket.hover_controls(prob))
    jax.block_until_ready(cold.X)
    print(f"  cold: status={int(cold.stats.status)} "
          f"viol={float(cold.stats.viol):.2e}", flush=True)

    prob_mpc = gen_tracking_mpc(prob, cold.X, cold.U, N_mpc, dt=0.05)
    # warm-solve tuning (measured on TPU, B=1024: penalty_initial=1e3 /
    # scaling=10 / reset each solve took 20.5 mean iters -> 8.3k solves/s;
    # carrying converged penalties across solves with a taller initial cuts
    # the WORST-lane iteration count — wall time follows the batch max —
    # and lands 11.6k solves/s; see tools/exp_conic_tune.py)
    okw = dict(
        cost_tolerance=1e-4, gradient_tolerance=1e-6,
        constraint_tolerance=1e-4, penalty_initial=1e4,
        penalty_scaling=10.0, reset_duals=False, reset_penalties=False,
        iterations_outer=10, early_exact_tol=1e-3)
    okw.update(opts_override or {})
    opts = at.SolverOptions(**okw)

    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((T, B, 6)), dtype)
    step, init_carry = make_mpc_step(
        prob_mpc, opts, cold.X, cold.U,
        noise_model=rocket.rocket_noise_model(), shared_k=True)
    batch_step = None
    if compact_cap:
        from altro_tpu.mpc import make_mpc_step_device_compacted
        batch_step, init_carry = make_mpc_step_device_compacted(
            prob_mpc, opts, cold.X, cold.U,
            noise_model=rocket.rocket_noise_model(), it_cap=compact_cap,
            block=compact_block, levels=compact_levels)
    res = _throughput(step, init_carry, noise, "rocket_soc_mpc_N21",
                      batch_step=batch_step)
    res["cold_status"] = int(cold.stats.status)
    if compact_cap:
        res["compact_it_cap"] = compact_cap
        res["compact_levels"] = list(map(list, compact_levels))
    return res


def grasp_batched(B: int = 1024, T: int = 15, N_mpc: int = 21,
                  compact_cap: int = 0, compact_block: int = 128,
                  compact_levels: tuple = ()):
    """Grasp time-varying-SOC MPC (rotating contact frames: torque-balance
    equality + max-force + 2 friction cones per knot, refreshed per step
    without re-jit; grasp_benchmark.jl config), batched over noise."""
    import altro_tpu as at
    from altro_tpu.models import grasp
    from altro_tpu.mpc import gen_tracking_mpc, make_mpc_step

    dtype = jnp.float32
    N, tf = 61, 6.0
    o = grasp.make_grasp_object(N, tf, dtype=dtype)
    prob = grasp.grasp_problem(o, N, tf, dtype=dtype)
    cold_opts = at.SolverOptions(
        cost_tolerance=1e-5, gradient_tolerance=1e-6,
        constraint_tolerance=1e-5, penalty_initial=10.0,
        penalty_scaling=10.0, iterations_outer=30, iterations_inner=50)
    print("  cold solve (N=61, f32)...", flush=True)
    cold = jax.jit(at.solve)(prob, cold_opts,
                             U0=grasp.hover_controls(o, N, dtype=dtype))
    jax.block_until_ready(cold.X)
    print(f"  cold: status={int(cold.stats.status)} "
          f"viol={float(cold.stats.viol):.2e}", flush=True)

    prob_mpc = gen_tracking_mpc(prob, cold.X, cold.U, N_mpc, Qk=1e3,
                                Rk=1.0, Qfk=10.0, dt=tf / (N - 1))
    prob_mpc = prob_mpc.replace(
        constraints=grasp.grasp_constraints(o, N_mpc, 0, dtype=dtype))
    opts = at.SolverOptions(
        cost_tolerance=1e-4, constraint_tolerance=1e-4,
        penalty_initial=1e4, penalty_scaling=100.0, reset_duals=False,
        early_exact_tol=1e-3)

    rng = np.random.default_rng(0)
    noise = jnp.asarray(rng.standard_normal((T, B, 6)), dtype)
    fn = lambda k: grasp.grasp_constraints(o, N_mpc, k, dtype=dtype)
    step, init_carry = make_mpc_step(prob_mpc, opts, cold.X, cold.U,
                                     constraints_fn=fn, shared_k=True)
    batch_step = None
    if compact_cap:
        from altro_tpu.mpc import make_mpc_step_device_compacted
        batch_step, init_carry = make_mpc_step_device_compacted(
            prob_mpc, opts, cold.X, cold.U, constraints_fn=fn,
            it_cap=compact_cap, block=compact_block, levels=compact_levels)
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
    # default ON: measured sweet spot on TPU v5e B=1024 — rocket
    # 10.6k -> 22.6k, grasp 12.2k -> 23.3k solves/s at cap=24/block=256
    # (identical per-lane results; caps 16/32/40 and the host-sync variant
    # all measured worse). 0 restores the plain vmapped step.
    p.add_argument("--compact-cap", type=int,
                   default=int(os.environ.get("BENCH_COMPACT_CAP", 24)),
                   help="it_cap for device-side straggler compaction "
                        "(0 = plain vmapped step)")
    p.add_argument("--compact-block", type=int,
                   default=int(os.environ.get("BENCH_COMPACT_BLOCK", 256)),
                   help="compaction block size (multiple of 128)")
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
        res = dict(rocket_batched(B=args.batch,
                                  compact_cap=args.compact_cap,
                                  compact_block=args.compact_block,
                                  compact_levels=levels), **meta)
        with open(os.path.join(args.out, "rocket_batched.json"), "w") as f:
            json.dump(res, f, indent=1)
    if args.which in ("all", "grasp"):
        print("== grasp_batched", flush=True)
        res = dict(grasp_batched(B=args.batch,
                                 compact_cap=args.compact_cap,
                                 compact_block=args.compact_block,
                                 compact_levels=levels), **meta)
        with open(os.path.join(args.out, "grasp_batched.json"), "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
