"""Conic warm-solve schedule sweeps: throughput AND solution quality.

The round-3 experiment harness behind the shipped rocket/grasp bench
configs (bench/batched_conic.rocket_setup / grasp_setup). Throughput alone
is a trap for warm-started AL MPC: carrying converged penalties verbatim
(round 2's rocket config) was 2.5x faster than any reset schedule but
LOCKED the solution to the warm start — stale rho up to 1e8 makes the
shifted warm start "converged" after one exact Newton step, max control
error ~5 / cost +46% vs the true optimum. This tool measures both axes:

phase1 (TPU): for each named config, run the batched warm MPC (B lanes,
    T steps, plain vmapped step) and record throughput + iteration stats +
    a lane sample of the final-step controls.
phase2 (CPU f64): re-solve the sampled instances at 1e-7 and report
    max/mean control error and cost gap vs the truth.

Findings (TPU v5e, B=1024, committed configs marked *):
  rocket (T=10):
    carry pi1e4          36.4k solves/s   err 5.31   gap 1.38
    reset pi1e3 s10      23.3k            err 1.10   gap 0.42
  * reset pi1e2 s10      21.0k            err 0.47   gap 6.0e-3
    decay(0.1..0.01)     20-24k           err 1.7-3.4 (dominated)
    reset s30/s100       19-25k           err 2-86   (fast scaling loses)
    + iterations_outer=15 (at 10, 1 lane/10k ends mid-recovery from a
      high-rho f32 transient as a NaN-viol divergence; the same lane
      converges in 9 rounds on CPU f32)
    + compaction cap16/b256 + (16,128) level -> 41.1k solves/s
  grasp (T=8):
    pi1e4 s100 (round 2) 10.0k            err 0.90   gap 1.92
  * pi1e3 s10            32.3k            err 5.0e-3 gap 4.6e-5
    (the tall grasp tail — lane-max 87.6 vs 23.8 — was mostly the
     penalty schedule, and the schedule also set the suboptimality)

Run: python -m tools.exp_conic_quality [--family rocket|grasp] on TPU;
it re-execs phase2 with a scrubbed CPU env.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

B, SAMPLE = 1024, 8

CONFIGS = dict(
    rocket=dict(
        T=10,
        seed=1,
        configs={
            "ship": None,
            "carry_pi1e4": dict(reset_penalties=False, penalty_initial=1e4,
                                iterations_outer=10),
            "reset_pi1e3_s10": dict(penalty_initial=1e3),
            "reset_pi1e2_s100": dict(penalty_initial=1e2,
                                     penalty_scaling=100.0),
        }),
    grasp=dict(
        T=8,
        seed=0,
        configs={
            "ship": None,
            "pi1e4_s100": dict(penalty_initial=1e4, penalty_scaling=100.0),
            "pi1e2_s100": dict(penalty_initial=1e2, penalty_scaling=100.0),
        }),
)


def _setup(family, dtype, opts_override=None, track=None):
    from altro_tpu.bench import batched_conic
    fn = dict(rocket=batched_conic.rocket_setup,
              grasp=batched_conic.grasp_setup)[family]
    return fn(dtype, opts_override=opts_override, track=track)


def phase1(family, out_npz):
    import jax
    import jax.numpy as jnp
    from altro_tpu.mpc import make_mpc_step

    spec = CONFIGS[family]
    T = spec["T"]
    save = dict(k=T)
    track = None
    for name, ov in spec["configs"].items():
        su = _setup(family, jnp.float32, opts_override=ov, track=track)
        track = (su["X_track"], su["U_track"])
        kw = {}
        if su["noise_model"] is not None:
            kw["noise_model"] = su["noise_model"]
        if su["constraints_fn"] is not None:
            kw["constraints_fn"] = su["constraints_fn"]
        step, init_carry = make_mpc_step(
            su["prob_mpc"], su["opts"], su["X_track"], su["U_track"],
            shared_k=True, **kw)
        vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
        rng = np.random.default_rng(spec["seed"])
        noise = jnp.asarray(rng.standard_normal((T, B, su["noise_dim"])),
                            jnp.float32)
        carry = jax.block_until_ready(
            jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
        carry, out = vstep(carry, noise[0], jnp.asarray(0, jnp.int32))
        jax.block_until_ready(carry)
        carry = jax.block_until_ready(
            jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
        t0 = time.perf_counter()
        stats = []
        for t in range(T):
            carry, out = vstep(carry, noise[t], jnp.asarray(t, jnp.int32))
            stats.append((out.status, out.viol, out.iters))
        jax.block_until_ready(carry)
        dt = time.perf_counter() - t0
        st = np.concatenate([np.asarray(s[0]) for s in stats])
        vl = np.concatenate([np.asarray(s[1]) for s in stats])
        it = np.stack([np.asarray(s[2]) for s in stats])
        idx = np.linspace(0, B - 1, SAMPLE).astype(int)
        print(f"== {name}: {B*T/dt:.0f} solves/s success {st.mean():.4f} "
              f"viol {np.nanmax(vl):.1e} nan_viol {int(np.isnan(vl).sum())} "
              f"iters {it.mean():.1f} mean / "
              f"{it.max(axis=1).mean():.1f} lane-max", flush=True)
        save[f"{name}_x0"] = np.asarray(out.x0)[idx]
        save[f"{name}_U"] = np.asarray(out.U)[idx]
    save["Xtrack"] = np.asarray(track[0])
    save["Utrack"] = np.asarray(track[1])
    np.savez(out_npz, **save)


def phase2(family, in_npz):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import altro_tpu as at
    from altro_tpu.costs import retarget_tracking
    from altro_tpu.mpc import track_window

    data = np.load(in_npz)
    k = int(data["k"])
    track = (jnp.asarray(data["Xtrack"], jnp.float64),
             jnp.asarray(data["Utrack"], jnp.float64))
    su = _setup(family, jnp.float64, track=track)
    prob_mpc = su["prob_mpc"]
    Xw, Uw = track_window(track[0], track[1], k, prob_mpc.N)
    prob_base = prob_mpc.replace(
        cost=retarget_tracking(prob_mpc.cost, Xw, Uw))
    if su["constraints_fn"] is not None:
        prob_base = prob_base.replace(constraints=su["constraints_fn"](k))
    opts_truth = at.SolverOptions(
        cost_tolerance=1e-7, gradient_tolerance=1e-9,
        constraint_tolerance=1e-7, penalty_initial=1e3,
        penalty_scaling=10.0, iterations_outer=40, iterations_inner=100)

    def solve_truth(x0, U0):
        sol = at.solve(prob_base.replace(x0=x0), opts_truth, U0=U0)
        return sol.U, sol.stats.status

    jt = jax.jit(solve_truth)

    def cost(x0, U):
        X = prob_base.dynamics.rollout(x0, U)
        return float(prob_base.cost.total(X, U))

    for name in CONFIGS[family]["configs"]:
        x0s, U_t = data[f"{name}_x0"], data[f"{name}_U"]
        errs, gaps = [], []
        for i in range(x0s.shape[0]):
            x0 = jnp.asarray(x0s[i], jnp.float64)
            U64, _ = jt(x0, jnp.asarray(U_t[i], jnp.float64))
            errs.append(float(np.max(np.abs(U_t[i] - np.asarray(U64)))))
            gaps.append(cost(x0, jnp.asarray(U_t[i], jnp.float64))
                        - cost(x0, U64))
        print(f"{name}: err_U max {max(errs):.3e} mean {np.mean(errs):.3e}"
              f" cost_gap max {max(gaps):.3e}", flush=True)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="rocket",
                   choices=list(CONFIGS.keys()))
    p.add_argument("--phase", default="all",
                   choices=["all", "phase1", "phase2"])
    p.add_argument("--npz", default="")
    args = p.parse_args()
    npz = args.npz or f"/tmp/conic_quality_{args.family}.npz"
    if args.phase in ("all", "phase1"):
        phase1(args.family, npz)
    if args.phase == "phase2":
        phase2(args.family, npz)
    elif args.phase == "all":
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run(
            [sys.executable, "-m", "tools.exp_conic_quality", "--phase",
             "phase2", "--family", args.family, "--npz", npz],
            check=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


if __name__ == "__main__":
    main()
