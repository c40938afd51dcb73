"""Round-5 diagnosis: which knob drives the rocket bench-config's
early-window cost gap (agreement_conic.json r4: cost_rel_gap_max 1.08 at
k=4 on the shipped config vs 0.025 for the tight config on the SAME
windows — so the instances are solvable and the gap is config-induced).

Method: run the T=10-step B-lane rocket MPC chain under the shipped bench
config and single-knob variants (early-exact stop off, outer cap 30,
classical inner loop, tighter cost tolerance, deep ladder, higher penalty
init). At windows (2,4,6,8,10) save ALL lanes' (x0, U); ONE shared
cold-tight batched re-solver (agreement_conic._tight_batch_solver) scores
every instance, and the CPU phase evaluates per-lane f64 true-cost gaps.
The variant whose gap histogram collapses names the knob.

phase1 (TPU): python tools/exp_r5_rocket_gap.py phase1
phase2 (CPU): python tools/exp_r5_rocket_gap.py phase2
Writes results_tpu/rocket_gap_diag.json.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

T_STEPS = 10
WINDOWS = (2, 4, 6, 8, 10)
B_DEFAULT = 1024

VARIANTS = (
    ("base", None),
    ("no_early", dict(early_exact_tol=0.0)),
    ("outer30", dict(iterations_outer=30)),
    ("inner50", dict(iterations_inner=50, reg_min=1e-8)),
    ("ct1e6", dict(cost_tolerance=1e-6)),
    ("L11", dict(iterations_linesearch=11)),
    ("pen1e3", dict(penalty_initial=1e3)),
)


def phase1(out_npz, B=B_DEFAULT, variants=VARIANTS):
    import jax
    import jax.numpy as jnp

    from altro_tpu.bench.agreement_conic import _tight_batch_solver, TIGHT
    from altro_tpu.bench.batched_conic import rocket_setup
    from altro_tpu.mpc import make_mpc_step

    save = {}
    track = None
    tight_solver = None
    for vname, ov in variants:
        ov = dict(ov) if ov else {}
        ws = ov.pop("warm_start", "shift")
        su = rocket_setup(jnp.float32, opts_override=ov or None,
                          track=track, warm_start=ws)
        track = (su["X_track"], su["U_track"])
        if tight_solver is None:
            su_t = rocket_setup(jnp.float32, opts_override=TIGHT,
                                track=track)
            tight_solver = _tight_batch_solver(su_t)
        step, init_carry = make_mpc_step(
            su["prob_mpc"], su["opts"], su["X_track"], su["U_track"],
            noise_model=su["noise_model"], shared_k=True, warm_start=ws)
        vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)))
        rng = np.random.default_rng(1)
        noise = jnp.asarray(rng.standard_normal((T_STEPS, B, 6)),
                            jnp.float32)
        carry = jax.block_until_ready(
            jax.jit(jax.vmap(lambda _: init_carry()))(jnp.arange(B)))
        for t in range(T_STEPS):
            carry, out = vstep(carry, noise[t], jnp.asarray(t, jnp.int32))
            if (t + 1) in WINDOWS:
                Uc, stc, vic = tight_solver(
                    jnp.asarray(t + 1, jnp.int32), out.x0)
                save[f"{vname}_f{t + 1}_x0"] = np.asarray(out.x0)
                save[f"{vname}_f{t + 1}_U"] = np.asarray(out.U)
                save[f"{vname}_f{t + 1}_Uc"] = np.asarray(Uc)
                save[f"{vname}_f{t + 1}_stc"] = np.asarray(stc)
                save[f"{vname}_f{t + 1}_iters"] = np.asarray(out.iters)
        jax.block_until_ready(carry)
        save[f"{vname}_status"] = np.asarray(out.status)
        print(f"phase1 {vname}: success "
              f"{float(np.mean(np.asarray(out.status))):.4f}", flush=True)
    save["Xtrack"] = np.asarray(track[0])
    save["Utrack"] = np.asarray(track[1])
    np.savez(out_npz, **save)


def phase2(in_npz, out_json, truth_worst=8, variants=VARIANTS,
           extra_rows=None):
    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import altro_tpu as at
    from altro_tpu.bench.batched_conic import rocket_setup
    from altro_tpu.costs import retarget_tracking
    from altro_tpu.mpc import track_window

    data = np.load(in_npz)
    track = (jnp.asarray(data["Xtrack"], jnp.float64),
             jnp.asarray(data["Utrack"], jnp.float64))
    su = rocket_setup(jnp.float64, track=track)
    prob_mpc = su["prob_mpc"]
    opts_truth = at.SolverOptions(
        cost_tolerance=1e-7, gradient_tolerance=1e-9,
        constraint_tolerance=1e-7, penalty_initial=1e3,
        penalty_scaling=10.0, iterations_outer=40, iterations_inner=100)

    def prob_at(k):
        Xw, Uw = track_window(track[0], track[1], k, prob_mpc.N)
        return prob_mpc.replace(
            cost=retarget_tracking(prob_mpc.cost, Xw, Uw))

    def traj_cost(pb, x0, U):
        X = pb.dynamics.rollout(x0, U)
        return pb.cost.total(X, U)

    jcosts = jax.jit(jax.vmap(traj_cost, in_axes=(None, 0, 0)))
    jtruth = jax.jit(lambda pb, x0, U0: at.solve(
        pb.replace(x0=x0), opts_truth, U0=U0).U)

    res = dict(config=dict(steps=T_STEPS, windows=list(WINDOWS)),
               variants={})
    for vname, ov in variants:
        if f"{vname}_f{WINDOWS[0]}_x0" not in data:
            continue
        per_win = {}
        worst = []  # (gap, window, lane)
        for k in WINDOWS:
            pb = prob_at(k)
            x0 = jnp.asarray(data[f"{vname}_f{k}_x0"], jnp.float64)
            Jb = np.asarray(jcosts(pb, x0, jnp.asarray(
                data[f"{vname}_f{k}_U"], jnp.float64)))
            Jc = np.asarray(jcosts(pb, x0, jnp.asarray(
                data[f"{vname}_f{k}_Uc"], jnp.float64)))
            g = (Jb - Jc) / np.maximum(np.abs(Jc), 1e-12)
            per_win[f"k{k}"] = dict(
                gap_max=float(g.max()), gap_p99=float(np.percentile(g, 99)),
                gap_mean=float(g.mean()),
                iters_mean=float(np.mean(data[f"{vname}_f{k}_iters"])),
                iters_max=int(np.max(data[f"{vname}_f{k}_iters"])))
            order = np.argsort(-g)
            worst += [(float(g[i]), int(k), int(i)) for i in order[:4]]
        worst.sort(reverse=True)
        row = dict(override=ov, windows=per_win,
                   **((extra_rows or {}).get(vname, {})),
                   gap_max=max(w["gap_max"] for w in per_win.values()),
                   gap_mean=float(np.mean(
                       [w["gap_mean"] for w in per_win.values()])),
                   worst_lanes=[list(w) for w in worst[:truth_worst]])
        # absolute anchor on the worst lanes: f64 truth re-solve, scoring
        # BOTH the bench solution and the cold-tight solution
        anchors = []
        for gval, k, lane in worst[:truth_worst]:
            pb = prob_at(k)
            x0 = jnp.asarray(data[f"{vname}_f{k}_x0"][lane], jnp.float64)
            U_b = jnp.asarray(data[f"{vname}_f{k}_U"][lane], jnp.float64)
            U_c = jnp.asarray(data[f"{vname}_f{k}_Uc"][lane], jnp.float64)
            U_t = jtruth(pb, x0, U_b)
            Jb = float(traj_cost(pb, x0, U_b))
            Jc = float(traj_cost(pb, x0, U_c))
            Jt = float(traj_cost(pb, x0, U_t))
            anchors.append(dict(window=int(k), lane=int(lane),
                                gap_vs_cold=gval,
                                gap_bench_vs_truth=(Jb - Jt) / abs(Jt),
                                gap_cold_vs_truth=(Jc - Jt) / abs(Jt)))
        row["anchors"] = anchors
        res["variants"][vname] = row
        print(f"phase2 {vname}: gap max {row['gap_max']:.3f} "
              f"mean {row['gap_mean']:.4f} | per-window max "
              + " ".join(f"k{k}:{per_win[f'k{k}']['gap_max']:.3f}"
                         for k in WINDOWS), flush=True)

    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(res, f, indent=1)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("phase", nargs="?", default="all",
                   choices=["all", "phase1", "phase2"])
    p.add_argument("--npz", default="/tmp/altro_tpu_rocket_gap.npz")
    p.add_argument("--out", default="results_tpu/rocket_gap_diag.json")
    p.add_argument("--batch", type=int, default=B_DEFAULT)
    args = p.parse_args()
    if args.phase in ("all", "phase1"):
        phase1(args.npz, args.batch)
    if args.phase == "phase2":
        phase2(args.npz, args.out)
    elif args.phase == "all":
        env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
        env["JAX_PLATFORMS"] = "cpu"
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "phase2",
             "--npz", args.npz, "--out", args.out],
            check=True, env=env, cwd=REPO)


if __name__ == "__main__":
    main()
