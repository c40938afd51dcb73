"""Round-5 rocket warm-start-trap isolation.

Every retune candidate (results_tpu/rocket_retune_r5.json) shares one
signature: per-window p99 cost gaps of a few tenths of a percent but 1-3
lanes per 1024 stalled 5-80% above the optimum — and the COLD-tight f32
scorer reaches the optimum on those exact instances, while even the
TIGHT warm chain (23 mean iters) leaves a 0.235 lane. The problem is
convex (LTV dynamics + SOC cones + quadratic cost), so the stalls are a
property of the WARM START, not of local minima. Two candidate
mechanisms, one variant each:

  rd     shifted controls + seeded states, but FRESH duals each solve
         (reset_duals=True): isolates the carried-dual mechanism.
  coldU  fully cold each solve (U0 = the window's tracking controls,
         fresh duals), chain still advances with the adopted solution:
         isolates the shifted-control/state mechanism. This is the
         reference's cold baseline role (every JuMP/ECOS re-solve in
         simple_rocket.jl is cold).

Both at the inner50_ne base (iterations_inner=50, reg_min=1e-8, no
early-exact stop — the best-throughput candidate, 79.5k). Quality via
the shared cold-tight scorer + f64 phase2 (exp_r5_rocket_gap machinery);
throughput via the compacted bench step (rd) / pipelined batch cold
solves (coldU).

phase1 (TPU): python tools/exp_r5_rocket_warmtrap.py phase1
phase2 (CPU): python tools/exp_r5_rocket_warmtrap.py phase2
Writes results_tpu/rocket_warmtrap_r5.json.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

from tools import exp_r5_rocket_gap as gap

BASE = dict(iterations_inner=50, reg_min=1e-8, early_exact_tol=0.0)
VARIANTS = (
    ("rd", dict(BASE, reset_duals=True)),
    ("coldU", BASE),   # override applied to the cold chain below
)
THROUGHPUT_JSON = "/tmp/altro_tpu_rocket_warmtrap_tp.json"


def phase1(out_npz, B=gap.B_DEFAULT):
    import jax
    import jax.numpy as jnp

    from altro_tpu.bench.agreement_conic import _tight_batch_solver, TIGHT
    from altro_tpu.bench.batched_conic import rocket_batched, rocket_setup
    from altro_tpu.costs import retarget_tracking
    from altro_tpu.mpc import track_window

    tp = {}

    # --- rd: the make_mpc_step chain with reset_duals (gap.phase1 path)
    gap.phase1(out_npz + ".rd.npz", B, variants=VARIANTS[:1])
    row = rocket_batched(B=B, T=10, opts_override=VARIANTS[0][1],
                         compact_cap=16, compact_block=256,
                         compact_levels=((16, 128),))
    tp["rd"] = dict(solves_per_s=row["solves_per_s"],
                    mean_iters=row["mean_iters"],
                    iters_p99=row["iters_p99"])
    print(f"phase1 rd: {row['solves_per_s']:.1f} solves/s", flush=True)

    # --- coldU: cold-start chain (fresh U0/duals per solve)
    su = rocket_setup(jnp.float32, opts_override=BASE)
    track = (su["X_track"], su["U_track"])
    su_t = rocket_setup(jnp.float32, opts_override=TIGHT, track=track)
    tight_solver = _tight_batch_solver(su_t)

    import altro_tpu as at
    prob_mpc, opts = su["prob_mpc"], su["opts"]
    noise_model = su["noise_model"]
    dyn = prob_mpc.dynamics

    def cold_step(k, x0s, noise_i):
        Xw, Uw = track_window(track[0], track[1], k, prob_mpc.N)
        prob_k = prob_mpc.replace(
            cost=retarget_tracking(prob_mpc.cost, Xw, Uw))

        def one(x0):
            sol = at.solve(prob_k.replace(x0=x0), opts, U0=Uw)
            return sol.U, sol.stats.status, sol.stats.viol, \
                sol.stats.iterations

        U, st, vl, it = jax.vmap(one)(x0s)
        x_prop = jax.vmap(lambda x0, u0: dyn.step(x0, u0, 0))(x0s, U[:, 0])
        x0n = jax.vmap(noise_model)(x_prop, noise_i)
        return U, st, vl, it, x0n

    jstep = jax.jit(cold_step, static_argnums=())
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.standard_normal((gap.T_STEPS, B, 6)),
                        jnp.float32)
    x0s = jax.jit(jax.vmap(lambda _: prob_mpc.x0))(jnp.arange(B))
    save = {}
    walls = []
    for t in range(gap.T_STEPS):
        t0 = time.perf_counter()
        U, st, vl, it, x0n = jax.block_until_ready(
            jstep(jnp.asarray(t + 1, jnp.int32), x0s, noise[t]))
        walls.append(time.perf_counter() - t0)
        if (t + 1) in gap.WINDOWS:
            Uc, stc, _ = tight_solver(jnp.asarray(t + 1, jnp.int32), x0s)
            save[f"coldU_f{t + 1}_x0"] = np.asarray(x0s)
            save[f"coldU_f{t + 1}_U"] = np.asarray(U)
            save[f"coldU_f{t + 1}_Uc"] = np.asarray(Uc)
            save[f"coldU_f{t + 1}_stc"] = np.asarray(stc)
            save[f"coldU_f{t + 1}_iters"] = np.asarray(it)
        x0s = x0n
    save["coldU_status"] = np.asarray(st)
    # walls after the first include no compile; median is the honest
    # uncompacted per-step wall (the warm rows are pipelined+compacted, so
    # compare like-for-like against rocket_batched's plain path)
    step_ms = float(np.median(walls[1:]) * 1e3)
    tp["coldU"] = dict(solves_per_s=round(B / (step_ms / 1e3), 1),
                       step_ms=step_ms,
                       mean_iters=float(np.mean(save[
                           f"coldU_f{gap.WINDOWS[-1]}_iters"])))
    print(f"phase1 coldU: {tp['coldU']['solves_per_s']:.1f} solves/s "
          f"(uncompacted; iters mean {tp['coldU']['mean_iters']:.1f})",
          flush=True)

    # merge the rd npz with the coldU keys
    with np.load(out_npz + ".rd.npz") as d:
        save.update({k: d[k] for k in d.files})
    np.savez(out_npz, **save)
    with open(THROUGHPUT_JSON, "w") as f:
        json.dump(tp, f)


def phase2(in_npz, out_json):
    extra = {}
    if os.path.exists(THROUGHPUT_JSON):
        with open(THROUGHPUT_JSON) as f:
            extra = {k: dict(throughput=v) for k, v in json.load(f).items()}
    gap.phase2(in_npz, out_json, variants=VARIANTS, extra_rows=extra)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("phase", nargs="?", default="all",
                   choices=["all", "phase1", "phase2"])
    p.add_argument("--npz", default="/tmp/altro_tpu_rocket_warmtrap.npz")
    p.add_argument("--out", default="results_tpu/rocket_warmtrap_r5.json")
    p.add_argument("--batch", type=int, default=gap.B_DEFAULT)
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
