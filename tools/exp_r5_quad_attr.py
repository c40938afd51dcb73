"""Round-5 probe: attribute the quadruped batched-TPU solve (the one
family still at ~3x reference on-chip, VERDICT r4 weak #3) and measure the
straggler-compaction lever.

Segments, each a separate jitted program on the same realistic mid-solve
state (pipelined dispatch, median of 3 passes):

  full_solve       the shipped vsolve (bench row baseline) + lane stats
  cap1/cap2/cap4   solve_partial at 1/2/4 iterations -> per-iteration
                   slope + entry intercept
  expand_backward  the fused boundary as dispatched for per-lane data
                   (XLA expansion + Pallas lane-packed backward)
  al_expansion     the vmapped XLA AL expansion alone
  backward_only    backward_pass on precomputed expansions (Pallas)
  rollouts_only    the ladder rollout kernel
  al_costs_only    the per-rung AL cost evaluation (XLA)
  compact4/6/8     full solve with device-side straggler compaction at
                   cap 4/6/8 (block 128)

Run on TPU: python tools/exp_r5_quad_attr.py [--batch 512]
Writes results_tpu/quad_attr_r5.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

REPEATS = 20


def ptime(fn, label, samples=3):
    out = fn()
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    walls = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        walls.append((time.perf_counter() - t0) / REPEATS * 1e3)
    med = float(np.median(walls))
    print(f"  {label:28s} {med:9.3f} ms", flush=True)
    return med


def main(B=512, mode="qp"):
    import altro_tpu as at
    from altro_tpu.bench.batched_families import quadruped_setup
    from altro_tpu.solver import altro as S

    su = quadruped_setup(B, linearized_friction=(mode == "qp"))
    prob_b, u0, opts = su["prob_b"], su["u0"], su["opts"]
    x0 = su["x0s"]()
    res = dict(batch=B, mode=mode)

    # ---- full solve + lane stats ----
    def solve_one(prob_k, x0_i):
        sol = at.solve(prob_k.replace(x0=x0_i), opts, U0=u0)
        return sol.stats.status, sol.stats.viol, sol.stats.iterations

    jsolve = jax.jit(jax.vmap(solve_one))
    out = jax.block_until_ready(jsolve(prob_b, x0))
    it = np.asarray(out[2])
    res["iters_mean"] = float(it.mean())
    res["iters_max"] = int(it.max())
    res["iters_p99"] = float(np.percentile(it, 99))
    res["success"] = float(np.asarray(out[0]).mean())
    print(f"  lane iters: mean {res['iters_mean']:.2f} p99 "
          f"{res['iters_p99']:.0f} max {res['iters_max']}", flush=True)
    res["full_solve"] = ptime(lambda: jsolve(prob_b, x0), "full solve")

    # ---- forced-iteration slope ----
    for cap in (1, 2, 4):
        jcap = jax.jit(jax.vmap(
            lambda pk, x0_i: S.solve_partial(
                pk.replace(x0=x0_i), opts, U0=u0, it_cap=cap)[8]))
        res[f"cap{cap}"] = ptime(lambda: jcap(prob_b, x0), f"solve @ cap{cap}")

    # ---- realistic mid-solve state for segment probes ----
    jstate = jax.jit(jax.vmap(
        lambda pk, x0_i: S.solve_partial(
            pk.replace(x0=x0_i), opts, U0=u0, it_cap=1)))
    states = jax.block_until_ready(jstate(prob_b, x0))
    X, U, _K, duals, reg = states[0], states[1], states[2], states[3], \
        states[4]

    with jax.default_matmul_precision("highest"):
        def eb(pk, Xi, Ui, duals_i, reg_i):
            lams = tuple(d.lam for d in duals_i)
            rhos = tuple(d.rho for d in duals_i)
            return S.expand_backward(pk.cost, pk.dynamics.A, pk.dynamics.B,
                                     pk.constraints, Xi, Ui, lams, rhos,
                                     reg_i)

        jeb = jax.jit(jax.vmap(eb))
        res["expand_backward"] = ptime(
            lambda: jeb(prob_b, X, U, duals, reg), "expand_backward")

        def exp_only(pk, Xi, Ui, duals_i):
            return S.al_expansion(pk, duals_i, Xi, Ui)

        jexp = jax.jit(jax.vmap(
            lambda pk, Xi, Ui, duals_i: exp_only(
                pk.replace(x0=Xi[0]), Xi, Ui, duals_i)))
        res["al_expansion"] = ptime(
            lambda: jexp(prob_b, X, U, duals), "al_expansion only")

        exps = jax.block_until_ready(jexp(prob_b, X, U, duals))

        jbwd = jax.jit(lambda A, Bm, e, r: jax.vmap(S.backward_pass)(
            A, Bm, *e, r))
        A_b = prob_b.dynamics.A
        B_b = prob_b.dynamics.B
        res["backward_only"] = ptime(
            lambda: jbwd(A_b, B_b, exps, reg), "backward only (Pallas)")

        Kd = jax.block_until_ready(jbwd(A_b, B_b, exps, reg))
        Knew, dff = Kd[0], Kd[1]
        alphas_t = tuple(opts.ls_decrease ** i for i in range(10)) + (0.0,)

        jroll = jax.jit(lambda A, Bm, dd, Xb, Ub, K2, d2:
                        jax.vmap(S._ls_rollouts_fn(alphas_t))(
                            A, Bm, dd, Xb, Ub, K2, d2))
        dd_b = prob_b.dynamics.d
        res["rollouts_only"] = ptime(
            lambda: jroll(A_b, B_b, dd_b, X, U, Knew, dff),
            "ladder rollouts only")

        Xts, Uts = jax.block_until_ready(
            jroll(A_b, B_b, dd_b, X, U, Knew, dff))

        def alcosts(pk, Xts_i, Uts_i, duals_i):
            return jax.vmap(
                lambda Xt, Ut: S.total_al_cost_res(pk, duals_i, Xt, Ut)[0]
            )(Xts_i, Uts_i)

        jalc = jax.jit(jax.vmap(alcosts))
        res["al_costs_only"] = ptime(
            lambda: jalc(prob_b, Xts, Uts, duals), "AL-cost evals only")

    # ---- compaction lever ----
    from altro_tpu.bench.batched_families import quadruped_batched  # noqa
    for cap in (4, 6, 8):
        def solve_batch(prob_bb, x0_b, cap=cap):
            def partial_one(pk, x0_i):
                return S.solve_partial(pk.replace(x0=x0_i), opts, U0=u0,
                                       it_cap=cap)

            def resume_one(pk, st):
                with jax.default_matmul_precision("highest"):
                    return S._flat_while(pk, opts, st, None)

            sts = jax.vmap(partial_one)(prob_bb, x0_b)
            done = sts[10]
            take = jnp.argsort(done.astype(jnp.int32), stable=True)[:128]
            subp = jax.tree_util.tree_map(lambda a: a[take], prob_bb)
            sub = jax.tree_util.tree_map(lambda a: a[take], sts)
            sub = jax.vmap(resume_one)(subp, sub)
            sts = jax.tree_util.tree_map(
                lambda a, b: a.at[take].set(b), sts, sub)
            sts = jax.vmap(resume_one)(prob_bb, sts)
            return sts[10], sts[8]

        jc = jax.jit(solve_batch)
        res[f"compact{cap}"] = ptime(lambda: jc(prob_b, x0),
                                     f"compacted solve cap{cap}")

    res["device"] = str(jax.devices()[0])
    os.makedirs("results_tpu", exist_ok=True)
    with open("results_tpu/quad_attr_r5.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--mode", default="qp", choices=["qp", "socp"])
    a = p.parse_args()
    main(a.batch, a.mode)
