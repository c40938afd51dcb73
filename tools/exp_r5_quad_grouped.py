"""Round-5 probe: schedule-grouped nested-vmap quadruped solve.

The quadruped batch is 8 contact schedules x B/8 initial states; the flat
vmap presents the problem data as per-lane, defeating the SMEM-shared-data
premise of the fused kernels (RESULTS.md r4: the named quadruped blocker).
But grouped as vmap(schedules) o vmap(reps) with reps a multiple of 128,
the INNER vmap sees shared problem data — the existing fused
expansion+backward (and ladder/AL-merit) kernels dispatch per schedule,
and the outer vmap batches the pallas_call itself (grid-prepend batching
rule). No new kernel needed if this works and wins.

Measures, at B = 8 x reps:
  flat        vmap(solve) over per-lane problems (the shipped row's path)
  grouped     vmap over schedules of vmap over reps (fused kernels engage)
and cross-checks status/iteration agreement on identical instances.

Run on TPU: python tools/exp_r5_quad_grouped.py [--reps 128]
Writes results_tpu/quad_grouped_r5.json.
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

REPEATS = 10


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
    return med, out


def main(reps=128, mode="qp"):
    import altro_tpu as at
    from altro_tpu.bench.batched_families import quadruped_setup

    B = 8 * reps
    su = quadruped_setup(B, linearized_friction=(mode == "qp"))
    prob_b, u0, opts = su["prob_b"], su["u0"], su["opts"]
    x0 = su["x0s"]()
    res = dict(batch=B, reps=reps, mode=mode)

    # grouped stack: undo the repeat (lanes are contiguous per schedule)
    prob_s = jax.tree_util.tree_map(lambda a: a[::reps], prob_b)
    x0_g = x0.reshape(8, reps, -1)

    def solve_one(prob_k, x0_i):
        sol = at.solve(prob_k.replace(x0=x0_i), opts, U0=u0)
        return sol.stats.status, sol.stats.viol, sol.stats.iterations

    jflat = jax.jit(jax.vmap(solve_one))
    jgrouped = jax.jit(jax.vmap(jax.vmap(solve_one, in_axes=(None, 0)),
                                in_axes=(0, 0)))

    t0 = time.perf_counter()
    out_f = jax.block_until_ready(jflat(prob_b, x0))
    res["flat_compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    out_g = jax.block_until_ready(jgrouped(prob_s, x0_g))
    res["grouped_compile_s"] = round(time.perf_counter() - t0, 1)

    # identical instances -> statuses must match; iterations should too up
    # to f32 kernel-order effects
    st_f = np.asarray(out_f[0]).reshape(8, reps)
    st_g = np.asarray(out_g[0])
    it_f = np.asarray(out_f[2]).reshape(8, reps)
    it_g = np.asarray(out_g[2])
    res["success_flat"] = float(st_f.mean())
    res["success_grouped"] = float(st_g.mean())
    res["iters_mean_flat"] = float(it_f.mean())
    res["iters_mean_grouped"] = float(it_g.mean())
    res["iters_agree_frac"] = float((it_f == it_g).mean())

    res["flat_ms"], _ = ptime(lambda: jflat(prob_b, x0), "flat vmap solve")
    res["grouped_ms"], _ = ptime(lambda: jgrouped(prob_s, x0_g),
                                 "grouped nested-vmap solve")
    res["speedup"] = round(res["flat_ms"] / res["grouped_ms"], 3)
    res["solves_per_s_grouped"] = round(B / (res["grouped_ms"] / 1e3), 1)
    res["device"] = str(jax.devices()[0])
    os.makedirs("results_tpu", exist_ok=True)
    out = ("results_tpu/quad_grouped_r5.json" if mode == "qp"
           else f"results_tpu/quad_grouped_{mode}_r5.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1), flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reps", type=int, default=128)
    p.add_argument("--mode", default="qp", choices=["qp", "socp"])
    a = p.parse_args()
    main(a.reps, a.mode)
