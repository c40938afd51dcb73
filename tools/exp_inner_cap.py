"""Straggler-tail fix experiments: inner-iteration cap + regularization floor.

exp_tail_diag traces show the rocket tail lanes spend their ~100 iterations
in two ways:
  (a) CHATTER: round 0's inner iLQR zigzags across the SOC projection kink
      for the full iterations_inner=50 cap (accepted steps, dJ>cost_tol
      each time, gradient oscillating ~3e-2) while the violation is already
      ~1e-4 — the per-step lane p99 is exactly 50, the cap;
  (b) REG CLIMB: after a rejection the regularization restarts at ~1e-8 and
      needs ~8 doubling-by-10 iterations to reach the ~0.1-10 that accepts
      (incl. NaN-gain recovery lanes at rho=1e7).

So: cap the inner phase short (inexact AL — dual updates don't need an
exactly-solved inner problem) and raise the reg floor so rejections recover
in 1-2 iterations. This sweeps both knobs on the round-2 rocket bench
config (B=1024, compaction cap24/b256) and reports throughput + iteration
stats + violation. Winner (inner8 + reg_min=1.0, lane-max 100.8 -> 26) is
now baked into bench/batched_conic.rocket_setup/grasp_setup; note the
configs below still carry round-2's penalty schedule, which round 3
replaced after quality measurement (tools/exp_conic_quality.py).

Run on TPU, serially: python -m tools.exp_inner_cap [--quick]
"""
from __future__ import annotations

import argparse
import json

from altro_tpu.bench.batched_conic import rocket_batched

CONFIGS = [
    ("shipped", dict()),
    ("inner10", dict(opts_override=dict(iterations_inner=10))),
    ("inner6", dict(opts_override=dict(iterations_inner=6))),
    ("inner16", dict(opts_override=dict(iterations_inner=16))),
    ("inner10_regmin1e-2", dict(opts_override=dict(
        iterations_inner=10, reg_min=1e-2))),
    ("inner10_reginit1e-2", dict(opts_override=dict(
        iterations_inner=10, reg_min=1e-2, reg_initial=1e-2))),
    # chatter amplitude scales with the penalty (the kink sharpens as rho
    # grows): bound or reset the schedule
    ("inner6_pmax1e6", dict(opts_override=dict(
        iterations_inner=6, penalty_max=1e6))),
    ("inner6_pmax1e5", dict(opts_override=dict(
        iterations_inner=6, penalty_max=1e5))),
    ("inner6_resetp1e3", dict(opts_override=dict(
        iterations_inner=6, reset_penalties=True, penalty_initial=1e3))),
    ("inner6_rm1e-2_pmax1e6", dict(opts_override=dict(
        iterations_inner=6, reg_min=1e-2, penalty_max=1e6))),
    # rejection recovery: with reg_min=r the first rejection jumps straight
    # to r*reg_increase instead of climbing from 1e-8 (accepted steps still
    # decay reg to 0, so pure-Newton solves are unaffected)
    ("inner6_rm1", dict(opts_override=dict(
        iterations_inner=6, reg_min=1.0))),
    ("inner6_rm1e-1", dict(opts_override=dict(
        iterations_inner=6, reg_min=1e-1))),
    ("inner8_rm1", dict(opts_override=dict(
        iterations_inner=8, reg_min=1.0))),
    ("inner6_rm1e-2", dict(opts_override=dict(
        iterations_inner=6, reg_min=1e-2))),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="T=10 steps instead of 30")
    p.add_argument("--configs", default="",
                   help="comma-separated subset of config names")
    args = p.parse_args()
    T = 10 if args.quick else 30
    names = [s for s in args.configs.split(",") if s]
    rows = {}
    for name, kw in CONFIGS:
        if names and name not in names:
            continue
        print(f"== {name}", flush=True)
        res = rocket_batched(T=T, compact_cap=24, compact_block=256, **kw)
        rows[name] = {k: res[k] for k in
                      ("solves_per_s", "success_rate", "max_viol",
                       "mean_iters", "iters_max", "iters_max_per_step_mean",
                       "iters_p99", "step_ms_p50")}
        print(json.dumps({name: rows[name]}), flush=True)
    print(json.dumps(rows, indent=1), flush=True)


if __name__ == "__main__":
    main()
