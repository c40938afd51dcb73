"""Experiment: AL penalty-schedule tuning for the batched rocket SOC MPC.

The warm-started rocket solves take ~20 mean iLQR iterations (vs 2.1 for
the QP flagship) — most of it AL rounds climbing penalties from
penalty_initial each solve. Try carrying converged penalties across solves
(reset_penalties=False) and taller/steeper schedules; report mean iters +
solves/s per config.

Run on TPU: python tools/exp_conic_tune.py
"""
import sys

from altro_tpu.bench.batched_conic import rocket_batched

CONFIGS = {
    "baseline_1e3_s10_reset": {},
    "carry_rho_init1e3": dict(reset_penalties=False),
    "carry_rho_init1e4": dict(reset_penalties=False, penalty_initial=1e4),
    "init1e4_s10_reset": dict(penalty_initial=1e4),
    "init1e3_s100_reset": dict(penalty_scaling=100.0),
}


def main():
    which = sys.argv[1:] or list(CONFIGS)
    for name in which:
        print(f"== {name}: {CONFIGS[name]}", flush=True)
        res = rocket_batched(B=1024, T=10, opts_override=CONFIGS[name])
        print(f"   -> {res['solves_per_s']:.0f} solves/s, "
              f"iters {res['mean_iters']:.2f}, "
              f"success {res['success_rate']:.4f}, "
              f"viol {res['max_viol']:.2e}", flush=True)


if __name__ == "__main__":
    main()
