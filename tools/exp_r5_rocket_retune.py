"""Round-5 rocket bench-config RETUNE: combined-knob candidates measured
for BOTH full-batch quality and compacted throughput in one claim.

The r5a knob study (results_tpu/rocket_gap_diag.json) showed no single
knob closes the shipped config's cost gap vs the f64 truth (base max 2.46
over windows 2..10; inner50 alone leaves max 1.22, L11 alone max 5.34),
while the TIGHT combination reaches 0.025 — so the fix is a combination,
and the question is which combination clears gap_max <= 0.05 at the
highest throughput (verdict target: <= 5% worst-window gap at >= 70k
solves/s; headroom exists — the shipped config now runs 176.8k under the
fused AL-merit kernel).

Candidates (applied as opts_override on the shipped bench config,
altro_tpu/bench/batched_conic.rocket_setup):
  inner50_ne      restore the classical inner loop (inner=50, reg_min
                  1e-8) and drop the early-exact stop
  inner50_ne_vt   + constraint_tolerance 1e-5, iterations_outer 30
  tight           the full TIGHT config (+ cost_tolerance 1e-6,
                  gradient_tolerance 1e-8) — the known-quality anchor
  inner50_ne_L11  inner50_ne + an 11-rung line-search ladder

Per candidate: (a) T=10-step warm chain at B=1024, all lanes scored at
windows 2..10 against the cold-tight f32 batch re-solver (validated vs
f64 truth to 2.5e-3 in rocket_gap_diag.json anchors); (b) the compacted
bench step's throughput via batched_conic.rocket_batched.

phase1 (TPU): python tools/exp_r5_rocket_retune.py phase1
phase2 (CPU): python tools/exp_r5_rocket_retune.py phase2
Writes results_tpu/rocket_retune_r5.json.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import exp_r5_rocket_gap as gap

VARIANTS = (
    ("inner50_ne", dict(iterations_inner=50, reg_min=1e-8,
                        early_exact_tol=0.0)),
    ("inner50_ne_vt", dict(iterations_inner=50, reg_min=1e-8,
                           early_exact_tol=0.0, constraint_tolerance=1e-5,
                           iterations_outer=30)),
    ("tight", dict(cost_tolerance=1e-6, gradient_tolerance=1e-8,
                   constraint_tolerance=1e-5, iterations_outer=30,
                   iterations_inner=50, reg_min=1e-8,
                   early_exact_tol=0.0)),
    ("inner50_ne_L11", dict(iterations_inner=50, reg_min=1e-8,
                            early_exact_tol=0.0,
                            iterations_linesearch=11)),
)

THROUGHPUT_JSON = "/tmp/altro_tpu_rocket_retune_tp.json"


def phase1(out_npz, B=gap.B_DEFAULT):
    from altro_tpu.bench.batched_conic import rocket_batched

    gap.phase1(out_npz, B, variants=VARIANTS)
    tp = {}
    for vname, ov in VARIANTS:
        row = rocket_batched(B=B, T=10, opts_override=ov, compact_cap=16,
                             compact_block=256, compact_levels=((16, 128),))
        tp[vname] = dict(solves_per_s=row["solves_per_s"],
                         success_rate=row["success_rate"],
                         mean_iters=row["mean_iters"],
                         iters_p99=row["iters_p99"],
                         iters_max=row["iters_max"])
        print(f"phase1 {vname}: {row['solves_per_s']:.1f} solves/s "
              f"(iters mean {row['mean_iters']:.2f} p99 "
              f"{row['iters_p99']:.0f})", flush=True)
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
    p.add_argument("--npz", default="/tmp/altro_tpu_rocket_retune.npz")
    p.add_argument("--out", default="results_tpu/rocket_retune_r5.json")
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
