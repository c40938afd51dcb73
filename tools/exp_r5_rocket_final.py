"""Round-5 rocket config FINAL candidates: tracking-seeded warm starts.

rocket_warmtrap_r5.json isolated the quality tail to the SHIFTED-CONTROL
seed (fresh duals alone leave max 0.264; a fully cold chain collapses it
to 0.068 with p99 <= 0.7%). This probe measures the two remaining cells
of (duals carry) x (cost tolerance) under warm_start="track" (the new
mpc.make_mpc_step mode: U0 = the tracking window's controls), each with
COMPACTED throughput so the winner is directly the shipped config:

  trk_wd       track seed + carried duals, ct 1e-4   (duals cut AL
               rounds; does the carry reintroduce the trap?)
  trk_fresh    track seed + reset_duals, ct 1e-4     (= the warmtrap
               coldU chain, now compacted)
  trk_wd_ct6   trk_wd + cost_tolerance 1e-6
  trk_fresh_ct6 trk_fresh + cost_tolerance 1e-6

All on the inner50_ne base (iterations_inner=50, reg_min=1e-8, no
early-exact stop). Quality: full-batch cold-tight scoring at windows
2..10 + f64 phase2 with truth anchors (exp_r5_rocket_gap machinery).

phase1 (TPU): python tools/exp_r5_rocket_final.py phase1
phase2 (CPU): python tools/exp_r5_rocket_final.py phase2
Writes results_tpu/rocket_final_r5.json.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import exp_r5_rocket_gap as gap

BASE = dict(iterations_inner=50, reg_min=1e-8, early_exact_tol=0.0,
            warm_start="track")
VARIANTS = (
    ("trk_wd", dict(BASE)),
    ("trk_fresh", dict(BASE, reset_duals=True)),
    ("trk_wd_ct6", dict(BASE, cost_tolerance=1e-6)),
    ("trk_fresh_ct6", dict(BASE, reset_duals=True, cost_tolerance=1e-6)),
)
THROUGHPUT_JSON = "/tmp/altro_tpu_rocket_final_tp.json"


def phase1(out_npz, B=gap.B_DEFAULT):
    from altro_tpu.bench.batched_conic import rocket_batched

    gap.phase1(out_npz, B, variants=VARIANTS)
    tp = {}
    for vname, ov in VARIANTS:
        ov = dict(ov)
        ws = ov.pop("warm_start")
        row = rocket_batched(B=B, T=10, opts_override=ov, compact_cap=16,
                             compact_block=256, compact_levels=((16, 128),),
                             warm_start=ws)
        tp[vname] = dict(solves_per_s=row["solves_per_s"],
                         success_rate=row["success_rate"],
                         mean_iters=row["mean_iters"],
                         iters_p99=row["iters_p99"])
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
    p.add_argument("--npz", default="/tmp/altro_tpu_rocket_final.npz")
    p.add_argument("--out", default="results_tpu/rocket_final_r5.json")
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
