"""Straggler-tail experiments for the batched rocket SOC MPC (TPU).

Compares single-level device-side compaction (the shipped cap=24/block=256
config, 22.6k solves/s) against two-level schedules (a capped resume of the
256-lane block followed by a 128-lane completion stage) and a lower first
cap that the second level makes affordable, plus a penalty-scaling variant
aimed at shortening the tail itself. Results are bit-identical across
COMPACTION SCHEDULES with identical SolverOptions (tests/test_compaction.py);
only wall time may differ. The penalty_scaling=30 config changes the solve
itself (different iterate sequence), so its results are NOT comparable
bit-for-bit with the others — only its throughput/agreement summary is.

Run on TPU, serially: python -m tools.exp_tail
"""
from __future__ import annotations

import json

from altro_tpu.bench.batched_conic import rocket_batched

CONFIGS = [
    ("cap24_b256", dict(compact_cap=24, compact_block=256)),
    ("cap24_b256_L24x128", dict(compact_cap=24, compact_block=256,
                                compact_levels=((24, 128),))),
    ("cap16_b384_L24x128", dict(compact_cap=16, compact_block=384,
                                compact_levels=((24, 128),))),
    ("cap24_b256_L16x128_scale30",
     dict(compact_cap=24, compact_block=256,
          compact_levels=((16, 128),),
          opts_override=dict(penalty_scaling=30.0))),
]


def main():
    out = {}
    for name, kw in CONFIGS:
        print(f"== {name}", flush=True)
        res = rocket_batched(B=1024, **kw)
        out[name] = dict(solves_per_s=res["solves_per_s"],
                         mean_iters=res["mean_iters"],
                         iters_max_per_step_mean=res[
                             "iters_max_per_step_mean"],
                         step_ms_p50=res["step_ms_p50"],
                         success=res["success_rate"],
                         max_viol=res["max_viol"])
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
