"""Seventh round-5 TPU batch: quadruped grouped reps sweep (one claim).

The grouped row of record ran at reps=128 (B=1024). Measures reps 64 and
256 (B=512/2048) both modes to check whether the sweet spot moves; the
inner per-schedule batch is reps lanes, so VMEM pressure scales with
reps (the n=m=12 flat ceiling was 512 lanes/block).

Run on TPU: python tools/run_tpu_batch_r5g.py
Writes results_tpu/quad_grouped_reps_r5.json.
"""
import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import jax

from altro_tpu.bench.batched_families import quadruped_batched

rows = []
for reps in (64, 256):
    for lin in (True, False):
        B = 8 * reps
        try:
            r = quadruped_batched(B=B, rounds=6, linearized_friction=lin,
                                  grouped=True)
            rows.append(dict(r, reps=reps))
        except Exception:
            traceback.print_exc()
            rows.append(dict(reps=reps, mode="qp" if lin else "socp",
                             error="failed"))
with open("results_tpu/quad_grouped_reps_r5.json", "w") as f:
    json.dump(dict(rows=rows, device=str(jax.devices()[0])), f, indent=1,
              default=str)
print("==== r5g batch done", flush=True)
