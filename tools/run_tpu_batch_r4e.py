"""Fifth round-4 TPU batch: rocket fused-L=8 row + rocket-only re-gate.

The fused SOC kernel's 1.42x step saving lets the rocket re-spend some
throughput on ladder depth (quality): L=8 at the otherwise-shipped
config. If the row lands >=80k solves/s with gap_mean <= ~0.02 it ships;
otherwise the committed L=5 artifacts stand (git fallback).
"""
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["ALTRO_AGREEMENT_FAMILIES"] = "rocket"


def run_rocket_row():
    import json

    import jax

    from altro_tpu.bench import batched_conic as bc

    res = dict(bc.rocket_batched(B=1024, compact_cap=16, compact_block=256,
                                 compact_levels=((16, 128),)),
               device=str(jax.devices()[0]), dtype="float32")
    with open(os.path.join(REPO, "results_tpu", "rocket_batched.json"),
              "w") as f:
        json.dump(res, f, indent=1)


def run_agreement():
    from altro_tpu.bench import agreement_conic
    argv = sys.argv
    sys.argv = ["agreement_conic"]
    try:
        agreement_conic.main()
    finally:
        sys.argv = argv


for name, fn in (("rocket_row", run_rocket_row),
                 ("agreement_rocket", run_agreement)):
    print(f"==== {name}", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"==== {name} FAILED (continuing)", flush=True)
print("==== batch done", flush=True)
