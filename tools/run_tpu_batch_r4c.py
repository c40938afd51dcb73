"""Third (final) round-4 TPU batch — one claim (see run_tpu_batch_r4.py):

1. flexsat_batched at the shipped round-4 config -> flexsat_batched.json
2. quadruped_batched rows re-measured under the fused-boundary default
   (the QP mode's NONPOS-cone config now dispatches the fused kernel)
   -> quadruped_batched.json
3. quadruped TPU quality gate (mid-phase schedule sampling fix)
   -> agreement_quadruped.json
4. flagship number of record: 3 serial bench.py runs with the fused
   default -> flagship_runs_r04b.json

Run on TPU: python tools/run_tpu_batch_r4c.py
"""
import contextlib
import io
import json
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_flexsat_row():
    from altro_tpu.bench import batched_families as bf
    import jax

    res = dict(bf.flexsat_batched(), device=str(jax.devices()[0]),
               dtype="float32")
    with open(os.path.join(REPO, "results_tpu", "flexsat_batched.json"),
              "w") as f:
        json.dump(res, f, indent=1)


def run_quadruped_rows():
    from altro_tpu.bench import batched_families as bf
    import jax

    rows = {}
    for lin in (True, False):
        r = bf.quadruped_batched(B=512, linearized_friction=lin)
        rows[r["label"]] = r
    rows.update(device=str(jax.devices()[0]), dtype="float32")
    with open(os.path.join(REPO, "results_tpu", "quadruped_batched.json"),
              "w") as f:
        json.dump(rows, f, indent=1)


def run_quadruped_agreement():
    from altro_tpu.bench import agreement_quadruped as aq
    argv = sys.argv
    sys.argv = ["agreement_quadruped"]
    try:
        aq.main()
    finally:
        sys.argv = argv


def run_flagship_record():
    import bench

    runs = []
    for i in range(3):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        line = [l for l in buf.getvalue().splitlines()
                if l.startswith("{")][-1]
        row = json.loads(line)
        runs.append(row)
        print(f"run {i + 1}: {row['value']} solves/s "
              f"({row['vs_baseline']}x)", flush=True)
    out = dict(
        what=("Three strictly-serial bench.py runs in one TPU claim with "
              "the fused expansion+backward boundary default (round-4 "
              "number-of-record discipline; see flagship_runs_r04.json "
              "for the environment-variance context)"),
        runs=runs,
        median=sorted(r["value"] for r in runs)[1],
    )
    with open(os.path.join(REPO, "results_tpu", "flagship_runs_r04b.json"),
              "w") as f:
        json.dump(out, f, indent=1)


for name, fn in (("flexsat_row", run_flexsat_row),
                 ("quadruped_rows", run_quadruped_rows),
                 ("quadruped_agreement", run_quadruped_agreement),
                 ("flagship_record", run_flagship_record)):
    print(f"==== {name}", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"==== {name} FAILED (continuing)", flush=True)
print("==== batch done", flush=True)
