"""Second round-4 TPU batch (one claim; see tools/run_tpu_batch_r4.py):

1. flexsat tuning sweep (L=5 ladder variant — the L<=3 ladder trips an
   XLA vmem-placement overflow at N=80/B=1024, see exp_family_tune)
2. flagship bench A/B: fused expansion+backward default ON vs OFF
   (results_tpu/flagship_fused_ab.json)
3. flagship agreement re-gate with the fused default (bench/agreement.py)
4. quadruped TPU quality gate phase1 (bench/agreement_quadruped.py);
   phase2 runs in its scrubbed-CPU subprocess

Run on TPU: python tools/run_tpu_batch_r4b.py
"""
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import exp_family_tune


def run_flagship_ab():
    import bench

    rows = {}
    for envval, label in (("auto", "fused_default"), ("0", "unfused")):
        os.environ["ALTRO_TPU_FUSED"] = envval
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bench.main()
        line = [l for l in buf.getvalue().splitlines()
                if l.startswith("{")][-1]
        rows[label] = json.loads(line)
        print(f"{label}: {rows[label]['value']} solves/s", flush=True)
    os.environ.pop("ALTRO_TPU_FUSED", None)
    with open(os.path.join(REPO, "results_tpu", "flagship_fused_ab.json"),
              "w") as f:
        json.dump(rows, f, indent=1)


def run_flagship_agreement():
    import subprocess

    from altro_tpu.bench import agreement as agr
    argv = sys.argv
    sys.argv = ["agreement"]
    try:
        agr.main()
    finally:
        sys.argv = argv


def run_quadruped_agreement():
    from altro_tpu.bench import agreement_quadruped as aq
    argv = sys.argv
    sys.argv = ["agreement_quadruped"]
    try:
        aq.main()
    finally:
        sys.argv = argv


for name, fn in (("flexsat", exp_family_tune.run_flexsat),
                 ("flagship_ab", run_flagship_ab),
                 ("flagship_agreement", run_flagship_agreement),
                 ("quadruped_agreement", run_quadruped_agreement)):
    print(f"==== {name}", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"==== {name} FAILED (continuing)", flush=True)
print("==== batch done", flush=True)
