"""Sixth round-5 TPU batch: flagship + flexsat agreement artifacts with
the full-batch f64-scored gates (one claim).

Run on TPU: python tools/run_tpu_batch_r5f.py
"""
import os
import subprocess
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

for name, fn in (
        ("agreement_p1", lambda: __import__(
            "altro_tpu.bench.agreement", fromlist=["phase1_tpu"]
        ).phase1_tpu("/tmp/altro_tpu_agreement.npz", 1024)),
        ("agreement_flexsat_p1", lambda: __import__(
            "altro_tpu.bench.agreement_flexsat", fromlist=["phase1_tpu"]
        ).phase1_tpu("/tmp/altro_tpu_agreement_flexsat.npz", 1024))):
    print(f"==== {name}", flush=True)
    try:
        fn()
    except Exception:
        traceback.print_exc()
        print(f"==== {name} FAILED (continuing)", flush=True)

env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
env["JAX_PLATFORMS"] = "cpu"
for mod, npz, out in (
        ("altro_tpu.bench.agreement", "/tmp/altro_tpu_agreement.npz",
         "results_tpu/agreement.json"),
        ("altro_tpu.bench.agreement_flexsat",
         "/tmp/altro_tpu_agreement_flexsat.npz",
         "results_tpu/agreement_flexsat.json")):
    r = subprocess.run([sys.executable, "-m", mod, "phase2", "--npz", npz,
                        "--out", out], env=env, cwd=REPO)
    print(f"phase2 {mod}: rc={r.returncode}", flush=True)
print("==== r5f batch done", flush=True)
