"""Fifth round-5 TPU batch — FINAL rows and gates under the shipped r5
configs (one process, one claim).

Stages:
 1. rocket_row     — rocket_batched.json of record under the new
                     tracking-seeded config (median of 3 same-claim runs).
 2. agreement p1   — conic agreement chains (bench + tight, both
                     families) under the shipped configs.
 3. fused_check p1 — fused-vs-unfused cost parity under the shipped
                     configs (tracking-seeded rocket).
Then the scrubbed-CPU phase2s.

Run on TPU: python tools/run_tpu_batch_r5e.py
"""
import json
import os
import subprocess
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def stage(name, fn):
    print(f"==== {name}", flush=True)
    try:
        fn()
        return True
    except Exception:
        traceback.print_exc()
        print(f"==== {name} FAILED (continuing)", flush=True)
        return False


def rocket_row():
    import jax

    from altro_tpu.bench.batched_conic import rocket_batched
    runs = [rocket_batched(B=1024, T=30, compact_cap=16, compact_block=256,
                           compact_levels=((16, 128),)) for _ in range(3)]
    best = sorted(runs, key=lambda r: r["solves_per_s"])[1]
    best["solves_per_s_runs"] = [r["solves_per_s"] for r in runs]
    best["device"] = str(jax.devices()[0])
    best["dtype"] = "float32"
    with open("results_tpu/rocket_batched.json", "w") as f:
        json.dump(best, f, indent=1)
    print(f"  rocket median-of-3: {best['solves_per_s']} "
          f"(runs {best['solves_per_s_runs']})", flush=True)


def agreement_p1():
    from altro_tpu.bench import agreement_conic
    agreement_conic.phase1_tpu("/tmp/altro_tpu_agreement_conic.npz", 1024)


def fused_check_p1():
    from altro_tpu.bench import fused_check
    fused_check.phase1_tpu("/tmp/altro_tpu_fused_check.npz")


def cpu_phase2s():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    for mod, npz, out in (
            ("altro_tpu.bench.agreement_conic",
             "/tmp/altro_tpu_agreement_conic.npz",
             "results_tpu/agreement_conic.json"),
            ("altro_tpu.bench.fused_check",
             "/tmp/altro_tpu_fused_check.npz",
             "results_tpu/fused_soc_check.json")):
        r = subprocess.run(
            [sys.executable, "-m", mod, "phase2", "--npz", npz,
             "--out", out], env=env, cwd=REPO)
        print(f"phase2 {mod}: rc={r.returncode}", flush=True)


for nm, fn in (("rocket_row", rocket_row),
               ("agreement_p1", agreement_p1),
               ("fused_check_p1", fused_check_p1),
               ("cpu_phase2s", cpu_phase2s)):
    stage(nm, fn)
print("==== r5e batch done", flush=True)
