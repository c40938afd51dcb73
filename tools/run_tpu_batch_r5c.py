"""Third round-5 TPU batch (one process, one claim — CLAUDE.md r4).

Stages:
 1. warmtrap p1       — rocket warm-start-trap isolation (reset-duals vs
                        fully-cold chains at the inner50_ne base).
 2. agreement_quad p1 — quadruped gate under the GROUPED layout + the
                        full-batch tight-f32 histograms (both modes).
 3. agreement_flex p1 — flexsat gate under the r5 config (ls_fused on).
Then the scrubbed-CPU phase2s for all three.

Run on TPU: python tools/run_tpu_batch_r5c.py
"""
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


stage("warmtrap_p1", lambda: __import__(
    "tools.exp_r5_rocket_warmtrap", fromlist=["phase1"]).phase1(
    "/tmp/altro_tpu_rocket_warmtrap.npz"))
stage("agreement_quadruped_p1", lambda: __import__(
    "altro_tpu.bench.agreement_quadruped", fromlist=["phase1_tpu"]
).phase1_tpu("/tmp/altro_tpu_agreement_quadruped.npz", 512))
stage("agreement_flexsat_p1", lambda: __import__(
    "altro_tpu.bench.agreement_flexsat", fromlist=["phase1_tpu"]
).phase1_tpu("/tmp/altro_tpu_agreement_flexsat.npz", 1024))


def cpu_phase2s():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    for cmd in (
            [sys.executable, "tools/exp_r5_rocket_warmtrap.py", "phase2",
             "--npz", "/tmp/altro_tpu_rocket_warmtrap.npz",
             "--out", "results_tpu/rocket_warmtrap_r5.json"],
            [sys.executable, "-m", "altro_tpu.bench.agreement_quadruped",
             "phase2", "--npz", "/tmp/altro_tpu_agreement_quadruped.npz",
             "--out", "results_tpu/agreement_quadruped.json",
             "--batch", "512"],
            [sys.executable, "-m", "altro_tpu.bench.agreement_flexsat",
             "phase2", "--npz", "/tmp/altro_tpu_agreement_flexsat.npz",
             "--out", "results_tpu/agreement_flexsat.json"]):
        r = subprocess.run(cmd, env=env, cwd=REPO)
        print(f"phase2 {cmd[-3]}: rc={r.returncode}", flush=True)


stage("cpu_phase2s", cpu_phase2s)
print("==== r5c batch done", flush=True)
