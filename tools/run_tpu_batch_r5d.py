"""Fourth round-5 TPU batch: the rocket final-config probe (one claim).

Run on TPU: python tools/run_tpu_batch_r5d.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

import tools.exp_r5_rocket_final as m

m.phase1("/tmp/altro_tpu_rocket_final.npz")
env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
env["JAX_PLATFORMS"] = "cpu"
r = subprocess.run(
    [sys.executable, "tools/exp_r5_rocket_final.py", "phase2",
     "--npz", "/tmp/altro_tpu_rocket_final.npz",
     "--out", "results_tpu/rocket_final_r5.json"], env=env, cwd=REPO)
print(f"phase2: rc={r.returncode}", flush=True)
print("==== r5d batch done", flush=True)
