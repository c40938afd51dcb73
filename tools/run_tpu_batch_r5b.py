"""Second round-5 TPU batch (one process, one claim — CLAUDE.md r4).

Stages:
 1. rocket_retune p1 — combined-knob candidates: full-batch quality chain
                       + compacted throughput per candidate (picks the
                       shipped rocket bench config for r5).
 2. flexsat_lsf_ab   — flexsat ls_fused on/off x compaction cap 0/8 grid
                       (the new multi-block auto heuristic turns lsfused
                       OFF for the single-block flexsat; r5a measured
                       42.9-44.7k WITH it on — pin per measurement).
 3. quad_grouped_socp— schedule-grouped nested-vmap quadruped, SOCP mode.
 4. quad_rows        — quadruped_batched grouped rows of record (qp+socp).
Then the scrubbed-CPU rocket_retune phase2.

Run on TPU: python tools/run_tpu_batch_r5b.py
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


def rocket_retune_p1():
    import tools.exp_r5_rocket_retune as m
    m.phase1("/tmp/altro_tpu_rocket_retune.npz")


def flexsat_lsf_ab():
    from altro_tpu.bench.batched_families import flexsat_batched
    rows = []
    for lsf in ("1", "0"):
        os.environ["ALTRO_TPU_LSFUSED"] = lsf
        for cap in (0, 8):
            kw = (dict(compact_cap=0) if cap == 0 else
                  dict(compact_cap=8, compact_block=256,
                       compact_levels=((8, 128),)))
            r = dict(flexsat_batched(B=1024, T=30, **kw),
                     ls_fused=lsf, compact_cap=cap)
            rows.append(r)
            print(f"  lsf={lsf} cap={cap}: {r['solves_per_s']} solves/s",
                  flush=True)
    del os.environ["ALTRO_TPU_LSFUSED"]
    with open("results_tpu/flexsat_lsf_ab_r5.json", "w") as f:
        json.dump(rows, f, indent=1, default=str)


def quad_grouped_socp():
    import tools.exp_r5_quad_grouped as m
    m.main(128, "socp")


def quad_rows():
    import numpy as np

    from altro_tpu.bench.batched_families import quadruped_batched
    out = {}
    for mode, lin in (("qp", True), ("socp", False)):
        runs = [quadruped_batched(B=1024, rounds=10, linearized_friction=lin,
                                  grouped=True) for _ in range(3)]
        best = sorted(runs, key=lambda r: r["solves_per_s"])[1]
        best["solves_per_s_runs"] = [r["solves_per_s"] for r in runs]
        out[mode] = best
        print(f"  {mode} grouped median-of-3: {best['solves_per_s']} "
              f"(runs {best['solves_per_s_runs']})", flush=True)
    with open("results_tpu/quadruped_batched_grouped_r5.json", "w") as f:
        json.dump(out, f, indent=1, default=str)


def cpu_phase2():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "tools/exp_r5_rocket_retune.py", "phase2",
         "--npz", "/tmp/altro_tpu_rocket_retune.npz",
         "--out", "results_tpu/rocket_retune_r5.json"], env=env, cwd=REPO)
    print(f"phase2 rocket_retune: rc={r.returncode}", flush=True)


for nm, fn in (("rocket_retune_p1", rocket_retune_p1),
               ("flexsat_lsf_ab", flexsat_lsf_ab),
               ("quad_grouped_socp", quad_grouped_socp),
               ("quad_rows", quad_rows),
               ("cpu_phase2", cpu_phase2)):
    stage(nm, fn)
print("==== r5b batch done", flush=True)
